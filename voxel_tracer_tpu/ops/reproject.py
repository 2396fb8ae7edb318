"""Temporal reprojection + accumulation (renderer.cpp:273-329 analog).

Functional re-design of `Renderer::insert_accu`: instead of in-place
accumulator writes under OpenMP, the op maps (current irradiance+depth,
previous frame buffer, previous view pyramid) -> (blended irradiance, new
accumulator).  Ping-pong buffering (renderer.cpp:240-244) becomes simply
returning the new accumulator for the caller to carry.

Per-pixel steps: project the hit point into the previous frame's pyramid
UV, 4-tap bilinear fetch of prev irradiance, depth-rejection with camera
forward-motion compensation, then 95% history blend.
"""

from __future__ import annotations

import jax.numpy as jnp

from voxel_tracer_tpu.models.camera import pyramid_project


def reproject_accumulate(
    irradiance,      # (N, 3) current-frame irradiance
    depth,           # (N,) current hit depth
    hit_points,      # (N, 3) world hit positions (origin + dir * depth)
    prev_accu,       # (H, W, 4) previous accumulator (rgb irradiance + depth)
    prev_planes,     # (4, 4) previous frame pyramid planes
    width: int,
    height: int,
    depth_delta=0.0,  # camera forward motion since last frame
    reproject_mask=None,  # (N,) bool — False = sky/no-reproject pixels
    confidence: float = 0.95,
):
    """Returns (blended (N, 3), new_accu (H, W, 4))."""
    n = irradiance.shape[0]
    uv = pyramid_project(prev_planes, hit_points)         # (N, 2) in [0,1]

    max_u = 1.0 - 2.0 / width
    max_v = 1.0 - 2.0 / height
    in_bounds = ((uv[:, 0] > 0.0) & (uv[:, 0] < max_u)
                 & (uv[:, 1] > 0.0) & (uv[:, 1] < max_v))

    win = jnp.array([width, height], jnp.float32)
    base = uv * win                                       # top-left sample pos
    center = base + 0.5
    center_p = jnp.floor(center + 0.5)

    # Sample weights (renderer.cpp:298-305): fractional-area bilinear
    tl = base
    tr = base + jnp.array([1.0, 0.0])
    bl = base + jnp.array([0.0, 1.0])
    w_tl = jnp.abs((tl[:, 0] - center_p[:, 0]) * (tl[:, 1] - center_p[:, 1]))
    w_tr = jnp.abs((tr[:, 0] - center_p[:, 0]) * (tr[:, 1] - center_p[:, 1]))
    w_bl = jnp.abs((bl[:, 0] - center_p[:, 0]) * (bl[:, 1] - center_p[:, 1]))
    w_br = 1.0 - (w_tl + w_tr + w_bl)

    flat = prev_accu.reshape(-1, 4)

    def fetch(px, py):
        xi = jnp.clip(px.astype(jnp.int32), 0, width - 1)
        yi = jnp.clip(py.astype(jnp.int32), 0, height - 1)
        return jnp.take(flat, yi * width + xi, axis=0)

    s_tl = fetch(tl[:, 0], tl[:, 1])
    s_tr = fetch(tr[:, 0], tr[:, 1])
    s_bl = fetch(bl[:, 0], bl[:, 1])
    s_br = fetch(tr[:, 0], bl[:, 1])
    rgb_prev = (s_tl[:, :3] * w_tl[:, None] + s_tr[:, :3] * w_tr[:, None]
                + s_bl[:, :3] * w_bl[:, None] + s_br[:, :3] * w_br[:, None])
    # center-pixel depth (renderer.cpp:313-315)
    depth_prev = fetch(center[:, 0], center[:, 1])[:, 3]

    # Depth rejection with forward-motion compensation (renderer.cpp:317-323)
    depth_diff = jnp.abs(depth_prev - (depth + depth_delta))
    accept = in_bounds & (depth_diff < 0.1)
    conf = jnp.where(accept,
                     jnp.maximum(confidence - depth_diff * 3.0, 0.0),
                     0.0)
    acc_color = jnp.where(accept[:, None], rgb_prev, irradiance)

    blended = irradiance * (1.0 - conf[:, None]) + acc_color * conf[:, None]
    if reproject_mask is not None:
        blended = jnp.where(reproject_mask[:, None], blended, irradiance)

    new_accu = jnp.concatenate([blended, depth[:, None]], axis=-1)
    return blended, new_accu.reshape(height, width, 4)
