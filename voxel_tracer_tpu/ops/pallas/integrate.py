"""Integration of the coherent Pallas kernel with the renderer.

`intersect_volume_fast` = kernel for the coherent bulk + XLA state-machine
fallback for the unresolved residue (misaligned/perpendicular rays, rect
overflows), then palette/normal reconstruction — a drop-in alternative to
`composite._trace_one` for single-volume scenes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from voxel_tracer_tpu.models.volume import VolumeData, VoxelVolume
from voxel_tracer_tpu.ops import dda
from voxel_tracer_tpu.ops.composite import HitResult, _to_local
from voxel_tracer_tpu.ops.math3d import BIG_F32
from voxel_tracer_tpu.ops.pallas import coherent


class FastVolume:
    """Host-side bundle: device VolumeData + packed kernel tables."""

    def __init__(self, volume: VoxelVolume):
        self.volume = volume
        self.data = volume.data()
        self.packed = coherent.pack_volume(volume.grid, volume.vpu)

    def refresh(self):
        """Re-pack after dynamic edits (set_voxel)."""
        self.data = self.volume.data()
        self.packed = coherent.pack_volume(self.volume.grid, self.volume.vpu)


def _pad_rays(o, d):
    n = o.shape[0]
    pad = (-n) % coherent.TILE
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], axis=0)
        # dummy dir (unit z) so padded rays are well-formed
        dpad = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))
        d = jnp.concatenate([d, dpad], axis=0)
    return o, d, n


def tiles_of_image(x, height, width, tile=32):
    """(H*W, ...) row-major rays -> square-tile order (pure relayout).

    Square pixel tiles give the kernel tight per-slice rects; half-row
    tiles (the naive flat order) have frustums wider than the brick budget
    and fall back/miss.  H and W must divide by `tile`.
    """
    rest = x.shape[1:]
    x = x.reshape(height // tile, tile, width // tile, tile, *rest)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(height * width, *rest)


def image_of_tiles(x, height, width, tile=32):
    """Inverse of `tiles_of_image`."""
    rest = x.shape[1:]
    x = x.reshape(height // tile, width // tile, tile, tile, *rest)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(height * width, *rest)


@functools.partial(jax.jit, static_argnames=("bsize", "vpu", "use_fallback"))
def _trace_fast(data: VolumeData, occ, words, origins, dirs, bsize, vpu,
                use_fallback: bool = True):
    o_l, d_l = _to_local(data.rot, data.pos, data.pivot, origins, dirs)
    o_pad, d_pad, n = _pad_rays(o_l, d_l)

    res = coherent.trace_coherent(occ, words, o_pad, d_pad, bsize, vpu)
    t = res["t"][:n]
    vox = res["vox"][:n]
    ax = res["ax"][:n]
    steps = res["steps"][:n]
    resolved = res["resolved"][:n]

    hit = (t < coherent.BIG) & resolved

    if use_fallback:
        fb = dda.intersect_volume_local(data.grid, data.brick_occ, o_l, d_l,
                                        data.vpu)
        fb_hit = ~resolved & (fb["t"] < BIG_F32)
        # fold fallback results into kernel outputs
        t = jnp.where(resolved, jnp.where(hit, t, BIG_F32),
                      jnp.where(fb_hit, fb["t"], BIG_F32))
        hit = hit | fb_hit
    else:
        fb = None
        t = jnp.where(hit, t, BIG_F32)

    # decode voxel -> material, normal
    bx, by, bz = bsize
    px = bx * 8
    pxy = px * (by * 8)
    vz = vox // pxy
    vy = (vox - vz * pxy) // px
    vx = vox - vz * pxy - vy * px
    mat_k = dda._gather3(data.grid, jnp.stack([vx, vy, vz], axis=-1))
    axis_k = ax >> 1
    sign_k = jnp.where((ax & 1) == 1, 1.0, -1.0)   # step sign (+1 encoded 1)
    step3 = jax.nn.one_hot(axis_k, 3, dtype=jnp.float32) * sign_k[:, None]
    # normal = -step along axis (vv.cpp:161-163)
    normal_k = dda.normal_from_axis(axis_k, step3, data.rot)

    if use_fallback:
        fb_normal = dda.normal_from_axis(fb["axis"], fb["step_sign"], data.rot)
        mat = jnp.where(resolved, mat_k, fb["mat"])
        normal = jnp.where(resolved[:, None], normal_k, fb_normal)
        steps = jnp.where(resolved, steps, fb["steps"])
    else:
        mat, normal = mat_k, normal_k

    mat = jnp.where(hit, mat, 0)
    albedo = jnp.take(data.palette, jnp.clip(mat, 0, 255), axis=0)
    return HitResult(
        t=t,
        mat=mat,
        normal=jnp.where(hit[:, None], normal, 0.0),
        albedo=jnp.where(hit[:, None], albedo, 0.0),
        steps=steps,
        obj=jnp.where(hit, 0, -1),
    )


def intersect_volume_fast(fv: FastVolume, origins, dirs,
                          use_fallback: bool = True) -> HitResult:
    return _trace_fast(fv.data, fv.packed.occ, fv.packed.words,
                       origins, dirs, fv.packed.bsize, fv.packed.vpu,
                       use_fallback)


@functools.partial(jax.jit, static_argnames=("bsize", "vpu", "width",
                                             "height", "use_fallback"))
def _render_flat_fast(data, occ, words, sky_pixels, camera, bsize, vpu,
                      width, height, use_fallback=False):
    from voxel_tracer_tpu.models.camera import rays_for_image
    from voxel_tracer_tpu.models.skydome import SkyDomeData, sample_sky
    from voxel_tracer_tpu.ops import tonemap

    origins, dirs = rays_for_image(camera, width, height)
    tiled = width % 32 == 0 and height % 32 == 0
    if tiled:
        origins = tiles_of_image(origins, height, width)
        dirs = tiles_of_image(dirs, height, width)
    hit = _trace_fast(data, occ, words, origins, dirs, bsize, vpu,
                      use_fallback)
    missed = hit.t >= BIG_F32
    sky = sample_sky(SkyDomeData(pixels=sky_pixels), dirs)
    color = jnp.where(missed[:, None], sky, hit.albedo)
    img = tonemap.aces_approx(color)
    t, steps = hit.t, hit.steps
    if tiled:
        img = image_of_tiles(img, height, width)
        t = image_of_tiles(t, height, width)
        steps = image_of_tiles(steps, height, width)
    return dict(image=img.reshape(height, width, 3),
                depth=t.reshape(height, width),
                steps=steps.reshape(height, width))


def render_flat_fast(fv: FastVolume, sky_pixels, camera, width, height,
                     use_fallback: bool = False):
    """Kernel-backed flat-shaded frame (the benchmark hot path)."""
    return _render_flat_fast(fv.data, fv.packed.occ, fv.packed.words,
                             sky_pixels, camera, fv.packed.bsize,
                             fv.packed.vpu, width, height, use_fallback)
