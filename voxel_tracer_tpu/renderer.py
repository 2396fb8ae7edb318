"""Renderer: jitted end-to-end frame rendering.

Analog of src/graphics/renderer.{h,cpp}, re-designed as a pure function
pipeline: ray-gen -> scene intersect (wavefront DDA) -> shading -> tonemap,
all under one `jit`.  The per-pixel OpenMP loop (renderer.cpp:199-223)
becomes a flat ray wavefront; display modes (dev/dev.h:36-46) become AOV
outputs returned alongside the image.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from voxel_tracer_tpu.models.camera import Camera, rays_for_image
from voxel_tracer_tpu.models.scene import SceneData
from voxel_tracer_tpu.models.skydome import sample_sky
from voxel_tracer_tpu.ops import composite, tonemap
from voxel_tracer_tpu.ops.math3d import BIG_F32


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render settings (replaces the reference's compile-time defines,
    template/common.h:6-30)."""

    width: int = 1280
    height: int = 720
    shading: str = "full"        # flat | lambert | full
    max_steps: int = 256         # vv.cpp:7 MAX_STEPS
    max_candidates: int = 4      # per-ray candidate objects (BVH front size)
    max_bounces: int = 8         # materials.cpp:16 recursion cap
    tonemapper: str = "aces"     # aces | reinhard | uncharted2 | none
    ambient: float = 0.2         # flat ambient for lambert mode
    accumulate: bool = False     # temporal reprojection (renderer.cpp:273)

    @property
    def aspect(self) -> float:
        return self.width / self.height


class Renderer:
    """Owns config; `render` is jit-compiled per (config, scene structure)."""

    def __init__(self, config: RenderConfig = RenderConfig()):
        self.config = config
        self.frame = 0
        self._render = jax.jit(
            functools.partial(_render_impl, config=config),
            static_argnames=(),
        )

    def camera(self, pos, target) -> Camera:
        return Camera.create(pos, target, self.config.aspect)

    def render(self, scene: SceneData, camera: Camera, frame: int | None = None):
        """Render one frame; returns dict with 'image' (H, W, 3) f32 in [0,1]
        plus AOVs: albedo, irradiance, depth, normal, steps."""
        if frame is None:
            frame = self.frame
            self.frame = (self.frame + 1) % 120  # renderer.cpp:161-162
        return self._render(scene, camera, jnp.int32(frame))


def _render_impl(scene: SceneData, camera: Camera, frame, *, config: RenderConfig):
    w, h = config.width, config.height
    origins, dirs = rays_for_image(camera, w, h)
    return render_rays(scene, origins, dirs, frame, config=config)


def render_rays(scene: SceneData, origins, dirs, frame, *, config: RenderConfig):
    """Render a pre-generated ray wavefront (ray-gen split out so callers —
    e.g. parallel/sharding.py — can place sharding constraints on the rays)."""
    w, h = config.width, config.height

    hit = composite.intersect_scene(
        scene, origins, dirs, config.max_candidates, config.max_steps)
    missed = hit.t >= BIG_F32

    sky = sample_sky(scene.sky, dirs)
    albedo = jnp.where(missed[:, None], sky, hit.albedo)

    if config.shading == "flat":
        irradiance = jnp.ones_like(albedo)
    elif config.shading == "lambert":
        from voxel_tracer_tpu.ops.shading import lambert_irradiance
        irradiance = lambert_irradiance(scene, origins, dirs, hit, config)
    else:
        from voxel_tracer_tpu.ops.shading import shade_full
        albedo, irradiance = shade_full(
            scene, origins, dirs, hit, frame, config)
        albedo = jnp.where(missed[:, None], sky, albedo)

    irradiance = jnp.where(missed[:, None], 1.0, jnp.maximum(irradiance, 0.0))
    color = albedo * irradiance

    tm = {"aces": tonemap.aces_approx, "reinhard": tonemap.reinhard,
          "uncharted2": tonemap.uncharted2, "none": lambda x: x}[config.tonemapper]
    image = tm(color)

    shp = (h, w)
    return dict(
        image=image.reshape(h, w, 3),
        albedo=albedo.reshape(h, w, 3),
        irradiance=irradiance.reshape(h, w, 3),
        color=color.reshape(h, w, 3),
        depth=hit.t.reshape(shp),
        normal=hit.normal.reshape(h, w, 3),
        steps=hit.steps.reshape(shp),
        material=hit.mat.reshape(shp),
    )
