"""Kernel-backed renderer: full frames with lighting via the coherent kernel.

Primary rays AND shadow rays go through the coherent brick-slice kernel
(shadow rays toward the sun are parallel — ideally coherent).  The residue
of unresolved rays falls back to the XLA state machine inside the same jit.

Multi-volume scenes: volumes are traced kernel-per-volume inside one jit
and min-combined; grid-aligned static volumes should be pre-merged with
`bake_aligned_scene` (e.g. the 512-crate profiling scene, dev/profile.h,
merges into one 256^3 grid).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from voxel_tracer_tpu.models.camera import Camera, rays_for_image
from voxel_tracer_tpu.models.skydome import SkyDomeData, sample_sky
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.ops import tonemap
from voxel_tracer_tpu.ops.composite import HitResult
from voxel_tracer_tpu.ops.math3d import BIG_F32, dot
from voxel_tracer_tpu.ops.pallas.integrate import FastVolume, _trace_fast


def bake_aligned_scene(volumes: Sequence[VoxelVolume]) -> VoxelVolume:
    """Merge identity-rotation, grid-aligned volumes into one big volume.

    All volumes must share vpu and have positions on the voxel lattice; the
    merged volume uses volume 0's palette.  This turns the 512-instance
    profiling scene (src/dev/profile.h:23-36) into a single grid the
    coherent kernel traverses directly.
    """
    assert volumes, "no volumes"
    vpu = volumes[0].vpu
    mins, maxs = [], []
    for v in volumes:
        assert np.allclose(v.rot, np.eye(3)), "bake requires axis-aligned"
        assert v.vpu == vpu, "bake requires uniform vpu"
        lo = v.pos - v.pivot
        mins.append(lo)
        maxs.append(lo + v.size)
    lo = np.floor(np.min(mins, axis=0) * vpu).astype(np.int64)
    hi = np.ceil(np.max(maxs, axis=0) * vpu).astype(np.int64)
    nx, ny, nz = (hi - lo).astype(int)
    grid = np.zeros((nz, ny, nx), np.uint8)
    for v in volumes:
        off = np.round((v.pos - v.pivot) * vpu).astype(np.int64) - lo
        gz, gy, gx = v.grid.shape
        region = grid[off[2]:off[2] + gz, off[1]:off[1] + gy,
                      off[0]:off[0] + gx]
        np.copyto(region, np.where(v.grid != 0, v.grid, region))
    merged = VoxelVolume(grid, palette=volumes[0].palette, vpu=vpu)
    merged.pos = (lo / vpu + merged.pivot).astype(np.float32)
    return merged


class FastScene(NamedTuple):
    """Host bundle for the kernel renderer."""

    volumes: tuple              # tuple of FastVolume
    sun_dir: jnp.ndarray
    sun_light: jnp.ndarray
    sky: jnp.ndarray            # (H, W, 3) sky pixels

    @staticmethod
    def build(volumes, sky=None, sun_dir=None, sun_light=None):
        from voxel_tracer_tpu.models.scene import SUN_DIR, SUN_LIGHT
        from voxel_tracer_tpu.models.skydome import SkyDome

        fvs = tuple(v if isinstance(v, FastVolume) else FastVolume(v)
                    for v in volumes)
        sky_px = jnp.asarray((sky or SkyDome.procedural(256, 128)).pixels)
        return FastScene(
            volumes=fvs,
            sun_dir=jnp.asarray(sun_dir if sun_dir is not None else SUN_DIR),
            sun_light=jnp.asarray(
                sun_light if sun_light is not None else SUN_LIGHT),
            sky=sky_px,
        )


def _trace_scene(vol_args, origins, dirs, use_fallback):
    """Min-combine kernel traces over all volumes (inside jit)."""
    best = None
    for (data, occ, words, bsize, vpu) in vol_args:
        hit = _trace_fast(data, occ, words, origins, dirs, bsize, vpu,
                          use_fallback)
        best = hit if best is None else best.nearer(hit)
    return best


def _render_lambert_impl(vol_data, vol_tables, sun_dir, sun_light, sky_pixels,
                         camera, *, statics, width, height, ambient,
                         use_fallback):
    from voxel_tracer_tpu.ops.pallas.integrate import (image_of_tiles,
                                                       tiles_of_image)

    vol_args = [(vol_data[i], vol_tables[i][0], vol_tables[i][1],
                 statics[i][0], statics[i][1]) for i in range(len(vol_data))]
    origins, dirs = rays_for_image(camera, width, height)
    tiled = width % 32 == 0 and height % 32 == 0
    if tiled:  # square pixel tiles -> tight kernel rects
        origins = tiles_of_image(origins, height, width)
        dirs = tiles_of_image(dirs, height, width)
    hit = _trace_scene(vol_args, origins, dirs, use_fallback)
    missed = hit.t >= BIG_F32

    # shadow rays toward the (fixed) sun — coherent, kernel again
    p = origins + dirs * hit.t[:, None] + hit.normal * 1e-4
    incidence = dot(hit.normal, sun_dir)
    sdirs = jnp.broadcast_to(sun_dir, p.shape)
    shadow = _trace_scene(vol_args, p, sdirs, use_fallback)
    lit = (incidence > 0.0) & (shadow.t >= BIG_F32)
    irr = jnp.where(lit[:, None], sun_light * incidence[:, None], 0.0) + ambient

    sky = sample_sky(SkyDomeData(pixels=sky_pixels), dirs)
    color = jnp.where(missed[:, None], sky, hit.albedo * irr)
    img = tonemap.aces_approx(color)
    albedo = jnp.where(missed[:, None], sky, hit.albedo)
    steps = hit.steps + shadow.steps
    outs = dict(image=img, albedo=albedo, irradiance=irr, depth=hit.t,
                normal=hit.normal, steps=steps, material=hit.mat)
    if tiled:
        outs = {k: image_of_tiles(v, height, width) for k, v in outs.items()}
    return dict(
        image=outs["image"].reshape(height, width, 3),
        albedo=outs["albedo"].reshape(height, width, 3),
        irradiance=outs["irradiance"].reshape(height, width, 3),
        depth=outs["depth"].reshape(height, width),
        normal=outs["normal"].reshape(height, width, 3),
        steps=outs["steps"].reshape(height, width),
        material=outs["material"].reshape(height, width),
    )


@functools.partial(jax.jit,
                   static_argnames=("statics", "width", "height", "ambient",
                                    "use_fallback"))
def _render_lambert_jit(vol_data, vol_tables, sun_dir, sun_light, sky_pixels,
                        camera, statics, width, height, ambient,
                        use_fallback):
    return _render_lambert_impl(
        vol_data, vol_tables, sun_dir, sun_light, sky_pixels, camera,
        statics=statics, width=width, height=height, ambient=ambient,
        use_fallback=use_fallback)


def render_lambert_fast(scene: FastScene, camera: Camera, width: int,
                        height: int, ambient: float = 0.2,
                        use_fallback: bool = False):
    """Sun + shadow-ray + flat-ambient frame, everything via the kernel."""
    vol_data = tuple(fv.data for fv in scene.volumes)
    vol_tables = tuple((fv.packed.occ, fv.packed.words)
                       for fv in scene.volumes)
    statics = tuple((fv.packed.bsize, fv.packed.vpu) for fv in scene.volumes)
    return _render_lambert_jit(vol_data, vol_tables, scene.sun_dir,
                               scene.sun_light, scene.sky, camera, statics,
                               width, height, ambient, use_fallback)
