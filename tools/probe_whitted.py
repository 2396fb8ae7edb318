"""Decompose the full_whitted_720p frame cost stage by stage.

Runs the exact bench_suite.bench_full_whitted scene at several truncated
configs so the per-stage cost falls out by differences:

  primary        fused camera-mode primary pass only
  b1             + bounce-0 light queries (sun/ambient/sphere shadows)
  b2g1           + 1 continuation bounce, glass sub-loop with 1 interior march
  b3g2 (bench)   the shipped benchmark config
  b1sr1          bounce-0 lights with shadow_rounds=1 (shadow re-trace cost)

Usage: python tools/probe_whitted.py [--frames 8]
"""

import argparse
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

from bench_suite import _frame_loop, _timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated subset of variant names")
    ap.add_argument("--compact", action="store_true",
                    help="live-ray compaction (config.compact + isect)")
    ap.add_argument("--exact", action="store_true",
                    help="exact XLA-DDA fallback for the kernel residue")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from voxel_tracer_tpu.models.camera import Camera
    from voxel_tracer_tpu.models.scene import Scene
    from voxel_tracer_tpu.models.skydome import SkyDome
    from voxel_tracer_tpu.models.volume import VoxelVolume
    from voxel_tracer_tpu.ops.pallas import mega
    from voxel_tracer_tpu.ops.pallas.renderer_fast import bake_aligned_scene
    from voxel_tracer_tpu.ops.pallas.whitted import (
        MegaIntersector, primary_hit_mega, render_whitted_mega)
    from voxel_tracer_tpu.renderer import RenderConfig
    from voxel_tracer_tpu.utils.timer import _force_sync

    W, H = 1280, 768
    box = VoxelVolume.from_vox(
        "/root/reference/assets/vox/testing/glass-box.vox")
    box.grid[box.grid == 16] = 4
    box.grid[box.grid == 62] = 12
    vols = [box]
    for i in range(4):
        vols.append(VoxelVolume.from_vox(
            "/root/reference/assets/vox/enemy-drone.vox",
            pos=(float(i), 2.0, 0.0)))
    merged = bake_aligned_scene(vols)
    scene = Scene(volumes=[merged], skydome=SkyDome.procedural(64, 32))
    scene.add_light((2.0, 3.5, -1.5), 0.15, (1.0, 0.9, 0.8), 40.0)
    sd = scene.data()
    mv = mega.MegaVolume(merged)
    c0 = np.asarray(merged.pos) + np.asarray(merged.size) * 0.5

    def mk_isect(shadow_rounds):
        return MegaIntersector(mv, tile_rows=128, fine_iters=48,
                               fine_unroll=4, shadow_rounds=shadow_rounds,
                               block_hw=(H, W), compact=args.compact,
                               exact_fallback=args.exact)

    def cam_at(theta):
        px = c0[0] + 3.2 * jnp.cos(theta * 10.0)
        pz = c0[2] + 3.2 * jnp.sin(theta * 10.0)
        return Camera.create(
            jnp.stack([px, jnp.full_like(px, c0[1] + 1.2), pz]),
            jnp.asarray(c0), W / H)

    def full_frame(isect, config):
        def frame(theta):
            out = render_whitted_mega(isect, sd, cam_at(theta), W, H,
                                      jnp.int32(0), config=config,
                                      tile_rows=8, tile_w=32)
            return out["image"][0, 0, 0] * 1e-38
        return frame

    def primary_frame(isect):
        def frame(theta):
            hit, origins, dirs = primary_hit_mega(
                isect, cam_at(theta), W, H, tile_rows=8, tile_w=32)
            return (hit.t[0] + hit.albedo[0, 0]) * 1e-38
        return frame

    def flat_frame(isect):
        config = RenderConfig(width=W, height=H, shading="flat")

        def frame(theta):
            out = render_whitted_mega(isect, sd, cam_at(theta), W, H,
                                      jnp.int32(0), config=config,
                                      tile_rows=8, tile_w=32)
            return out["image"][0, 0, 0] * 1e-38
        return frame

    def nolight_frame(isect):
        # b1 with diffuse_irradiance stubbed to zero: isolates full-size
        # frame math + masks from the light queries themselves.  The
        # stub stays installed — keep this variant LAST (dict order).
        import voxel_tracer_tpu.ops.shading as shading_mod
        shading_mod.diffuse_irradiance = (
            lambda scene, p, n, *a, **k: jnp.zeros_like(p))
        config = RenderConfig(width=W, height=H, shading="full",
                              max_bounces=1, glass_reflections=1,
                              compact=args.compact)

        def frame(theta):
            out = render_whitted_mega(isect, sd, cam_at(theta), W, H,
                                      jnp.int32(0), config=config,
                                      tile_rows=8, tile_w=32)
            return out["image"][0, 0, 0] * 1e-38
        return frame

    isect2 = mk_isect(2)
    variants = {
        "primary": lambda: primary_frame(isect2),
        "flat": lambda: flat_frame(isect2),
        "b1": lambda: full_frame(isect2, RenderConfig(
            width=W, height=H, shading="full", max_bounces=1,
            glass_reflections=1, compact=args.compact)),
        "b1sr1": lambda: full_frame(mk_isect(1), RenderConfig(
            width=W, height=H, shading="full", max_bounces=1,
            glass_reflections=1, compact=args.compact)),
        "b2g1": lambda: full_frame(isect2, RenderConfig(
            width=W, height=H, shading="full", max_bounces=2,
            glass_reflections=1, compact=args.compact)),
        "b3g2": lambda: full_frame(isect2, RenderConfig(
            width=W, height=H, shading="full", max_bounces=3,
            glass_reflections=2, compact=args.compact)),
        "nolight": lambda: nolight_frame(isect2),   # keep last (monkeypatch)
    }
    only = set(args.only.split(",")) if args.only else None
    for name, mk in variants.items():
        if only and name not in only:
            continue
        frame = mk()
        dt = _timeit(_frame_loop(frame, args.frames), _force_sync,
                     rounds=2) / args.frames
        print(f"{name:10s} {dt * 1e3:9.2f} ms/frame   {1.0 / dt:7.2f} fps",
              flush=True)


if __name__ == "__main__":
    main()
