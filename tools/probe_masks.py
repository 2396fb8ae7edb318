"""Measure live-set fractions on the full_whitted bench scene: what
fraction of the 720p wavefront is diffuse / glass / mirror / miss at
bounce 0, how many rays stay live into bounce 1, and the per-light
trace masks (sun backface cull, sphere AoE) — sizes the compaction
buckets (config.compact_fracs)."""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax.numpy as jnp
    from voxel_tracer_tpu.models.camera import Camera
    from voxel_tracer_tpu.models.scene import Scene, SUN_DIR
    from voxel_tracer_tpu.models.skydome import SkyDome
    from voxel_tracer_tpu.models.volume import VoxelVolume
    from voxel_tracer_tpu.ops.math3d import BIG_F32, dot
    from voxel_tracer_tpu.ops.pallas import mega
    from voxel_tracer_tpu.ops.pallas.renderer_fast import bake_aligned_scene
    from voxel_tracer_tpu.ops.pallas.whitted import (
        MegaIntersector, primary_hit_mega)
    from voxel_tracer_tpu.ops.shading import material_row

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
    isect = MegaIntersector(mv, tile_rows=128, fine_iters=48,
                            fine_unroll=4, shadow_rounds=2,
                            block_hw=(H, W))
    c0 = np.asarray(merged.pos) + np.asarray(merged.size) * 0.5
    n = W * H

    for theta in (0.0, 0.02, 0.04):
        px = c0[0] + 3.2 * np.cos(theta * 10.0)
        pz = c0[2] + 3.2 * np.sin(theta * 10.0)
        cam = Camera.create(
            jnp.asarray([px, c0[1] + 1.2, pz], jnp.float32),
            jnp.asarray(c0), W / H)
        hit, origins, dirs = primary_hit_mega(isect, cam, W, H,
                                              tile_rows=8, tile_w=32)
        live = np.asarray(hit.t < BIG_F32)
        row = np.asarray(material_row(hit.mat))
        unlit = (row == 15) | (np.asarray(hit.mat) == 255)
        is_glass = live & (row == 0) & ~unlit
        is_mirror = live & (row == 1) & ~unlit
        is_diffuse = live & ~(is_glass | is_mirror | unlit)
        nrm = np.asarray(hit.normal)
        sun_lit = is_diffuse & (nrm @ np.asarray(SUN_DIR) > 0)
        # sphere light AoE
        p = np.asarray(origins) + np.asarray(dirs) * np.asarray(hit.t)[:, None]
        lo = np.asarray(sd.lights.origin[0])
        d2 = ((lo - p) ** 2).sum(-1)
        in_aoe = is_diffuse & (d2 <= float(sd.lights.aoe_sqr[0]))
        print(f"theta={theta:5.2f} hit={live.mean():5.1%} "
              f"diffuse={is_diffuse.mean():5.1%} glass={is_glass.mean():6.2%} "
              f"mirror={is_mirror.mean():6.2%} "
              f"live_b1={(is_glass | is_mirror).mean():6.2%} "
              f"sun_lit={sun_lit.mean():5.1%} aoe={in_aoe.mean():5.1%}",
              flush=True)


if __name__ == "__main__":
    main()
