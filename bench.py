"""Benchmark: primary rays/s at 1080p on one chip (BASELINE.md north star).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is measured against the 1 Grays/s north-star target
(BASELINE.json — the reference publishes no numbers of its own).
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_scene():
    """Dense 64^3 noise scene (profiling-style deterministic content)."""
    from voxel_tracer_tpu import Scene, VoxelVolume
    from voxel_tracer_tpu.models.skydome import SkyDome

    vol = VoxelVolume.noise_filled((64, 64, 64), pos=(0, 0, 0), vpu=20.0)
    return Scene(volumes=[vol], skydome=SkyDome.procedural(256, 128)).data()


def main():
    import jax
    import jax.numpy as jnp

    from voxel_tracer_tpu.models.camera import Camera
    from voxel_tracer_tpu.renderer import RenderConfig, _render_impl

    width, height = 1920, 1080
    config = RenderConfig(width=width, height=height, shading="flat")
    scene = build_scene()
    camera = Camera.create((2.2, 1.6, -2.8), (0, 0, 0), config.aspect)

    import functools
    fn = jax.jit(functools.partial(_render_impl, config=config))

    frame = jnp.int32(0)
    out = fn(scene, camera, frame)          # compile
    jax.block_until_ready(out)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(scene, camera, frame)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    n_rays = width * height
    rays_per_s = n_rays / dt
    target = 1e9  # >= 1 Grays/s north star
    print(json.dumps({
        "metric": "primary_rays_per_s_1080p",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / target, 4),
    }))


if __name__ == "__main__":
    main()
