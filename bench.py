"""Benchmark: primary rays/s at 1080p on one chip (BASELINE.md north star).

Scene: dense 64^3 noise volume (BASELINE.json config 1 content) with a
full-coverage camera, flat shading, traced by the coherent brick-slice
Pallas kernel.  Frames are chained between host syncs (8 per sync) because
the tunnel's per-sync round trip is ~65 ms — the per-frame figure still
includes its amortized share, so this is honest end-to-end throughput.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is measured against the 1 Grays/s north-star target
(BASELINE.json — the reference publishes no numbers of its own).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from voxel_tracer_tpu.models.camera import Camera
    from voxel_tracer_tpu.models.skydome import SkyDome
    from voxel_tracer_tpu.models.volume import VoxelVolume
    from voxel_tracer_tpu.ops.pallas.integrate import (FastVolume,
                                                       render_flat_fast)
    from voxel_tracer_tpu.utils.timer import _force_sync

    width, height = 1920, 1088  # 1080p-class, multiple of the 1024-ray tile
    vol = VoxelVolume.noise_filled((64, 64, 64), pos=(0, 0, 0), vpu=20.0)
    fv = FastVolume(vol)
    sky = jnp.asarray(SkyDome.procedural(256, 128).pixels)
    camera = Camera.create((2.0, 1.4, -2.4), (0, 0, 0), width / height)

    out = render_flat_fast(fv, sky, camera, width, height)
    _force_sync(out)

    chain, rounds = 8, 2
    t0 = time.perf_counter()
    for _ in range(rounds):
        outs = [render_flat_fast(fv, sky, camera, width, height)
                for _ in range(chain)]
        for o in outs:
            _force_sync(o)
    dt = (time.perf_counter() - t0) / (chain * rounds)

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
