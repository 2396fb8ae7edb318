"""Sweep lambert-pipeline configs on the 512-crate profiling scene at
1080p (the multiobj_shadow benchmark's workload) — the primary pass is
skeleton-bound (windows scale with slices along the major axis), so the
candidates cut window count: fused-depth slice pairs (slice_depth=2),
32^3 super-bricks, and the hier3 span scan.

    python tools/sweep_multiobj.py [--frames 16]
"""

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from voxel_tracer_tpu.ops.pallas import mega
from voxel_tracer_tpu.utils.profiling import (profiling_camera,
                                              profiling_scene_merged)
from voxel_tracer_tpu.utils.timer import _force_sync

W, H = 1920, 1088

CONFIGS = [
    dict(label="brick16 (r3 champion)", use_brick16=True, tile_rows=64,
         tile_w=128, fine_unroll=6, shadow_tile_rows=128),
    dict(label="brick16 deep", use_brick16=True, tile_rows=64,
         tile_w=128, fine_unroll=6, shadow_tile_rows=128, slice_depth=2,
         shadow_slice_depth=2),
    dict(label="brick16 deep primary only", use_brick16=True,
         tile_rows=64, tile_w=128, fine_unroll=6, shadow_tile_rows=128,
         slice_depth=2),
    dict(label="brick32", use_brick32=True, tile_rows=64, tile_w=128,
         fine_unroll=6, shadow_tile_rows=128),
    dict(label="hier3", use_hier3=True, tile_rows=64, tile_w=128,
         fine_unroll=4, shadow_tile_rows=128),
    dict(label="hier3 deep", use_hier3=True, tile_rows=64, tile_w=128,
         fine_unroll=4, shadow_tile_rows=128, slice_depth=2),
    dict(label="hier3p", use_hier3p=True, tile_rows=64, tile_w=128,
         fine_unroll=4, shadow_tile_rows=128),
    dict(label="hier3p deep shadows", use_hier3p=True, tile_rows=64,
         tile_w=128, fine_unroll=4, shadow_tile_rows=128,
         shadow_slice_depth=2),
    dict(label="hier3 sb128", use_hier3=True, tile_rows=64, tile_w=128,
         fine_unroll=4, shadow_tile_rows=128, shadow_block=True),
    dict(label="hier3 sb32", use_hier3=True, tile_rows=64, tile_w=128,
         fine_unroll=4, shadow_tile_rows=32, shadow_block=True),
    dict(label="hier3 sb8", use_hier3=True, tile_rows=64, tile_w=128,
         fine_unroll=4, shadow_tile_rows=8, shadow_block=True),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()
    FRAMES = args.frames

    merged = profiling_scene_merged()
    mv = mega.MegaVolume(merged)
    # resolve every lazily-packed table HOST-SIDE before tracing: packing
    # inside a jit trace caches tracers on the MegaVolume (and leaks them
    # into later configs)
    mv.ensure_axes()
    mv._ensure32()
    mv.compact_matw()
    cam0 = profiling_camera(W / H)

    results = []
    for cfg in CONFIGS:
        cfg = dict(cfg)
        label = cfg.pop("label")

        def frame(theta, kw=cfg):
            cam = cam0._replace(pos=cam0.pos + theta * 1e-5)
            out = mega.render_lambert_mega(mv, cam, W, H,
                                           track_steps=False, **kw)
            return out["image"][0, 0, 0].astype(jnp.float32) * 1e-38

        @jax.jit
        def run(n):
            def body(st):
                i, c = st
                return i + 1, c + 1.0 + frame(c * 0.01)
            _, c = jax.lax.while_loop(lambda st: st[0] < n, body,
                                      (jnp.int32(0), jnp.float32(0.0)))
            return c

        try:
            n = jnp.int32(FRAMES)
            _force_sync(run(n))
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                _force_sync(run(n))
                best = min(best, time.perf_counter() - t0)
            dt = best / FRAMES
            r = {"label": label, "ms_per_frame": round(dt * 1e3, 2),
                 "fps": round(1.0 / dt, 2),
                 "rays_per_s_2x": round(2 * W * H / dt)}
        except Exception as e:
            r = {"label": label, "error": str(e)[:200]}
        results.append(r)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
