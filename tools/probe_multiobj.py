"""Pass-level cost breakdown of the multiobj_shadow frame: primary-only
kernel vs primary+shadow vs the full lambert pipeline, per traversal.

    python tools/probe_multiobj.py [--frames 32]
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

from voxel_tracer_tpu.models.scene import SUN_DIR
from voxel_tracer_tpu.ops.pallas import mega
from voxel_tracer_tpu.utils.profiling import (profiling_camera,
                                              profiling_scene_merged)
from voxel_tracer_tpu.utils.timer import _force_sync

W, H = 1920, 1088


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    args = ap.parse_args()
    FRAMES = args.frames

    merged = profiling_scene_merged()
    mv = mega.MegaVolume(merged)
    occw3 = mv.ensure_axes()
    matw_c, remap = mv.compact_matw()
    cam0 = profiling_camera(W / H)
    sun = jnp.asarray(SUN_DIR, jnp.float32)
    tb = mv.tables

    kw16 = dict(bsize=mv.bsize16, brick=16, mat_bsize=tb.bsize,
                vpu=tb.vpu, fine_iters=48)

    def bench(label, frame):
        @jax.jit
        def run(n):
            def body(st):
                i, c = st
                return i + 1, c + 1.0 + frame(c * 0.01)
            _, c = jax.lax.while_loop(lambda st: st[0] < n, body,
                                      (jnp.int32(0), jnp.float32(0.0)))
            return c
        n = jnp.int32(FRAMES)
        _force_sync(run(n))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            _force_sync(run(n))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"label": label,
                          "ms_per_frame": round(best / FRAMES * 1e3, 2)}),
              flush=True)

    def primary_only(theta):
        cam = cam0._replace(pos=cam0.pos + theta * 1e-5)
        cam_p = mega.mega_camera(mv, cam, sun, W, H)
        rgba, t, aux = mega.render_mega_tiles(
            cam_p, mv.occ16, occw3, remap, matw_c, mv.pal,
            width=W, height=H, tile_rows=64, tile_w=128,
            sky_mode="none", shading="raw", fine_unroll=4,
            track_steps=False, traversal="hier3", matw_space="compact",
            **kw16)
        return rgba[0, 0].astype(jnp.float32) * 1e-38

    def full(theta):
        cam = cam0._replace(pos=cam0.pos + theta * 1e-5)
        out = mega.render_lambert_mega(mv, cam, W, H, tile_rows=64,
                                       tile_w=128, fine_unroll=4,
                                       shadow_tile_rows=128,
                                       track_steps=False, use_hier3=True)
        return out["image"][0, 0, 0].astype(jnp.float32) * 1e-38

    # NOTE: camera-mode + shading='trace' at tile_rows=64 hangs the
    # Mosaic compile on this toolchain (observed twice; wedges the
    # tunnel) — probe with the exact 'raw' primary config instead.
    bench("primary raw (compact mats)", primary_only)
    bench("full lambert (hier3)", full)


if __name__ == "__main__":
    main()
