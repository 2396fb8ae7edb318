"""Kernel-config sweep harness on the real chip (bench workload).

Unifies the round-1 ad-hoc tuning scripts: one parameterized driver that
benchmarks the Pallas traversal kernels over a grid of tile/unroll configs
at the 1080p bench shape (the analog of the reference's PROFILING builds,
src/dev/profile.h — here a sweep instead of a fixed pin).

Usage:
  python tools/sweep.py mega              # sweep megakernel configs
  python tools/sweep.py indep             # sweep independent-DDA kernel
  python tools/sweep.py lit               # sweep fused lit pipeline
  python tools/sweep.py mega --frames 16 --configs '[{"tile_rows":32,"tile_w":64}]'
"""
import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from voxel_tracer_tpu.models.camera import Camera
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.ops.pallas import mega, indep
from voxel_tracer_tpu.utils.timer import _force_sync

DEFAULT_CONFIGS = {
    "mega": [
        dict(tile_rows=32, tile_w=64, fine_unroll=6),
        dict(tile_rows=32, tile_w=64, fine_unroll=6, traversal="run",
             fine_iters=48, mat_rounds=64),
        dict(tile_rows=16, tile_w=64, fine_unroll=6),
        dict(tile_rows=64, tile_w=128, fine_unroll=6),
        dict(tile_rows=32, tile_w=64, fine_unroll=8),
        dict(tile_rows=32, tile_w=64, fine_unroll=6, slice_depth=2),
    ],
    "mega16": [
        dict(tile_rows=136, tile_w=128, fine_unroll=4, fine_iters=48,
             mat16=True, traversal="hier3"),
        dict(tile_rows=136, tile_w=128, fine_unroll=4, fine_iters=48,
             mat16=True, traversal="hier"),
        dict(tile_rows=136, tile_w=128, fine_unroll=6, fine_iters=48,
             mat16=True),
        dict(tile_rows=64, tile_w=128, fine_unroll=6, fine_iters=48),
        dict(tile_rows=32, tile_w=64, fine_unroll=6, fine_iters=48),
    ],
    "mega32": [
        dict(tile_rows=136, tile_w=128, fine_unroll=6, fine_iters=96),
        dict(tile_rows=136, tile_w=128, fine_unroll=8, fine_iters=96),
        dict(tile_rows=64, tile_w=128, fine_unroll=6, fine_iters=96),
    ],
    "indep": [
        dict(tile_rows=8, tile_w=32, fine_unroll=6),
        dict(tile_rows=16, tile_w=32, fine_unroll=6),
        dict(tile_rows=16, tile_w=64, fine_unroll=6),
        dict(tile_rows=32, tile_w=64, fine_unroll=6),
    ],
    "lit": [
        dict(tile_rows=32, tile_w=64, fine_unroll=6),
        dict(tile_rows=16, tile_w=64, fine_unroll=6),
        dict(tile_rows=32, tile_w=64, fine_unroll=6, shadow_tile_rows=16),
    ],
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("kernel", choices=("mega", "mega16", "mega32", "indep", "lit"))
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--configs", type=str, default=None,
                    help="JSON list of config dicts (overrides defaults)")
    args = ap.parse_args()

    W, H, FRAMES = args.width, args.height, args.frames
    vol = VoxelVolume.noise_filled((args.grid,) * 3, pos=(0, 0, 0), vpu=20.0)
    mv = mega.MegaVolume(vol)
    tb = mv.tables
    occb = indep.occb_of(tb) if args.kernel == "indep" else None
    # table choices must resolve OUTSIDE the traced frame fn (packing
    # inside a jit trace turns the host-side tables into tracers)
    from collections import defaultdict
    mega16_occw = defaultdict(lambda: mv.occw16)
    mega16_sub = None
    if args.kernel == "mega16":
        mega16_occw["hier3"] = mv.ensure_axes()
        mega16_occw["hier3p"] = mega16_occw["hier3"]
        mega16_sub = mv.ensure_sub_axes()
    sun = jnp.asarray([-0.619501, 0.465931, -0.631765], jnp.float32)

    def render_frame(theta, kw):
        px = 2.0 * jnp.cos(theta) + 2.4 * jnp.sin(theta)
        pz = -2.4 * jnp.cos(theta) + 2.0 * jnp.sin(theta)
        cam = Camera.create(jnp.stack([px, jnp.full_like(px, 1.4), pz]),
                            jnp.zeros(3), W / H)
        if args.kernel == "lit":
            out = mega.render_lambert_mega(mv, cam, W, H, sun_dir=sun,
                                           track_steps=False, **kw)
            return out["image"][..., 0].astype(jnp.int32)
        cam_p = mega.mega_camera(mv, cam, sun, W, H)
        if args.kernel == "mega":
            rgba, _, _ = mega.render_mega_tiles(
                cam_p, tb.occ, tb.occw, tb.wsm, tb.matw, mv.pal,
                bsize=tb.bsize, vpu=tb.vpu, width=W, height=H,
                track_steps=False, **kw)
        elif args.kernel == "mega16":
            matw = mv.matw16 if kw.get("mat16") else tb.matw
            wsm = (mv.sub4 if kw.get("traversal") == "hier"
                   else mega16_sub if kw.get("sub_skip")
                   else jnp.zeros((1, 1), jnp.int32))
            occw = mega16_occw[kw.get("traversal")]
            rgba, _, _ = mega.render_mega_tiles(
                cam_p, mv.occ16, occw, wsm,
                matw, mv.pal, width=W, height=H,
                track_steps=False, **mv.brick16_kw(), **kw)
        elif args.kernel == "mega32":
            kw32 = mv.brick32_kw()
            rgba, _, _ = mega.render_mega_tiles(
                cam_p, mv.occ32, mv.occw32, jnp.zeros((1, 1), jnp.int32),
                tb.matw, mv.pal, width=W, height=H,
                track_steps=False, **kw32, **kw)
        else:
            rgba, _, _ = indep.render_indep_tiles(
                cam_p, occb, tb.occw, tb.matw, mv.pal,
                bsize=tb.bsize, vpu=tb.vpu, width=W, height=H,
                track_steps=False, **kw)
        return rgba

    def bench_cfg(kw):
        # dynamic-bound while_loop: a static trip count makes XLA unroll
        # the loop and Mosaic recompile the kernel per iteration (see
        # bench.py docstring)
        @jax.jit
        def run_frames(n):
            def cond(s):
                return s[0] < n

            def body(s):
                i, c = s
                rgba = render_frame(c * 0.01, kw)
                return i + 1, c + 1.0 + rgba[0, 0].astype(jnp.float32) * 1e-38

            _, c = jax.lax.while_loop(cond, body,
                                      (jnp.int32(0), jnp.float32(0.0)))
            return c

        nf = jnp.int32(FRAMES)
        t0 = time.perf_counter()
        out = run_frames(nf); _force_sync(out)
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            out = run_frames(nf); _force_sync(out)
            best = min(best, (time.perf_counter() - t0) / FRAMES)
        rps = W * H / best
        print(json.dumps({"kernel": args.kernel,
                          "cfg": {k: str(v) for k, v in kw.items()},
                          "mrays": round(rps / 1e6, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)
        return rps

    configs = (json.loads(args.configs) if args.configs
               else DEFAULT_CONFIGS[args.kernel])
    for kw in configs:
        try:
            bench_cfg(kw)
        except Exception as e:  # keep sweeping past bad configs
            print(json.dumps({"cfg": {k: str(v) for k, v in kw.items()},
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
