"""Micro-costs of the whitted frame's building blocks on the TPU, using
the same multi-iteration while_loop methodology as bench.py (naive
timing is unusable on the axon tunnel).

Pieces: procedural sky sample, an elementwise where/mul chain, the
compaction harness (cumsum + gather/scatter), and single `_trace` calls
at full/bucket sizes — pins which part of a shading stage dominates.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--list-tile-rows", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench_suite import _frame_loop, _timeit
    from voxel_tracer_tpu.models.skydome import SkyDome, sample_sky
    from voxel_tracer_tpu.models.volume import VoxelVolume
    from voxel_tracer_tpu.ops.compact import bucket_caps, live_indices, \
        masked_apply
    from voxel_tracer_tpu.ops.pallas import mega
    from voxel_tracer_tpu.ops.pallas.whitted import MegaIntersector
    from voxel_tracer_tpu.utils.timer import _force_sync

    N = 983040
    rng = np.random.RandomState(0)
    sky = SkyDome.procedural(64, 32).data()
    dirs_np = rng.randn(N, 3).astype(np.float32)
    dirs_np /= np.linalg.norm(dirs_np, axis=1, keepdims=True)
    dirs = jnp.asarray(dirs_np)
    xs = jnp.asarray(rng.rand(N, 3).astype(np.float32))
    mask = jnp.asarray(rng.rand(N) < 0.045)

    vol = VoxelVolume.noise_filled((64, 64, 64), pos=(0, 0, 0), vpu=20.0)
    mv = mega.MegaVolume(vol)
    isect = MegaIntersector(mv, tile_rows=128, fine_iters=48, fine_unroll=4,
                            list_tile_rows=args.list_tile_rows)
    o_np = (rng.rand(N, 3) * 3.2).astype(np.float32)
    o_full = jnp.asarray(o_np)
    d_full = dirs

    def mk(fn):
        def frame(c):
            return fn(c)
        return frame

    def t_sky(c):
        s = sample_sky(sky, dirs * (1.0 + c * 1e-9))
        return s[0, 0] * 1e-30

    def t_chain(c):
        x = xs * (1.0 + c * 1e-9)
        m = mask
        for _ in range(10):
            x = jnp.where(m[:, None], x * 1.0001 + 0.0001, x)
            x = x + x * 1e-6
        return x[0, 0] * 1e-30

    def t_compact_harness(c):
        # the masked_apply skeleton with a trivial fn at cap 61440
        def fn(lv, idx, a, b, cc, d, e):
            return a + b[:, None]
        out = masked_apply(
            mask, fn,
            (xs * (1.0 + c * 1e-9), mask.astype(jnp.float32),
             xs[:, 0], xs[:, 1], xs),
            jnp.zeros((N, 3)), (61440, N))
        return out[0, 0] * 1e-30

    def t_trace_full(c):
        o = o_full + c * 1e-9
        r = isect._trace(o, d_full, isect.full_tables, fetch=True)
        return r["t"][0] * 1e-30

    o_b = o_full[:61440]
    d_b = d_full[:61440]

    def t_trace_61k(c):
        o = o_b + c * 1e-9
        r = isect._trace(o, d_b, isect.full_tables, fetch=True)
        return r["t"][0] * 1e-30

    o_s = o_full[:15360]
    d_s = d_full[:15360]

    def t_trace_15k(c):
        o = o_s + c * 1e-9
        r = isect._trace(o, d_s, isect.full_tables, fetch=True)
        return r["t"][0] * 1e-30

    def t_shadow_61k(c):
        seed = jnp.full((61440,), 123, jnp.uint32)
        h = isect._shadow_trace(o_b + c * 1e-9, d_b, seed)
        return h.t[0] * 1e-30

    pieces = {
        "sky_983k": t_sky,
        "chain10_983k": t_chain,
        "compact_harness": t_compact_harness,
        "trace_983k": t_trace_full,
        "trace_61k": t_trace_61k,
        "trace_15k": t_trace_15k,
        "shadow2_61k": t_shadow_61k,
    }
    only = set(args.only.split(",")) if args.only else None
    for name, fn in pieces.items():
        if only and name not in only:
            continue
        dt = _timeit(_frame_loop(mk(fn), args.iters), _force_sync,
                     rounds=2) / args.iters
        print(f"{name:18s} {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
