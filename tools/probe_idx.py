"""Compare live-index compaction strategies on TPU: scatter-invert vs
searchsorted methods.  Picks the implementation for compact.live_indices."""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from bench_suite import _frame_loop, _timeit
    from voxel_tracer_tpu.utils.timer import _force_sync

    N, CAP = 983040, 61440
    rng = np.random.RandomState(0)
    mask = jnp.asarray(rng.rand(N) < 0.045)

    def scatter_invert(mask):
        pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
        slots = jnp.where(mask, pos, CAP)
        return jnp.full((CAP,), N, jnp.int32).at[slots].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop")

    def ss(method):
        def f(mask):
            cs = jnp.cumsum(mask.astype(jnp.int32))
            want = jnp.arange(1, CAP + 1, dtype=cs.dtype)
            return jnp.searchsorted(cs, want, side="left",
                                    method=method).astype(jnp.int32)
        return f

    def two_level(mask):
        B = 1024
        nb = N // B
        m2 = mask.reshape(nb, B).astype(jnp.int32)
        bs = m2.sum(axis=1)                       # (nb,)
        cumb = jnp.cumsum(bs)                     # inclusive
        want = jnp.arange(1, CAP + 1, dtype=cumb.dtype)
        b = jnp.searchsorted(cumb, want, side="left", method="scan")
        b = jnp.minimum(b, nb - 1)
        prev = jnp.where(b > 0, jnp.take(cumb, b - 1, mode="clip"), 0)
        lwant = want - prev                       # 1-based within block
        csl = jnp.cumsum(m2, axis=1)              # (nb, B)
        rows = jnp.take(csl, b, axis=0, mode="clip")   # (CAP, B)
        loc = jnp.sum((rows < lwant[:, None]).astype(jnp.int32), axis=1)
        idx = b * B + loc
        total = cumb[-1]
        return jnp.where(want <= total, idx, N).astype(jnp.int32)

    impls = {
        "scatter": scatter_invert,
        "ss_scan": ss("scan"),
        "ss_scan_unrolled": ss("scan_unrolled"),
        "ss_compare_all": None,   # O(N*CAP) — skipped
        "two_level": two_level,
    }

    ref = np.flatnonzero(np.asarray(mask))
    for name, impl in impls.items():
        if impl is None:
            continue
        got = np.asarray(impl(mask))
        assert (got[:len(ref)] == ref).all() and (got[len(ref):] == N).all(), \
            f"{name} wrong"

        def frame(c, impl=impl):
            m = mask ^ (c < -1.0)   # defeat caching, keep values
            return impl(m)[0].astype(jnp.float32) * 1e-30

        dt = _timeit(_frame_loop(frame, 64), _force_sync, rounds=2) / 64
        print(f"{name:18s} {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
