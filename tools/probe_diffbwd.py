"""Micro-benchmark for the diffint backward (MXU histogram scatter).

In-jit K-iteration loop (sigma evolves each iteration -> serialized; no
single-dispatch timing — PERF.md methodology notes).  64^3 for fast
compiles; the same kernel serves diff_lambert_512 and the inverse
sequencer's slab calls.
"""
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from voxel_tracer_tpu.ops.pallas import diffint
from voxel_tracer_tpu.utils.timer import _force_sync

N = 512 * 512
G = 64
K = 8


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # the bench_suite scene: sparse Gaussian blob with exact zeros
    # outside (~15 % occupancy) so the empty-brick skip engages
    zz, yy, xx = jnp.meshgrid(*[jnp.linspace(0, 1, G)] * 3, indexing="ij")
    r2 = (xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2
    blob = 40.0 * jnp.exp(-r2 * 60.0)
    sigma = jnp.where(blob > 0.05, jax.random.uniform(k1, (G, G, G))
                      * blob * 0.25, 0.0)
    albedo = jax.random.uniform(k2, (G, G, G, 3))
    u = jax.random.uniform(k3, (N, 2)) * (G / 20.0)
    o_l = jnp.stack([u[:, 0], u[:, 1], jnp.full((N,), -0.5)], axis=1)
    d0 = jnp.array([0.15, 0.1, 1.0]); d0 = d0 / jnp.linalg.norm(d0)
    d_l = jnp.broadcast_to(d0, (N, 3))
    ot = diffint.tile_raster(o_l, 512, 512)
    dt_ = diffint.tile_raster(d_l, 512, 512)
    tgt = jax.random.uniform(jax.random.PRNGKey(7), (N, 3))

    def ploss(sig, alb):
        out = diffint.render_density_mega(sig, alb, ot, dt_, 20.0, 8,
                                          1e-4, False)
        return jnp.mean((out["color"] - tgt) ** 2)

    grad = jax.grad(ploss, argnums=(0, 1))

    @jax.jit
    def run_bwd(sig, alb, n):
        def body(c):
            i, s, a = c
            gs, ga = grad(s, a)
            return i + 1, s - 1e-3 * gs, a - 1e-3 * ga

        def cond(c):
            return c[0] < n

        _, s, a = jax.lax.while_loop(cond, body, (jnp.int32(0), sig, alb))
        return s[0, 0, 0] + a[0, 0, 0, 0]

    @jax.jit
    def run_fwd(sig, alb, n):
        def body(c):
            i, s, acc = c
            out = diffint.render_density_mega(s, alb, ot, dt_, 20.0, 8,
                                              1e-4, False)
            l = out["color"].sum() + out["trans"].sum()
            return i + 1, s + l * 1e-30, acc + l

        def cond(c):
            return c[0] < n

        _, _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), sig, jnp.float32(0.0)))
        return acc

    n = jnp.int32(K)
    for name, fn in (("fwd", run_fwd), ("bwd", run_bwd)):
        out = fn(sigma, albedo, n); _force_sync(out)
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn(sigma, albedo, n); _force_sync(out)
            best = min(best, (time.perf_counter() - t0) / K)
        print(json.dumps({"probe": f"diff64_{name}",
                          "ms_per_iter": round(best * 1e3, 2),
                          "rays_per_s": round(N / best)}), flush=True)


if __name__ == "__main__":
    main()
