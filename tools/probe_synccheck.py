"""Is the host sync a real barrier?  (axon tunnel forensics.)

Context: identical in-jit K-iteration loops of the diffint backward read
192 ms/iter in a fresh process but ~9 ms/iter in a process that ran
OTHER programs first (r4's artifact numbers all came from such a
process).  Physically the same binary on the same chip cannot be 22x
faster, so one context's host sync must not be a barrier.

This probe measures, in ONE process, in this order:
  1. clean context:   pallas bwd loop, K-scaling slope, scalar sync
  2. clean context:   same, FULL materialization of all outputs
  3. poison:          one XLA-wavefront bwd loop (the r4 suite ordering)
  4. poisoned:        repeat 1 and 2

If the scalar-sync reading collapses after poisoning while the
full-materialization reading (and the K-slope) stays put, the scalar
sync is not a barrier under queue pressure and every timed loop must
materialize its full outputs.  The K-slope (t(K2)-t(K1))/(K2-K1) also
cancels any constant transfer/dispatch overhead.
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

from voxel_tracer_tpu.ops import diff
from voxel_tracer_tpu.ops.pallas import diffint

N = 512 * 512
G = 64


def setup():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
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
    return sigma, albedo, o_l, d_l, ot, dt_, tgt


def main():
    sigma, albedo, o_l, d_l, ot, dt_, tgt = setup()

    def ploss(sig, alb):
        out = diffint.render_density_mega(sig, alb, ot, dt_, 20.0, 8,
                                          1e-4, False)
        return jnp.mean((out["color"] - tgt) ** 2)

    pgrad = jax.grad(ploss, argnums=(0, 1))

    @jax.jit
    def run(n, sig, alb):
        def body(c):
            i, s, a = c
            gs, ga = pgrad(s, a)
            return i + 1, s - 1e-6 * gs, a - 1e-6 * ga
        _, s, a = jax.lax.while_loop(
            lambda c: c[0] < n, body, (jnp.int32(0), sig, alb))
        return s, a

    def measure(tag):
        out = run(jnp.int32(2), sigma, albedo)
        np.asarray(out[0]); np.asarray(out[1])      # settle
        res = {"ctx": tag}
        for sync_name, sync in (
                ("scalar", lambda o: np.asarray(o[0].ravel()[0])),
                ("full", lambda o: (np.asarray(o[0]), np.asarray(o[1])))):
            ts = {}
            for k in (2, 8):
                t0 = time.perf_counter()
                out = run(jnp.int32(k), sigma, albedo)
                sync(out)
                ts[k] = time.perf_counter() - t0
            res[f"{sync_name}_ms_k2"] = round(ts[2] * 1e3, 1)
            res[f"{sync_name}_ms_k8"] = round(ts[8] * 1e3, 1)
            res[f"{sync_name}_slope_ms"] = round(
                (ts[8] - ts[2]) / 6 * 1e3, 2)
        print(json.dumps(res), flush=True)

    measure("clean")

    # poison: one XLA-wavefront bwd program (the r4 suite ran these
    # before the pallas loops)
    def xloss(p):
        out = diff.render_density(p["s"], p["a"], o_l, d_l, 20.0, 128)
        return jnp.mean((out["color"] - tgt) ** 2)

    g = jax.jit(jax.grad(xloss))({"s": sigma, "a": albedo})
    np.asarray(g["s"].ravel()[0])
    measure("poisoned")


if __name__ == "__main__":
    main()
