"""Cost probes for the inverse_128_32views sequencer (diffint slabs).

Brackets the 16.6 steps/s baseline: full train step vs forward-only
chain, tile_rows sweep (fewer/larger grid programs per call), and the
per-call fixed skeleton (ray-count scaling).  Run on the real chip.
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
import optax

from voxel_tracer_tpu.models.camera import Camera, rays_for_image
from voxel_tracer_tpu.ops.pallas import diffint
from voxel_tracer_tpu.utils.timer import _force_sync

G = 128
VIEWS = 32
VW = VH = 64
N = VIEWS * VW * VH
VPU = 20.0


def make_rays(th_px, tw_px):
    center = G / (2 * VPU)
    o_all, d_all = [], []
    for v in range(VIEWS):
        th = 2 * np.pi * v / VIEWS
        pos = (center + 2.2 * G / VPU / 4 * np.cos(th), center * 1.35,
               center + 2.2 * G / VPU / 4 * np.sin(th))
        cam = Camera.create(pos, (center, center, center), VW / VH)
        o, d = rays_for_image(cam, VW, VH)
        o_all.append(diffint.tile_raster(o, VH, VW, th_px, tw_px))
        d_all.append(diffint.tile_raster(d, VH, VW, th_px, tw_px))
    return jnp.concatenate(o_all), jnp.concatenate(d_all)


def timeit(fn, rounds=3):
    out = fn(); _force_sync(out)
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn(); _force_sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    target = jax.random.uniform(ks[0], (N, 3))
    params = {"s": jax.random.uniform(ks[1], (G, G, G)),
              "a": jax.random.uniform(ks[2], (G, G, G, 3))}
    results = []

    for tile_rows, (th_px, tw_px) in ((8, (32, 32)), (16, (32, 64)),
                                      (32, (64, 64))):
        o_l, d_l = make_rays(th_px, tw_px)

        def loss(p):
            out = diffint.render_density_slabs(p["s"], p["a"], o_l, d_l,
                                               VPU, 8, tile_rows, 1e-4,
                                               False)
            return jnp.mean((out["color"] - target) ** 2)

        fwd = jax.jit(loss)
        opt = optax.adam(1e-2)
        st0 = opt.init(params)

        @jax.jit
        def step(p, st):
            l, gr = jax.value_and_grad(loss)(p)
            up, st = opt.update(gr, st, p)
            return optax.apply_updates(p, up), st, l

        dt_f = timeit(lambda: fwd(params))
        dt_s = timeit(lambda: step(params, st0))
        r = {"tile_rows": tile_rows, "tile_px": [th_px, tw_px],
             "fwd_ms": round(dt_f * 1e3, 2),
             "step_ms": round(dt_s * 1e3, 2),
             "steps_per_s": round(1.0 / dt_s, 2)}
        print(json.dumps(r), flush=True)
        results.append(r)

    # per-call fixed skeleton: forward chain at 1/4 the rays (8 views)
    o_l, d_l = make_rays(32, 32)
    o_q, d_q = o_l[:N // 4], d_l[:N // 4]

    def loss_q(p):
        out = diffint.render_density_slabs(p["s"], p["a"], o_q, d_q,
                                           VPU, 8, 8, 1e-4, False)
        return jnp.mean(out["color"] ** 2)

    fwd_q = jax.jit(loss_q)
    dt_q = timeit(lambda: fwd_q(params))
    r = {"probe": "fwd_quarter_rays", "fwd_ms": round(dt_q * 1e3, 2)}
    print(json.dumps(r), flush=True)
    results.append(r)

    with open(os.path.join(_ROOT, "PROBE_INVERSE.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
