"""Speed-of-light measurement kit -> ROOFLINE.json (methodology: PERF.md).

Rather than quoting datasheet numbers, measure the chip's practical
ceilings with microbenchmarks, then measure what the renderer's kernels
actually consume per ray:

  vpu_lane_ops_per_s  sustained f32 element-wise FMA throughput (1 FMA =
                      1 lane-op): 4 independent 2 MB chains x 16 FMAs
                      per fori iteration.  Independent chains matter: a
                      single 64-deep dependent chain measured 6x slower
                      (scheduling pathology), and the loop carry
                      round-trips HBM each iteration, so the quoted
                      number is a lower bound on raw VPU issue rate —
                      it is the PRACTICAL sustained ceiling for
                      loop-structured element-wise code, which is what
                      the render kernels are.
  mxu_bf16_flop_per_s chained 8192^2 bf16 matmuls (c = c @ b).
  hbm_stream_b_per_s  read+write streaming: 512 chained scale passes
                      over a 256 MB array.
  steps_per_ray       mean megakernel march steps on the headline 1080p
                      dense-noise scene (track_steps=True, one frame).

All loops are data-dependent and live inside ONE jit (bench.py's
methodology): on the axon tunnel, back-to-back identical dispatches are
served from a cache and `block_until_ready` does not reliably block —
independent repeats measure dispatch, not compute.  Timings come from
`_force_sync` (host materialization).

Speed-of-light fraction for a VMEM-resident kernel = measured rays/s x
(lane-ops per ray) / vpu_lane_ops_per_s, where lane-ops per ray =
steps_per_ray x (hand-counted lane-ops per fine step) + per-window
skeleton — the count is documented in PERF.md next to the kernel source.
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


def _time_call(fn, *args):
    """Best of 3 timed calls of a jitted scalar-returning fn."""
    from voxel_tracer_tpu.utils.timer import _force_sync

    _force_sync(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _force_sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_vpu():
    import jax, jax.numpy as jnp
    import numpy as np

    shape = (512, 1024)                    # 2 MB f32 block
    chains = 4                             # independent ILP chains
    inner = 16                             # FMAs per chain per iteration
    iters = 65536
    n = shape[0] * shape[1]

    @jax.jit
    def run(xs, a, b):
        def body(_, xs):
            for _ in range(inner // 2):
                xs = tuple(x * a + b for x in xs)
                xs = tuple(x * b + a for x in xs)
            return xs
        xs = jax.lax.fori_loop(0, iters, body, xs)
        return sum(x.sum() for x in xs)

    rng = np.random.RandomState(0)
    xs = tuple(jnp.asarray(rng.rand(*shape), jnp.float32)
               for _ in range(chains))
    a = jnp.float32(0.99999)
    b = jnp.float32(1e-7)
    dt = _time_call(run, xs, a, b)
    return chains * n * inner * iters / dt


def bench_mxu():
    import jax, jax.numpy as jnp
    import numpy as np

    k = 8192
    iters = 64
    rng = np.random.RandomState(0)
    # near-identity keeps the chain numerically stable
    b = jnp.asarray(np.eye(k) + rng.rand(k, k) * 1e-4, jnp.bfloat16)
    c0 = jnp.asarray(rng.rand(k, k), jnp.bfloat16)

    @jax.jit
    def run(c, b):
        def body(_, c):
            return jnp.dot(c, b,
                           preferred_element_type=jnp.bfloat16) * 0.5
        return jax.lax.fori_loop(0, iters, body, c).astype(
            jnp.float32).sum()

    dt = _time_call(run, c0, b)
    return 2.0 * k ** 3 * iters / dt


def bench_hbm():
    import jax, jax.numpy as jnp

    n = 256 * 2**20 // 4                   # 256 MB f32
    iters = 512
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def run(x):
        def body(_, x):
            return x * jnp.float32(1.0000001)
        return jax.lax.fori_loop(0, iters, body, x).sum()

    dt = _time_call(run, x)
    return 2 * n * 4 * iters / dt          # read + write per pass


def bench_steps_per_ray():
    """Mean march steps/ray on the exact headline bench scene/config."""
    import jax, jax.numpy as jnp
    import numpy as np
    from voxel_tracer_tpu.models.camera import Camera
    from voxel_tracer_tpu.models.volume import VoxelVolume
    from voxel_tracer_tpu.ops.pallas import mega

    width, height = 1920, 1088
    vol = VoxelVolume.noise_filled((64, 64, 64), pos=(0, 0, 0), vpu=20.0)
    mv = mega.MegaVolume(vol)
    occw3 = mv.ensure_axes()
    sun = jnp.asarray([-0.619501, 0.465931, -0.631765], jnp.float32)
    cam = Camera.create((2.0, 1.4, -2.4), (0, 0, 0), width / height)
    cam_p = mega.mega_camera(mv, cam, sun, width, height)
    _, t, aux = mega.render_mega_tiles(
        cam_p, mv.occ16, occw3, jnp.zeros((1, 1), jnp.int32),
        mv.matw16, mv.pal, width=width, height=height,
        tile_rows=136, tile_w=128, fine_unroll=4, fine_iters=48,
        track_steps=True, mat16=True, traversal="hier3",
        **mv.brick16_kw())
    steps = np.asarray((aux >> mega.AUX_STEPS_SHIFT) & 0x7ffff)
    hit = np.asarray(t) < mega.BIG
    return dict(mean_steps_per_ray=float(steps.mean()),
                mean_steps_hit=float(steps[hit].mean()),
                mean_steps_miss=float(steps[~hit].mean()),
                hit_fraction=float(hit.mean()))


def main():
    import jax
    res = {
        "device": str(jax.devices()[0]),
        "vpu_lane_ops_per_s": round(bench_vpu()),
        "mxu_bf16_flop_per_s": round(bench_mxu()),
        "hbm_stream_b_per_s": round(bench_hbm()),
    }
    res.update(bench_steps_per_ray())
    print(json.dumps(res, indent=1))
    with open(os.path.join(_ROOT, "ROOFLINE.json"), "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
