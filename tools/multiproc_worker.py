"""Multi-process jax.distributed worker: sharded train steps on a GLOBAL
mesh spanning processes.

The reference is strictly single-process (SURVEY.md §2.4 / §5: no
NCCL/MPI/sockets); this worker is the framework's DCN story made real:
N processes bootstrap through `parallel.distributed.initialize`
(coordination service over TCP — the DCN analog), build ONE global mesh
over all processes' devices, and run `make_train_step` (ray-sharded
inverse rendering, grads pmean'd across the process boundary).

Run one worker per process (see tests/test_distributed.py, or
tools/multiproc.py for the launcher):

    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python tools/multiproc_worker.py --coordinator localhost:PORT \
        --num-processes 2 --process-id 0 [--steps 3]

Process 0 prints one JSON line {"losses": [...], "process_count": N,
"global_devices": D} — deterministic, so a 2-process run must match the
single-process run bit-for-bit up to reduction order.
"""

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def build_problem(n_rays=512, g=32):
    """Deterministic tiny inverse-rendering problem (config-5 shaped)."""
    import numpy as np

    rng = np.random.RandomState(0)
    zz, yy, xx = np.meshgrid(*[np.linspace(0, 1, g)] * 3, indexing="ij")
    r2 = (xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2
    sigma_true = (40.0 * np.exp(-r2 * 30.0)).astype(np.float32)
    albedo_true = np.stack([xx, yy, 1.0 - xx], axis=-1).astype(np.float32)

    views = 32
    rpv = n_rays // views
    th = np.linspace(0, 2 * np.pi, views, endpoint=False)
    centers = np.stack([0.5 + 1.4 * np.cos(th), np.full(views, 0.9),
                        0.5 + 1.4 * np.sin(th)], axis=1)
    fwd = np.array([0.5, 0.5, 0.5]) - centers
    fwd /= np.linalg.norm(fwd, axis=1, keepdims=True)
    d = fwd[:, None, :] + rng.randn(views, rpv, 3) * 0.12
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(centers[:, None, :], (views, rpv, 3))
    return (sigma_true, albedo_true,
            np.ascontiguousarray(o.reshape(-1, 3), np.float32),
            np.ascontiguousarray(d.reshape(-1, 3), np.float32))


def run(steps: int = 3, n_rays: int = 512, g: int = 32,
        mode: str = "replicated"):
    """mode="replicated": pure ray-DP mesh, grid replicated.
    mode="grid": DP x MP — (GRID=2, RAYS=D/2) mesh with the GRID axis
    laid out ACROSS the process boundary (device order puts process 0's
    devices first, so reshape(2, -1) row 0 = process 0): each z-slab of
    sigma/albedo and its optimizer moments live on one process only,
    exercising the brick-sharded axis at multi-host scope."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from voxel_tracer_tpu.ops.diff import render_density
    from voxel_tracer_tpu.parallel.mesh import RAYS
    from voxel_tracer_tpu.parallel.sharding import make_train_step

    devices = np.asarray(jax.devices())
    if mode == "grid":
        from voxel_tracer_tpu.parallel.grid_shard import GRID
        from voxel_tracer_tpu.parallel.grid_train import (
            make_grid_sharded_train_step)
        mesh = Mesh(devices.reshape(2, -1), (GRID, RAYS))
        grid_sh = NamedSharding(mesh, P(GRID))
    else:
        mesh = Mesh(devices, (RAYS,))
        grid_sh = None
    ray_sh = NamedSharding(mesh, P(RAYS))
    rep = NamedSharding(mesh, P())

    def put(np_arr, sharding):
        """Global array from identical per-process host data."""
        return jax.make_array_from_callback(
            np_arr.shape, sharding, lambda idx: np_arr[idx])

    sigma_true, albedo_true, o_np, d_np = build_problem(n_rays, g)
    vpu = float(g)
    max_steps = 48

    o = put(o_np, ray_sh)
    d = put(d_np, ray_sh)
    st = put(sigma_true, rep)
    at = put(albedo_true, rep)
    target = jax.jit(
        lambda s, a, o, d: render_density(s, a, o, d, vpu, max_steps)["color"]
    )(st, at, o, d)

    optimizer = optax.adam(5e-2)
    p_np = {"sigma": np.full((g, g, g), 5.0, np.float32),
            "albedo": np.full((g, g, g, 3), 0.5, np.float32)}
    if mode == "grid":
        params = jax.tree.map(lambda x: put(x, grid_sh), p_np)
        opt_state = jax.tree.map(
            lambda x: put(np.asarray(x),
                          grid_sh if getattr(x, "ndim", 0) >= 3 else rep),
            optimizer.init(p_np))
        step = make_grid_sharded_train_step(mesh, optimizer, vpu,
                                            max_steps=max_steps)
    else:
        params = jax.tree.map(lambda x: put(x, rep), p_np)
        opt_state = jax.jit(
            lambda p: optimizer.init(p), out_shardings=rep)(params)
        step = make_train_step(mesh, optimizer, vpu, max_steps=max_steps)

    losses, times = [], []
    for _ in range(steps):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, o, d, target)
        losses.append(float(jax.block_until_ready(loss)))
        times.append(time.perf_counter() - t0)
    # first step includes compile; steady-state rate from the rest
    steady = times[1:] or times
    return losses, len(steady) / sum(steady)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--rays", type=int, default=512)
    ap.add_argument("--mode", default="replicated",
                    choices=["replicated", "grid"])
    args = ap.parse_args()

    # force the virtual-CPU backend BEFORE touching jax devices
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from voxel_tracer_tpu.parallel import distributed

    multi = distributed.initialize(args.coordinator, args.num_processes,
                                   args.process_id)
    info = distributed.process_info()
    losses, steps_per_s = run(args.steps, args.rays, mode=args.mode)
    if info["process_index"] == 0:
        print(json.dumps({
            "losses": losses,
            "steps_per_s": round(steps_per_s, 3),
            "mode": args.mode,
            "multi": multi,
            "process_count": info["process_count"],
            "global_devices": info["global_devices"],
            "local_devices": info["local_devices"],
        }), flush=True)


if __name__ == "__main__":
    main()
