"""Multi-process execution: 2 `jax.distributed` processes x 4 virtual CPU
devices on localhost, ONE global 8-device mesh, sharded train steps with
cross-process gradient pmean — asserted equal to the single-process
8-device run (SURVEY.md §5 "distributed communication backend";
BASELINE's >=85%-at-2-hosts target presumes this path exists at all).

Spawned as subprocesses because jax.distributed owns the process;
conftest's in-process jax config is irrelevant to the workers.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_ROOT, "tools", "multiproc_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(devices_per_process):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_process}")
    env.pop("JAX_PLATFORMS", None)   # worker forces cpu itself
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(_ROOT, ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    return env


def _run_single(timeout=600, mode="replicated"):
    out = subprocess.run(
        [sys.executable, _WORKER, "--steps", "3", "--mode", mode],
        env=_env(8), capture_output=True, text=True, timeout=timeout,
        cwd=_ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def _run_multi(timeout=600, mode="replicated"):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, "--coordinator", coord,
             "--num-processes", "2", "--process-id", str(i), "--steps", "3",
             "--mode", mode],
            env=_env(4), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=_ROOT)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            so, se = p.communicate(timeout=timeout)
            outs.append((p.returncode, so, se))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, so, se in outs:
        assert rc == 0, f"worker failed:\n{se[-2000:]}"
    # process 0 prints the result line
    line = outs[0][1].strip().splitlines()[-1]
    return json.loads(line)


def test_two_process_train_matches_single_process():
    multi = _run_multi()
    assert multi["multi"] is True
    assert multi["process_count"] == 2
    assert multi["global_devices"] == 8
    assert multi["local_devices"] == 4

    single = _run_single()
    assert single["process_count"] == 1
    assert single["global_devices"] == 8

    lm, ls = np.asarray(multi["losses"]), np.asarray(single["losses"])
    assert np.all(np.isfinite(lm))
    assert lm[-1] < lm[0], f"loss did not decrease: {lm}"
    # identical global compute; tolerance covers reduction-order FP only
    np.testing.assert_allclose(lm, ls, rtol=1e-5, atol=1e-7)


def test_two_process_grid_sharded_matches_single_process():
    """DP x MP across processes: the (GRID=2, RAYS=4) mesh lays the GRID
    axis across the process boundary — each z-slab of sigma/albedo (and
    its Adam moments) is owned by ONE process; rays are data-parallel
    within each process.  The 2-process run must match the
    single-process run on the same global mesh (identical compute,
    different process topology)."""
    multi = _run_multi(mode="grid")
    assert multi["mode"] == "grid"
    assert multi["process_count"] == 2
    assert multi["global_devices"] == 8

    single = _run_single(mode="grid")
    assert single["process_count"] == 1

    lm, ls = np.asarray(multi["losses"]), np.asarray(single["losses"])
    assert np.all(np.isfinite(lm))
    assert lm[-1] < lm[0], f"loss did not decrease: {lm}"
    np.testing.assert_allclose(lm, ls, rtol=1e-5, atol=1e-7)

    # and the grid-sharded losses agree with the replicated path up to
    # slab re-association — compounded through 3 Adam steps (lr 5e-2),
    # so looser than test_grid_train's single-association tolerance
    rep = _run_single(mode="replicated")
    np.testing.assert_allclose(lm, np.asarray(rep["losses"]), rtol=5e-3)
