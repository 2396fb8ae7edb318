"""Structured metrics logging + jax.profiler trace integration."""

import glob
import json
import os

import jax
import jax.numpy as jnp

from voxel_tracer_tpu.utils.logging import MetricsLogger
from voxel_tracer_tpu.utils import profiling


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m" / "metrics.jsonl")
    with MetricsLogger(path) as log:
        log.log(loss=0.5, rays_per_s=1e6)
        log.log(loss=jnp.float32(0.25))       # jax scalars coerce
        log.log(step=10, loss=0.1)
    lines = [json.loads(l) for l in open(path)]
    assert [l["step"] for l in lines] == [0, 1, 10]
    assert lines[0]["rays_per_s"] == 1e6
    assert isinstance(lines[1]["loss"], float)
    assert all("t" in l for l in lines)


def test_profiler_trace_writes(tmp_path):
    logdir = str(tmp_path / "trace")
    with profiling.trace(logdir):
        with profiling.annotate("tiny-op"):
            x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            jax.block_until_ready(x)
    produced = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(p) for p in produced), produced


def test_jax_trace_writes_events(tmp_path):
    import jax.numpy as jnp
    from voxel_tracer_tpu.utils.profiling import jax_trace, annotate

    with jax_trace(str(tmp_path)):
        with annotate("tiny-op"):
            (jnp.ones((8, 8)) * 2).block_until_ready()
    # a plugins/profile/<ts>/ dir with at least one event file appears
    found = list(tmp_path.rglob("*.pb")) + list(tmp_path.rglob("*.json.gz")) \
        + list(tmp_path.rglob("*.xplane.pb"))
    assert found, list(tmp_path.rglob("*"))
