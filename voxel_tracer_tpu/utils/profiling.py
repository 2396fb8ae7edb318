"""Profiling harness (src/dev/profile.h analog).

The reference's PROFILING build renders a deterministic 8x8x8 grid of 512
crate volumes with a canned camera on one pinned core (profile.h:10-37,
camera_profiling.bin).  Here the same scene is built from the reference's
own assets (or procedural crates when assets are absent), baked into a
single merged grid for the coherent kernel, with a fixed camera pose.

`trace()` wraps `jax.profiler` for device-level traces (the TPU analog of
the reference's FPS/frame-time overlay + step-count heatmaps, which live
on as the EMA timer in utils/timer.py and the steps AOV).
"""

from __future__ import annotations

import contextlib
import os

import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/voxel_tracer_trace",
          host_tracer_level: int = 2):
    """Capture a jax.profiler device trace around a code block.

    View with `tensorboard --logdir <logdir>` or xprof.  Usage:

        with profiling.trace("/tmp/tr"):
            out = render(...); jax.block_until_ready(out)
    """
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_trace=False)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside a trace (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)

from voxel_tracer_tpu.models.camera import Camera
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.models.vox import load_vox

VOXEL = 1.0 / 20.0  # reference VOXEL scale (common.h:18, vpu 20)
ASSET_DIR = "/root/reference/assets/vox"


def _procedural_crate(n: int = 32, mat: int = 30) -> np.ndarray:
    """Crate-ish hollow box with edge beams (stand-in for crate-16.vox)."""
    g = np.zeros((n, n, n), np.uint8)
    g[:2], g[-2:] = mat, mat
    g[:, :2], g[:, -2:] = mat, mat
    g[:, :, :2], g[:, :, -2:] = mat, mat
    g[2:-2, 2:-2, 2:-2] = 0
    # face planks
    g[2, 2:-2, 2:-2] = mat + 1
    g[-3, 2:-2, 2:-2] = mat + 1
    return g


def profiling_volumes(count_per_axis: int = 8):
    """The 512-crate scene (profile.h:23-36): crate models alternating by
    z layer, spaced VOXEL * 32 apart."""
    models = []
    for name in ("crate-16.vox", "crate-10.vox"):
        path = os.path.join(ASSET_DIR, name)
        if os.path.exists(path):
            m = load_vox(path)
            models.append((m.grid, m.palette_f32))
        else:
            models.append((_procedural_crate(), None))

    vols = []
    spacing = VOXEL * 32.0
    n = count_per_axis
    for z in range(n):
        grid, pal = models[z % 2]
        for y in range(n):
            for x in range(n):
                vols.append(VoxelVolume(
                    grid, pal, pos=(spacing * x, spacing * y, spacing * z),
                    vpu=20.0))
    return vols


def profiling_camera(aspect: float) -> Camera:
    """Fixed profiling pose (camera_profiling.bin analog): outside the
    crate field, looking into its center."""
    n = 8
    span = VOXEL * 32.0 * n
    center = np.array([span, span, span]) * 0.5
    pos = center + np.array([-span * 0.7, span * 0.45, -span * 0.8])
    return Camera.create(pos, center, aspect)


def profiling_scene_merged():
    """Baked single-grid version for the coherent kernel."""
    from voxel_tracer_tpu.ops.pallas.renderer_fast import bake_aligned_scene

    return bake_aligned_scene(profiling_volumes())


@contextlib.contextmanager
def jax_trace(logdir: str):
    """jax.profiler trace scope -> TensorBoard/Perfetto logdir.

    The TPU-native analog of the reference's PROFILING builds
    (src/dev/profile.h:10-37 pins a core + canned camera; here the
    device-side timeline comes from XLA's profiler instead).  Wrap any
    jitted render/train call:

        with jax_trace("/tmp/vt_trace"):
            renderer.render(...)  # one traced frame
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-scope inside a jax_trace capture (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
