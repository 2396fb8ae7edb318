"""Parity: batched JAX DDA vs the scalar CPU oracle.

Covers BASELINE.json config 1: dense 64^3 grid, primary rays, 256^2 camera
(subsampled here for test speed), plus rotated volumes and edge cases.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from voxel_tracer_tpu.models.camera import Camera, rays_for_image
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.ops import dda, oracle
from voxel_tracer_tpu.ops.math3d import BIG_F32


def _sphere_grid(n=64, r=0.4, material=5):
    z, y, x = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    c = (n - 1) / 2.0
    d = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    return np.where(d < r * n, material, 0).astype(np.uint8)


def _trace_jax(vol: VoxelVolume, origins, dirs):
    data = vol.data()
    rt = np.asarray(data.rot).T
    o_l = (origins - vol.pos) @ rt.T + vol.pivot
    d_l = dirs @ rt.T
    res = dda.intersect_volume_local(
        data.grid, data.brick_occ, jnp.asarray(o_l, jnp.float32),
        jnp.asarray(d_l, jnp.float32), data.vpu)
    normal = dda.normal_from_axis(res["axis"], res["step_sign"], data.rot)
    return {k: np.asarray(v) for k, v in res.items()} | {
        "normal": np.asarray(normal)}


def _compare(vol, origins, dirs, atol=2e-3):
    ovol = oracle.OracleVolume(
        grid=vol.grid, vpu=vol.vpu, pos=vol.pos, rot=vol.rot,
        palette=vol.palette)
    res = _trace_jax(vol, origins, dirs)
    n_mismatch = 0
    for i in range(origins.shape[0]):
        h = oracle.intersect_volume(ovol, origins[i], dirs[i])
        jt = res["t"][i]
        if h.no_hit != (jt >= BIG_F32 * 0.99):
            # grazing/boundary rays may flip hit<->miss between the two
            # float pipelines (XLA fuses mul+add); budget below
            n_mismatch += 1
            continue
        if h.no_hit:
            continue
        if not np.isclose(jt, h.depth, atol=atol, rtol=1e-4):
            n_mismatch += 1
            continue
        assert res["mat"][i] == h.material, f"ray {i} material"
        np.testing.assert_allclose(
            res["normal"][i], h.normal, atol=1e-5,
            err_msg=f"ray {i} normal")
    # allow a tiny fraction of boundary-FP mismatches
    # PINNED budget: observed 0 mismatches on every scene/camera in this
    # suite (2026-08 audit); 2 leaves headroom for cross-version FP jitter
    # only — any regression beyond isolated boundary flips must fail
    assert n_mismatch <= 2, (
        f"{n_mismatch}/{origins.shape[0]} hit/depth mismatches")


def _camera_rays(pos, target, w=32, h=32, aspect=1.0):
    cam = Camera.create(pos, target, aspect)
    o, d = rays_for_image(cam, w, h)
    return np.asarray(o), np.asarray(d)


class TestDenseSphere:
    def test_axis_aligned_view(self):
        vol = VoxelVolume(_sphere_grid(), pos=(0, 0, 0), vpu=20.0)
        o, d = _camera_rays((0.013, 0.007, -4), (0, 0, 0))
        _compare(vol, o, d)

    def test_oblique_view(self):
        vol = VoxelVolume(_sphere_grid(), pos=(0.5, -0.2, 0.1), vpu=20.0)
        o, d = _camera_rays((2.5, 1.5, -2.5), (0.5, -0.2, 0.1))
        _compare(vol, o, d)

    def test_camera_inside_volume(self):
        vol = VoxelVolume(_sphere_grid(64, r=0.3), vpu=20.0)
        o, d = _camera_rays((0.0, 1.2, 0.0), (0.0, 0.0, 0.0))
        _compare(vol, o, d)

    def test_rotated_volume(self):
        from voxel_tracer_tpu.ops.math3d import quat_from_axis_angle, quat_to_mat3
        rot = np.asarray(quat_to_mat3(quat_from_axis_angle((0, 1, 0), 0.7)))
        vol = VoxelVolume(_sphere_grid(), rot=rot, vpu=20.0)
        o, d = _camera_rays((0, 0.5, -4), (0, 0, 0))
        _compare(vol, o, d)


class TestNoiseGrid:
    def test_noise_volume(self):
        vol = VoxelVolume.noise_filled((64, 64, 64))
        o, d = _camera_rays((-2, 2, -4), (0, 0, 0))
        _compare(vol, o, d)

    def test_non_multiple_of_brick(self):
        """Grids not divisible by 8 exercise the padded brick boundary."""
        g = _sphere_grid(64)[:50, :44, :60]
        vol = VoxelVolume(g, vpu=20.0)
        o, d = _camera_rays((0.4, 0.6, -3), (0, 0, 0))
        _compare(vol, o, d)


class TestRandomRays:
    def test_random_directions(self, rng):
        vol = VoxelVolume.noise_filled((32, 32, 32))
        n = 256
        o = rng.randn(n, 3).astype(np.float32) * 2.0
        d = rng.randn(n, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        _compare(vol, o, d)

    def test_axis_parallel_rays(self):
        """dir components exactly 0 -> reciprocal inf paths."""
        vol = VoxelVolume(_sphere_grid(32), vpu=20.0)
        # axis-parallel but off voxel-boundary (exact-boundary rays are
        # FP-ambiguous between any two float pipelines)
        o = np.array([[0.11, 0.23, -3.0], [-3.0, 0.06, 0.13],
                      [0.08, 3.0, 0.21], [0.05, -3.0, 0.07]], np.float32)
        d = np.array([[0, 0, 1], [1, 0, 0], [0, -1, 0], [0, 1, 0]], np.float32)
        _compare(vol, o, d)


class TestStepCounts:
    def test_step_budget_respected(self):
        vol = VoxelVolume.noise_filled((64, 64, 64))
        o, d = _camera_rays((0, 0, -4), (0, 0, 0), 16, 16)
        res = _trace_jax(vol, np.asarray(o), np.asarray(d))
        assert (res["steps"] <= dda.MAX_STEPS).all()
