"""Independent two-level DDA kernel (ops/pallas/indep.py) parity tests.

The slice-walk megakernel (test_mega.py) is already validated against the
scalar CPU oracle; here the indep kernel is checked against it in
interpret mode — identical hit masks, materials, RGB8 images, and depth
within float tolerance — plus ray-list coverage for directions the
slice-walk kernel leaves unresolved.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from voxel_tracer_tpu.models.camera import Camera
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.ops import oracle
from voxel_tracer_tpu.ops.pallas import indep, mega


def _two_mat_sphere(n=16, r=0.42):
    z, y, x = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    c = (n - 1) / 2
    d = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    grid = np.where(d < r * n, np.where(y > c, 140, 23), 0)
    return grid.astype(np.uint8)


@pytest.fixture(scope="module")
def vol():
    palette = np.random.RandomState(3).rand(256, 3).astype(np.float32)
    return VoxelVolume(_two_mat_sphere(), palette=palette,
                       pos=(0.1, -0.05, 0.2), vpu=20.0)


@pytest.fixture(scope="module")
def mv(vol):
    return mega.MegaVolume(vol)


def _both(mv, cam, w, h, **kw):
    a = mega.render_mega(mv, cam, w, h, interpret=True, **kw)
    b = indep.render_indep(mv, cam, w, h, interpret=True, **kw)
    return ({k: np.asarray(v) for k, v in a.items()},
            {k: np.asarray(v) for k, v in b.items()})


def test_indep_matches_mega_flat(mv, vol):
    w, h = 64, 32
    cam = Camera.create((1.2, 0.9, -1.4), vol.pos, w / h)
    a, b = _both(mv, cam, w, h)
    assert b["resolved"].all()            # indep has no direction residue
    both = a["resolved"].astype(bool)
    ha, hb = a["depth"] < 1e30, b["depth"] < 1e30
    assert (ha[both] == hb[both]).all()
    hit = both & ha
    assert np.abs(a["depth"][hit] - b["depth"][hit]).max() < 1e-5
    assert (a["mat"][hit] == b["mat"][hit]).all()
    assert (a["image"][both] == b["image"][both]).all()


def test_indep_lambert_and_axis_hugging_rays(mv, vol):
    # camera nearly axis-aligned: the slice-walk kernel leaves the
    # fighting rays unresolved, indep must resolve every pixel
    w, h = 32, 32
    cam = Camera.create((1.4, 0.02, 0.21), vol.pos, 1.0)
    out = indep.render_indep(mv, cam, w, h, shading="lambert",
                             interpret=True)
    out = {k: np.asarray(v) for k, v in out.items()}
    assert out["resolved"].all()
    assert (out["depth"] < 1e30).any()


def test_indep_inside_volume_origin(mv, vol):
    # camera inside the sphere's bounding volume (tmin = 0 path)
    out = indep.render_indep(mv, Camera.create(
        np.asarray(vol.pos) + np.array([0.0, 0.0, -0.36], np.float32),
        vol.pos, 1.0), 32, 32, interpret=True)
    assert np.asarray(out["resolved"]).all()
    assert (np.asarray(out["depth"]) < 1e30).any()


def test_trace_rays_indep_matches_oracle(vol, mv, rng):
    tb = mv.tables
    occb = indep.occb_of(tb)
    n = 1024
    # random origins on a shell, dirs toward jittered center
    o = rng.randn(n, 3).astype(np.float32)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 1.5
    d = -o + rng.randn(n, 3).astype(np.float32) * 0.1
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    from voxel_tracer_tpu.ops.composite import _to_local
    rot = jnp.asarray(vol.rot, jnp.float32)
    o_l, d_l = _to_local(rot, jnp.asarray(vol.pos, jnp.float32),
                         jnp.asarray(vol.pivot, jnp.float32),
                         jnp.asarray(o + np.asarray(vol.pos)), jnp.asarray(d))
    res = indep.trace_rays_indep(
        np.asarray(o_l), np.asarray(d_l), occb, tb.occw, tb.matw,
        bsize=tb.bsize, vpu=tb.vpu, interpret=True)
    t = np.asarray(res["t"])
    resolved = np.asarray(res["resolved"])
    assert resolved.all()

    ov = oracle.OracleVolume(grid=vol.grid, vpu=vol.vpu, pos=vol.pos)
    for i in range(0, n, 17):
        hh = oracle.intersect_volume(ov, o[i] + np.asarray(vol.pos), d[i])
        assert hh.no_hit == (t[i] >= 1e30), f"ray {i} hit mismatch"
        if not hh.no_hit:
            assert abs(hh.depth - t[i]) < 1e-4, f"ray {i} depth mismatch"
