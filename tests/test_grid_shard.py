"""Brick-sharded grid mode: sharded trace == replicated trace.

Rays crossing slab boundaries must resolve identically through the
all_gather + nearest-hit reduction (parallel/grid_shard.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxel_tracer_tpu.models.camera import Camera, rays_for_image
from voxel_tracer_tpu.models.scene import Scene
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.ops import composite
from voxel_tracer_tpu.ops.math3d import BIG_F32
from voxel_tracer_tpu.parallel import grid_shard


def _scene_vol():
    rng = np.random.RandomState(5)
    z, y, x = np.meshgrid(*[np.arange(48)] * 3, indexing="ij")
    c = 23.5
    d = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    grid = np.where(d < 19, np.where(z > c, 20, 30), 0).astype(np.uint8)
    # punch holes so rays penetrate across slab boundaries
    grid[rng.rand(48, 48, 48) < 0.25] = 0
    pal = rng.rand(256, 3).astype(np.float32)
    return VoxelVolume(grid, pal, pos=(0.1, 0.0, -0.2), vpu=20.0)


def _rays(n_dev_pad=8):
    # rays along +z so they cross the z-slab boundaries
    cam = Camera.create((0.1, 0.2, -3.0), (0.1, 0.0, -0.2), 1.0)
    o, d = rays_for_image(cam, 32, 32)
    return o, d


@pytest.mark.parametrize("n_ray,n_grid", [(4, 2), (2, 4)])
def test_sharded_equals_replicated(n_ray, n_grid):
    vol = _scene_vol()
    o, d = _rays()

    scene = Scene(volumes=[vol]).data()
    ref = composite.intersect_scene(scene, o, d)

    mesh = grid_shard.make_ray_grid_mesh(n_ray, n_grid)
    slabs = grid_shard.split_volume_z(vol, n_grid)
    trace = grid_shard.make_grid_sharded_trace(mesh)
    got = trace(slabs, o, d)

    t_ref = np.asarray(ref.t)
    t_got = np.asarray(got.t)
    hit_ref = t_ref < BIG_F32
    hit_got = t_got < BIG_F32
    # FP boundary flips allowed within a tiny budget (as in DDA parity)
    mism = (hit_ref != hit_got).sum()
    # PINNED budget: observed 0 mismatches (2026-08 audit)
    assert mism <= 2, f"{mism} hit mismatches"
    both = hit_ref & hit_got
    np.testing.assert_allclose(t_got[both], t_ref[both], atol=2e-3,
                               rtol=1e-4)
    same_mat = (np.asarray(got.mat)[both] == np.asarray(ref.mat)[both])
    assert same_mat.mean() > 0.99
    nr = np.asarray(ref.normal)[both]
    ng = np.asarray(got.normal)[both]
    assert (np.abs(nr - ng).max(axis=1) < 1e-5).mean() > 0.99


def test_slab_split_covers_volume():
    vol = _scene_vol()
    slabs = grid_shard.split_volume_z(vol, 4)
    # stacked slabs contain exactly the original voxels
    per = slabs.grid.shape[1]
    rebuilt = np.concatenate([np.asarray(slabs.grid[j]) for j in range(4)],
                             axis=0)[: vol.grid.shape[0]]
    np.testing.assert_array_equal(rebuilt, vol.grid)
    assert per % 8 == 0
