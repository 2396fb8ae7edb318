"""Sharded-grid differentiable training (parallel/grid_train.py): the
slab composition must reproduce the replicated density render exactly
(up to product re-association), and the (rays, grid) train step must
match the replicated-grid train step while keeping every slab's params,
grads, and optimizer moments on its owning device only.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from voxel_tracer_tpu.ops import diff
from voxel_tracer_tpu.parallel.grid_shard import GRID, make_ray_grid_mesh
from voxel_tracer_tpu.parallel.grid_train import (
    make_grid_sharded_train_step, place_grid_params, render_grid_sharded)
from voxel_tracer_tpu.parallel.mesh import RAYS, make_ray_mesh
from voxel_tracer_tpu.parallel.sharding import make_train_step

import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map


def _problem(g=64, n_rays=512, seed=0):
    rng = np.random.RandomState(seed)
    zz, yy, xx = np.meshgrid(*[np.linspace(0, 1, g)] * 3, indexing="ij")
    r2 = (xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2
    sigma = (30.0 * np.exp(-r2 * 25.0)).astype(np.float32)
    albedo = np.stack([xx, yy, 1.0 - xx], axis=-1).astype(np.float32)
    # rays from a ring, many crossing multiple z-slabs
    th = rng.rand(n_rays) * 2 * np.pi
    o = np.stack([0.5 + 1.5 * np.cos(th), rng.rand(n_rays) * 0.8 + 0.1,
                  0.5 + 1.5 * np.sin(th)], axis=1).astype(np.float32)
    d = np.array([0.5, 0.5, 0.5], np.float32) - o
    d += rng.randn(n_rays, 3).astype(np.float32) * 0.15
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(sigma), jnp.asarray(albedo), jnp.asarray(o), \
        jnp.asarray(d)


def test_slab_composition_matches_replicated():
    sigma, albedo, o, d, = _problem()
    vpu, max_steps = 64.0, 256
    ref = diff.render_density(sigma, albedo, o, d, vpu, max_steps)

    mesh = make_ray_grid_mesh(2, 4)
    fn = shard_map(
        lambda p, o_, d_: render_grid_sharded(p, o_, d_, vpu, max_steps),
        mesh=mesh,
        in_specs=({"sigma": P(GRID), "albedo": P(GRID)}, P(RAYS), P(RAYS)),
        out_specs=(P(RAYS), P(RAYS), P(RAYS)), check_rep=False)
    params = place_grid_params(mesh, {"sigma": sigma, "albedo": albedo})
    ray_sh = NamedSharding(mesh, P(RAYS))
    color, trans, depth = jax.jit(fn)(
        params, jax.device_put(o, ray_sh), jax.device_put(d, ray_sh))

    np.testing.assert_allclose(np.asarray(trans), np.asarray(ref["trans"]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref["color"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref["depth"]),
                               rtol=2e-4, atol=2e-3)


def test_grid_sharded_train_matches_replicated():
    sigma_t, albedo_t, o, d = _problem()
    vpu, max_steps = 64.0, 256
    target = diff.render_density(sigma_t, albedo_t, o, d, vpu,
                                 max_steps)["color"]
    g3 = sigma_t.shape[0]
    init = {"sigma": jnp.full((g3,) * 3, 3.0),
            "albedo": jnp.full((g3,) * 3 + (3,), 0.5)}

    # replicated baseline on a pure ray mesh
    mesh_r = make_ray_mesh(8)
    opt = optax.adam(5e-2)
    step_r = make_train_step(mesh_r, opt, vpu, max_steps=max_steps)
    pr = jax.device_put(init, NamedSharding(mesh_r, P()))
    sr = jax.device_put(opt.init(init), NamedSharding(mesh_r, P()))
    o_r = jax.device_put(o, NamedSharding(mesh_r, P(RAYS)))
    d_r = jax.device_put(d, NamedSharding(mesh_r, P(RAYS)))
    t_r = jax.device_put(target, NamedSharding(mesh_r, P(RAYS)))
    losses_r = []
    for _ in range(3):
        pr, sr, l = step_r(pr, sr, o_r, d_r, t_r)
        losses_r.append(float(l))

    # grid-sharded on a (2 rays x 4 grid) mesh
    mesh_g = make_ray_grid_mesh(2, 4)
    step_g = make_grid_sharded_train_step(mesh_g, opt, vpu,
                                          max_steps=max_steps)
    pg = place_grid_params(mesh_g, init)
    sg = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(
            mesh_g, P(GRID) if getattr(x, "ndim", 0) >= 3 else P())),
        opt.init(init))
    ray_sh = NamedSharding(mesh_g, P(RAYS))
    o_g, d_g = jax.device_put(o, ray_sh), jax.device_put(d, ray_sh)
    t_g = jax.device_put(target, ray_sh)
    losses_g = []
    for _ in range(3):
        pg, sg, l = step_g(pg, sg, o_g, d_g, t_g)
        losses_g.append(float(l))

    np.testing.assert_allclose(losses_g, losses_r, rtol=2e-4)
    # every slab's params stay sharded over GRID after updates
    shard_shapes = {sh.index for sh in pg["sigma"].addressable_shards}
    assert len(shard_shapes) >= 4, "sigma not sharded over GRID"


def test_overlap_slabs_train_matches_plain():
    """make_train_step(overlap_slabs=4) — per-slab grad pmean inside the
    backward — must train identically to the single end-of-step pmean."""
    sigma_t, albedo_t, o, d = _problem()
    vpu, max_steps = 64.0, 256
    target = diff.render_density(sigma_t, albedo_t, o, d, vpu,
                                 max_steps)["color"]
    g3 = sigma_t.shape[0]
    init = {"sigma": jnp.full((g3,) * 3, 3.0),
            "albedo": jnp.full((g3,) * 3 + (3,), 0.5)}
    mesh = make_ray_mesh(8)
    opt = optax.adam(5e-2)
    ray_sh = NamedSharding(mesh, P(RAYS))
    rep = NamedSharding(mesh, P())
    o_s, d_s, t_s = (jax.device_put(x, ray_sh) for x in (o, d, target))

    losses = {}
    for slabs in (1, 4):
        step = make_train_step(mesh, opt, vpu, max_steps=max_steps,
                               overlap_slabs=slabs)
        p = jax.device_put(init, rep)
        st = jax.device_put(opt.init(init), rep)
        ls = []
        for _ in range(3):
            p, st, l = step(p, st, o_s, d_s, t_s)
            ls.append(float(l))
        losses[slabs] = ls
    np.testing.assert_allclose(losses[4], losses[1], rtol=2e-4)


def test_oversized_grid_fits_sharded():
    """Fit a grid whose parameter bytes exceed a stated per-device budget
    of 8 MB: 96^3 sigma+albedo is 14.2 MB replicated, 3.5 MB per device
    on a 4-way grid axis — only the sharded placement fits."""
    budget = 8 * 2**20
    g3 = 96
    n_rays = 256
    sigma_t, albedo_t, o, d = _problem(g=g3, n_rays=n_rays, seed=1)
    vpu, max_steps = float(g3), 256
    target = diff.render_density(sigma_t, albedo_t, o, d, vpu,
                                 max_steps)["color"]
    total_bytes = sigma_t.size * 4 + sigma_t.size * 3 * 4
    assert total_bytes > budget, "test must exceed the stated budget"

    mesh = make_ray_grid_mesh(2, 4)
    per_dev = total_bytes // mesh.shape[GRID]
    assert per_dev < budget

    opt = optax.adam(5e-2)
    step = make_grid_sharded_train_step(mesh, opt, vpu, max_steps=max_steps)
    init = {"sigma": jnp.full((g3,) * 3, 3.0),
            "albedo": jnp.full((g3,) * 3 + (3,), 0.5)}
    params = place_grid_params(mesh, init)
    state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(
            mesh, P(GRID) if getattr(x, "ndim", 0) >= 3 else P())),
        opt.init(init))
    ray_sh = NamedSharding(mesh, P(RAYS))
    o, d, target = (jax.device_put(x, ray_sh) for x in (o, d, target))
    losses = []
    for _ in range(4):
        params, state, l = step(params, state, o, d, target)
        losses.append(float(jax.block_until_ready(l)))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9, losses
