"""Sharded-grid differentiable training: the model-parallel axis for
sigma/albedo fields too large to replicate per chip (SURVEY §2.4
brick-sharded mapping; a 512^3 float sigma + albedo is ~2 GB).

Design — the halo-free composition formulation (the differentiable twin
of `grid_shard.make_grid_sharded_trace`): emission/absorption integration
along a ray is an AFFINE composition over z-slabs, so each device
integrates ONLY its own slab independently (entering with T=1, C=0) and
one `all_gather` of the per-slab partials (T_j, C_j, D_j) over the GRID
axis composes the exact full-ray result in per-ray z order:

    T = prod_j T_j,   C = sum_j (prod_{k before j} T_k) * C_j

("before" in the ray's own z-direction — ascending slabs for dz >= 0,
descending otherwise; D composes like C because depth is accumulated as
sum w_i * t_i with t invariant under the slab's coordinate translation).
No sequential slab chain, no halo cells, no ray-state pipelining: the
collective moves (g, n_local) scalars, and XLA's transpose of the gather
(a psum_scatter over GRID) routes each slab's gradient back to its OWNER
— gradients are psum'd over the RAYS axis only, exactly the SURVEY §2.4
mapping ("grid brick-sharded, grads live on the owning shard").

Numerics match the replicated `make_train_step` up to product
re-association (the slab boundary is a voxel boundary, so the DDA visits
identical segments).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from voxel_tracer_tpu.ops import diff
from voxel_tracer_tpu.parallel.grid_shard import GRID
from voxel_tracer_tpu.parallel.mesh import RAYS


def compose_slabs(Tg, Cg, Dg, dz):
    """Compose per-slab integrals (g, n[, 3]) in each ray's z order."""
    g = Tg.shape[0]
    ones = jnp.ones_like(Tg[:1])
    cum = jnp.cumprod(Tg, axis=0)
    pref_asc = jnp.concatenate([ones, cum[:-1]], axis=0)
    cum_d = jnp.cumprod(Tg[::-1], axis=0)[::-1]
    pref_desc = jnp.concatenate([cum_d[1:], ones], axis=0)
    pref = jnp.where((dz >= 0.0)[None, :], pref_asc, pref_desc)
    color = jnp.sum(pref[..., None] * Cg, axis=0)
    depth = jnp.sum(pref * Dg, axis=0)
    trans = cum[-1]
    return color, trans, depth


def render_grid_sharded(params_slab, o_l, d_l, vpu, max_steps):
    """Per-device slab render + gather + compose (call INSIDE shard_map
    on a (RAYS, GRID) mesh).  params_slab holds this device's z-slab."""
    zs = params_slab["sigma"].shape[0]
    j = jax.lax.axis_index(GRID)
    z0 = j.astype(jnp.float32) * (zs / vpu)
    o_s = o_l - jnp.array([0.0, 0.0, 1.0], jnp.float32) * z0
    out = diff.render_density(params_slab["sigma"], params_slab["albedo"],
                              o_s, d_l, vpu, max_steps)
    Tg = jax.lax.all_gather(out["trans"], GRID)     # (g, n_local)
    Cg = jax.lax.all_gather(out["color"], GRID)     # (g, n_local, 3)
    Dg = jax.lax.all_gather(out["depth"], GRID)
    return compose_slabs(Tg, Cg, Dg, d_l[:, 2])


def make_grid_sharded_train_step(mesh: Mesh, optimizer, vpu: float,
                                 max_steps: int = 192, background=None):
    """Inverse-rendering train step with the GRID sharded over z-slabs.

    params = {"sigma": (Z,Y,X), "albedo": (Z,Y,X,3)} placed with
    PartitionSpec(GRID) on z (Z divisible by the mesh's grid-axis size);
    rays/targets sharded over RAYS.  Returns
    step(params, opt_state, o_l, d_l, target) -> (params, opt_state, loss).
    The optimizer update runs at the jit level: GSPMD keeps the Adam
    moments sharded like the params (each slab's optimizer state lives on
    its owner too — nothing about the grid is ever replicated).
    """
    import optax

    g = mesh.shape[GRID]
    bg = background if background is not None else jnp.zeros((3,),
                                                             jnp.float32)

    def local_loss(params_slab, o_l, d_l, target):
        color, trans, _ = render_grid_sharded(params_slab, o_l, d_l, vpu,
                                              max_steps)
        color = color + trans[:, None] * bg
        return jnp.mean((color - target) ** 2)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=({"sigma": P(GRID), "albedo": P(GRID)},
                  P(RAYS), P(RAYS), P(RAYS)),
        out_specs=(P(), {"sigma": P(GRID), "albedo": P(GRID)}),
        check_rep=False,
    )
    def loss_and_grads(params, o_l, d_l, target):
        loss, grads = jax.value_and_grad(local_loss)(params, o_l, d_l,
                                                     target)
        # every grid-axis device computes the identical composition, so
        # the gather's transpose (psum_scatter over GRID) delivers g
        # copies of each slab's cotangent — normalize back
        grads = jax.tree.map(lambda t: t / g, grads)
        # DP average over ray shards; NO collective over GRID — each
        # slab's gradient already lives on (only) its owner
        grads = jax.lax.pmean(grads, RAYS)
        loss = jax.lax.pmean(loss, RAYS)
        return loss, grads

    @jax.jit
    def step(params, opt_state, o_l, d_l, target):
        loss, grads = loss_and_grads(params, o_l, d_l, target)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def place_grid_params(mesh: Mesh, params):
    """Device-put sigma/albedo with z sharded over the GRID axis."""
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, P(GRID))
    return jax.tree.map(lambda x: jax.device_put(x, sh), params)
