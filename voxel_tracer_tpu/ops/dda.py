"""Batched two-level (brickmap) Amanatides-Woo DDA traversal in JAX.

TPU-first re-design of the reference single-ray recursive traversal
(src/graphics/primitives/vv.cpp:127-369): instead of divergent per-ray
loops, ALL rays advance in lock-step through a masked state machine under a
single `lax.while_loop` — each iteration performs one brick-level or
fine-level DDA step per ray with `jnp.where` selects (no data-dependent
control flow, static shapes, XLA-fusable).  Per-ray state is a struct of
(N,)-shaped arrays ("wavefront" layout), which maps directly onto the VPU's
8x128 lanes.

Semantics match `voxel_tracer_tpu.ops.oracle` exactly (shared step budget
`MAX_STEPS = 256` across both levels, vv.cpp:7; entry-voxel hits keep the
slab entry normal, vv.cpp:159).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from voxel_tracer_tpu.ops.math3d import BIG_F32, sign_dir

MAX_STEPS = 256
BRICK = 8

# Ray state machine modes
_MISS = 0      # terminated without a hit
_BRICK = 1     # about to test the brick at bcell
_FINE = 2      # about to test the voxel at fcell inside bcell
_HIT = 3       # terminated with a hit


def slab_test(origin_l, dir_l, size):
    """Batched slab entry test vs the local AABB [0, size].

    Vectorized analog of OBB::intersect (obb.cpp:48-80): tmin clamped >= 0,
    hit iff tmax - 1e-4 >= tmin.  Returns (tmin, tmax, entry_axis, hitmask).
    """
    rcp = 1.0 / dir_l                                   # +-inf where dir == 0
    t1 = (0.0 - origin_l) * rcp
    t2 = (size - origin_l) * rcp
    tn = jnp.minimum(t1, t2)
    tf = jnp.maximum(t1, t2)
    # NaN guard: 0 * inf when the origin sits exactly on a slab plane.
    tn = jnp.where(jnp.isnan(tn), -BIG_F32, tn)
    tf = jnp.where(jnp.isnan(tf), BIG_F32, tf)
    tn = jnp.concatenate([jnp.zeros_like(tn[..., :1]), tn], axis=-1)  # clamp >= 0
    entry_axis = jnp.argmax(tn, axis=-1)                # 0 => clamped at origin
    tmin = jnp.max(tn, axis=-1)
    tmax = jnp.min(tf, axis=-1)
    hit = tmax - 1e-4 >= tmin
    entry_axis = jnp.maximum(entry_axis - 1, 0)         # fold origin-clamp into axis 0
    return tmin, tmax, entry_axis.astype(jnp.int32), hit


class DdaState(NamedTuple):
    mode: jnp.ndarray          # (N,) int32
    bcell: jnp.ndarray         # (N, 3) int32 brick cell
    btmax: jnp.ndarray         # (N, 3) f32 brick-level crossing t's (brick units)
    bt: jnp.ndarray            # (N,) f32 brick-level t (brick units)
    fcell: jnp.ndarray         # (N, 3) int32 fine cell in [0, 8)
    ftmax: jnp.ndarray         # (N, 3) f32 fine-level crossing t's (voxel units)
    ft: jnp.ndarray            # (N,) f32 fine t (voxel units)
    brick_entry_t: jnp.ndarray  # (N,) f32 world-units t of current brick entry
    axis: jnp.ndarray          # (N,) int32 axis of last DDA step
    steps: jnp.ndarray         # (N,) int32 shared step counter
    hit_t: jnp.ndarray         # (N,) f32
    hit_mat: jnp.ndarray       # (N,) int32
    hit_entry: jnp.ndarray     # (N,) bool — hit at entry voxel (steps == 0)


def _aw_step(cell, tmax3, step, delta, size3):
    """One Amanatides-Woo step; reproduces the reference comparison order
    (vv.cpp:176-202).  Returns (cell, tmax3, t, axis, oob)."""
    tx, ty, tz = tmax3[..., 0], tmax3[..., 1], tmax3[..., 2]
    # if (tx < ty) { if (tx < tz) x else z } else { if (ty < tz) y else z }
    use_x = (tx < ty) & (tx < tz)
    use_y = (~(tx < ty)) & (ty < tz)
    axis = jnp.where(use_x, 0, jnp.where(use_y, 1, 2)).astype(jnp.int32)
    onehot = jax.nn.one_hot(axis, 3, dtype=cell.dtype)
    cell = cell + onehot * step.astype(cell.dtype)
    t = jnp.take_along_axis(tmax3, axis[..., None], axis=-1)[..., 0]
    tmax3 = tmax3 + onehot.astype(tmax3.dtype) * delta
    moved = jnp.take_along_axis(cell, axis[..., None], axis=-1)[..., 0]
    lim = jnp.take_along_axis(
        jnp.broadcast_to(size3, cell.shape), axis[..., None], axis=-1
    )[..., 0]
    oob = (moved < 0) | (moved >= lim)
    return cell, tmax3, t, axis, oob


def _gather3(grid_zyx, cell_xyz, oid=None, fill=0):
    """grid[(o,) z, y, x] gather with out-of-range fill.

    grid_zyx: (Z, Y, X) or, with ``oid`` per-ray object indices, (O, Z, Y, X)
    — the multi-object stacked-grid form used by scene composition.
    """
    gz, gy, gx = grid_zyx.shape[-3:]
    x, y, z = cell_xyz[..., 0], cell_xyz[..., 1], cell_xyz[..., 2]
    inb = (x >= 0) & (x < gx) & (y >= 0) & (y < gy) & (z >= 0) & (z < gz)
    flat = (jnp.clip(z, 0, gz - 1) * (gy * gx)
            + jnp.clip(y, 0, gy - 1) * gx
            + jnp.clip(x, 0, gx - 1))
    if oid is not None:
        flat = flat + oid * (gz * gy * gx)
    vals = jnp.take(grid_zyx.reshape(-1), flat, mode="clip")
    return jnp.where(inb, vals, fill)


@functools.partial(jax.jit, static_argnames=("max_steps",))
def intersect_volume_local(grid, brick_occ, origin_l, dir_l, vpu,
                           oid=None, max_steps: int = MAX_STEPS):
    """Two-level DDA of N local-space rays through one voxel volume.

    Args:
      grid:      (Z, Y, X) int32 material ids, 0 = air — or (O, Z, Y, X)
                 stacked multi-object grids with per-ray indices ``oid``.
      brick_occ: (BZ, BY, BX) or (O, BZ, BY, BX) int32 per-brick solid count.
      origin_l:  (N, 3) f32 ray origins in volume-local space.
      dir_l:     (N, 3) f32 unit ray directions in local space.
      vpu:       voxels per world unit — scalar or per-ray (N,).
      oid:       optional (N,) int32 object index per ray.

    Returns dict of (N,) arrays: t (BIG_F32 = miss), mat, axis (last step
    axis), step_sign (N,3), steps, valid (slab hit mask).
    """
    n = origin_l.shape[0]
    gz, gy, gx = grid.shape[-3:]
    bz, by, bx = brick_occ.shape[-3:]
    vsize3 = jnp.array([gx, gy, gz], jnp.int32)
    bsize3 = jnp.array([bx, by, bz], jnp.int32)
    vpu = jnp.asarray(vpu, jnp.float32)
    vpu_c = vpu[..., None] if vpu.ndim == 1 else vpu  # broadcasts over (N, 3)
    size_l = vsize3.astype(jnp.float32) / vpu_c

    tmin, tmax, entry_axis, slab_hit = slab_test(origin_l, dir_l, size_l)

    bpu = vpu / BRICK
    bpu_c = vpu_c / BRICK
    rbpu = 1.0 / bpu
    stepf = sign_dir(dir_l)
    stepi = stepf.astype(jnp.int32)
    rdir = 1.0 / dir_l
    # clamp inf (axis-parallel rays) so tmax += onehot*delta never hits 0*inf
    delta = jnp.minimum(jnp.abs(rdir), BIG_F32)

    entry = (origin_l + dir_l * tmin[..., None]) * bpu_c
    bcell = jnp.clip(jnp.floor(entry).astype(jnp.int32), 0, bsize3 - 1)
    btmax = ((bcell.astype(jnp.float32) - entry) + jnp.maximum(stepf, 0.0)) * rdir
    btmax = jnp.where(jnp.isnan(btmax), BIG_F32, btmax)
    btmax = jnp.minimum(btmax, BIG_F32)

    zeros_f = jnp.zeros((n,), jnp.float32)
    zeros_i = jnp.zeros((n,), jnp.int32)
    state = DdaState(
        mode=jnp.where(slab_hit, _BRICK, _MISS).astype(jnp.int32),
        bcell=bcell,
        btmax=btmax,
        bt=zeros_f,
        fcell=jnp.zeros((n, 3), jnp.int32),
        ftmax=jnp.zeros((n, 3), jnp.float32),
        ft=zeros_f,
        brick_entry_t=zeros_f,
        axis=entry_axis,
        steps=zeros_i,
        hit_t=jnp.full((n,), BIG_F32, jnp.float32),
        hit_mat=zeros_i,
        hit_entry=jnp.zeros((n,), bool),
    )

    def active(s):
        return (s.mode == _BRICK) | (s.mode == _FINE)

    def cond(carry):
        s, it = carry
        return jnp.any(active(s) & (s.steps < max_steps)) & (it < 2 * max_steps)

    def body(carry):
        s, it = carry
        in_budget = s.steps < max_steps
        is_brick = (s.mode == _BRICK) & in_budget
        is_fine = (s.mode == _FINE) & in_budget
        # Budget exhausted -> miss (vv.cpp loop bound)
        mode = jnp.where(active(s) & ~in_budget, _MISS, s.mode)

        # ---- brick phase: test occupancy ----------------------------------
        occ = _gather3(brick_occ, s.bcell, oid) > 0
        enter_fine = is_brick & occ
        brick_step = is_brick & ~occ

        # fine setup for rays entering an occupied brick (vv.cpp:237-251)
        brick_entry_t = tmin + s.bt * rbpu
        rbpu_c = rbpu[..., None] if rbpu.ndim == 1 else rbpu
        bmin = s.bcell.astype(jnp.float32) * rbpu_c
        fentry = (origin_l + dir_l * brick_entry_t[..., None] - bmin) * vpu_c
        fcell_new = jnp.clip(jnp.floor(fentry).astype(jnp.int32), 0, BRICK - 1)
        ftmax_new = ((fcell_new.astype(jnp.float32) - fentry)
                     + jnp.maximum(stepf, 0.0)) * rdir
        ftmax_new = jnp.where(jnp.isnan(ftmax_new), BIG_F32, ftmax_new)
        ftmax_new = jnp.minimum(ftmax_new, BIG_F32)

        # ---- fine phase: test voxel ---------------------------------------
        vc = s.bcell * BRICK + s.fcell
        voxel = _gather3(grid, vc, oid)
        fine_hit = is_fine & (voxel != 0)

        # fine step for non-hit fine rays
        nfcell, nftmax, nft, nfaxis, f_oob = _aw_step(
            s.fcell, s.ftmax, stepi, delta,
            jnp.array([BRICK, BRICK, BRICK], jnp.int32))
        fine_step = is_fine & ~fine_hit
        fine_exit = fine_step & f_oob       # leave brick -> brick step (same iter)

        # brick step for: empty-brick rays and fine-exit rays (shared unit)
        do_bstep = brick_step | fine_exit
        nbcell, nbtmax, nbt, nbaxis, b_oob = _aw_step(
            s.bcell, s.btmax, stepi, delta, bsize3)

        # ---- merge ---------------------------------------------------------
        upd = lambda c, a, b: jnp.where(c, a, b)
        updv = lambda c, a, b: jnp.where(c[..., None], a, b)

        mode = upd(fine_hit, _HIT, mode)
        mode = upd(do_bstep & b_oob, _MISS, mode)
        mode = upd(enter_fine, _FINE, mode)
        mode = upd(fine_exit & ~b_oob, _BRICK, mode)

        bcell = updv(do_bstep, nbcell, s.bcell)
        btmax = updv(do_bstep, nbtmax, s.btmax)
        bt = upd(do_bstep, nbt, s.bt)

        fcell = updv(enter_fine, fcell_new, updv(fine_step & ~fine_exit, nfcell, s.fcell))
        ftmax = updv(enter_fine, ftmax_new, updv(fine_step & ~fine_exit, nftmax, s.ftmax))
        ft = upd(enter_fine, 0.0, upd(fine_step & ~fine_exit, nft, s.ft))

        b_entry = upd(enter_fine, brick_entry_t, s.brick_entry_t)

        axis = upd(do_bstep, nbaxis, upd(fine_step & ~fine_exit, nfaxis, s.axis))
        steps = s.steps + (do_bstep | (fine_step & ~fine_exit)).astype(jnp.int32)

        hit_t = upd(fine_hit, s.brick_entry_t + s.ft / vpu, s.hit_t)
        hit_mat = upd(fine_hit, voxel.astype(jnp.int32), s.hit_mat)
        hit_entry = upd(fine_hit, s.steps == 0, s.hit_entry)

        return (DdaState(mode.astype(jnp.int32), bcell, btmax, bt, fcell, ftmax,
                         ft, b_entry, axis, steps, hit_t, hit_mat, hit_entry),
                it + 1)

    state, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))

    hit = state.mode == _HIT
    # Entry-voxel hits keep the slab entry axis/normal (vv.cpp:159)
    final_axis = jnp.where(state.hit_entry, entry_axis, state.axis)
    return dict(
        t=jnp.where(hit, state.hit_t, BIG_F32),
        mat=jnp.where(hit, state.hit_mat, 0),
        axis=final_axis,
        step_sign=stepf,
        steps=state.steps,
        valid=slab_hit,
        slab_tmin=tmin,
        slab_tmax=tmax,
    )


def normal_from_axis(axis, step_sign, rot3):
    """World-space hit normal from the last DDA step axis (vv.cpp:161-163).

    The local normal is -sign * e_axis, so the world normal is just the
    (negated, sign-flipped) `axis` column of the rotation — selected exactly
    instead of via matmul (keeps full f32 precision on TPU, where f32
    matmuls default to bf16 passes).
    """
    sign_k = jnp.take_along_axis(step_sign, axis[..., None], axis=-1)[..., 0]
    if rot3.ndim == 2:
        cols = jnp.take(rot3.T, axis, axis=0)             # (N, 3)
    else:
        cols = jnp.take_along_axis(
            jnp.swapaxes(rot3, -1, -2), axis[..., None, None], axis=-2
        )[..., 0, :]
    n_w = -sign_k[..., None] * cols
    n_len = jnp.sqrt(jnp.sum(n_w * n_w, axis=-1, keepdims=True))
    return n_w / jnp.maximum(n_len, 1e-20)
