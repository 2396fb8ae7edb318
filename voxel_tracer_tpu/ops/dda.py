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

Glass infrastructure (the reference Ray's `medium_id` / `ignore_medium`
state, ray.h:40-41, and shadow-ray stochastic absorption, vv.cpp:314-327):

- ``medium``: per-ray material id the ray currently travels inside.  While
  set, the march is an *interior exit* march (vv.cpp:297-310): the first
  voxel whose id differs from the medium is the exit hit (material may be 0
  = air), an empty brick exits at its entry plane (vv.cpp:166-175), and
  leaving the grid exits at the OBB exit distance — the `exit_t` analog of
  obb.cpp:82-106, which here is simply the slab tmax (vv.cpp:206-225).
  Interior rays therefore never miss.
- ``ignore``: material id to pass through until the ray has seen at least
  one air voxel ("scan rays" leaving a glass medium, vv.cpp:328-335).
  Deviation: the reference's `exited` flag is local to one brick traversal
  (reset at every brick), which re-ignores the medium after any brick
  crossing; here it persists for the whole volume traversal (the evident
  intent).  The no-op sentinel is 0 (air), not the reference's 0xFF, which
  collides with the laser material id.
- ``shadow_seed`` (+ static ``shadow=True``): shadow-ray semantics —
  material ids > 16 always occlude, ids <= 16 (glass/mirror rows) occlude
  stochastically with probability 0.15 per encountered voxel
  (vv.cpp:314-327).  The RandomFloat() call is replaced by a counting hash
  of (per-ray seed, voxel cell) so the result is deterministic and
  reproducible across shardings; the oracle implements the same hash.
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


def hash_shadow(seed, cell_xyz):
    """Counting hash -> uniform [0,1) per (ray seed, voxel cell).

    Deterministic stand-in for the reference's global-xorshift RandomFloat()
    in the shadow-ray stochastic absorption (vv.cpp:322, tmpl8math.cpp:40-58).
    lowbias32-style avalanche over the seed xor a spatial key.
    """
    seed = seed.astype(jnp.uint32)
    x = cell_xyz[..., 0].astype(jnp.uint32)
    y = cell_xyz[..., 1].astype(jnp.uint32)
    z = cell_xyz[..., 2].astype(jnp.uint32)
    h = seed ^ (x * jnp.uint32(0x9E3779B1)) ^ (y * jnp.uint32(0x85EBCA77)) \
        ^ (z * jnp.uint32(0xC2B2AE3D))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)


def _ladder_axis(tmax3):
    """Axis the next A&W step would take — the reference tmax comparison
    ladder (vv.cpp:208-219), used for the medium grid-exit normal."""
    tx, ty, tz = tmax3[..., 0], tmax3[..., 1], tmax3[..., 2]
    use_x = (tx < ty) & (tx < tz)
    use_y = (~(tx < ty)) & (ty < tz)
    return jnp.where(use_x, 0, jnp.where(use_y, 1, 2)).astype(jnp.int32)


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
    exited: jnp.ndarray        # (N,) bool — scan ray has seen an air voxel


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


@functools.partial(jax.jit, static_argnames=("max_steps", "shadow"))
def intersect_volume_local(grid, brick_occ, origin_l, dir_l, vpu,
                           oid=None, max_steps: int = MAX_STEPS,
                           medium=None, ignore=None, shadow_seed=None,
                           shadow: bool = False):
    """Two-level DDA of N local-space rays through one voxel volume.

    Args:
      grid:      (Z, Y, X) int32 material ids, 0 = air — or (O, Z, Y, X)
                 stacked multi-object grids with per-ray indices ``oid``.
      brick_occ: (BZ, BY, BX) or (O, BZ, BY, BX) int32 per-brick solid count.
      origin_l:  (N, 3) f32 ray origins in volume-local space.
      dir_l:     (N, 3) f32 unit ray directions in local space.
      vpu:       voxels per world unit — scalar or per-ray (N,).
      oid:       optional (N,) int32 object index per ray.
      medium:    optional (N,) int32 medium id; nonzero = interior exit march
                 (Ray::medium_id, vv.cpp:166-175,206-232,297-310).
      ignore:    optional (N,) int32 material to pass until air is seen
                 (Ray::ignore_medium scan semantics, vv.cpp:328-335; 0 = off).
      shadow_seed: (N,) uint32 per-ray seeds; with ``shadow=True`` enables
                 the stochastic <=16 pass-through (vv.cpp:314-327).

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
    medium_on = None if medium is None else (medium > 0)
    mode0 = jnp.where(slab_hit, _BRICK, _MISS).astype(jnp.int32)
    hit_t0 = jnp.full((n,), BIG_F32, jnp.float32)
    if medium is not None:
        # Slab miss while inside a medium: exit immediately at t = 0 with
        # material air (vv.cpp:228-232).
        miss_med = ~slab_hit & medium_on
        mode0 = jnp.where(miss_med, _HIT, mode0)
        hit_t0 = jnp.where(miss_med, 0.0, hit_t0)
    state = DdaState(
        mode=mode0,
        bcell=bcell,
        btmax=btmax,
        bt=zeros_f,
        fcell=jnp.zeros((n, 3), jnp.int32),
        ftmax=jnp.zeros((n, 3), jnp.float32),
        ft=zeros_f,
        brick_entry_t=zeros_f,
        axis=entry_axis,
        steps=zeros_i,
        hit_t=hit_t0,
        hit_mat=zeros_i,
        hit_entry=jnp.zeros((n,), bool),
        exited=jnp.zeros((n,), bool),
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
        # Budget exhausted -> miss (vv.cpp loop bound); interior rays exit
        # at the OBB exit distance instead (vv.cpp:206-225: the post-loop
        # medium branch fires on exhaustion too, axis from the brick tmax).
        exhausted = active(s) & ~in_budget
        mode = jnp.where(exhausted, _MISS, s.mode)
        hit_t = s.hit_t
        hit_mat = s.hit_mat
        hit_entry = s.hit_entry
        if medium is not None:
            exh_med = exhausted & medium_on
            mode = jnp.where(exh_med, _HIT, mode)
            hit_t = jnp.where(exh_med, tmax, hit_t)
            hit_mat = jnp.where(exh_med, 0, hit_mat)

        # ---- brick phase: test occupancy ----------------------------------
        occ = _gather3(brick_occ, s.bcell, oid) > 0
        enter_fine = is_brick & occ
        brick_step = is_brick & ~occ
        med_brick_exit = None
        if medium is not None:
            # Empty brick while inside a medium: exit at the brick entry
            # plane (vv.cpp:166-175).
            med_brick_exit = brick_step & medium_on
            brick_step = brick_step & ~medium_on

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
        solid = voxel != 0
        if shadow:
            # Shadow semantics: ids > 16 occlude; glass/mirror rows occlude
            # stochastically with p = 0.15 per voxel (vv.cpp:314-327).
            rnd = hash_shadow(shadow_seed, vc)
            hit_vox = solid & ((voxel > 16) | (rnd > 0.85))
        elif ignore is not None:
            # Scan-ray pass-through until air is seen (vv.cpp:328-335).
            hit_vox = solid & (s.exited | (voxel != ignore))
        else:
            hit_vox = solid
        if medium is not None:
            # Interior exit: first voxel that differs from the medium,
            # material may be air (vv.cpp:297-310).
            hit_vox = jnp.where(medium_on, voxel != medium, hit_vox)
        fine_hit = is_fine & hit_vox

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
        if medium is not None:
            # Interior grid exit: exit at the OBB exit distance = slab tmax
            # (vv.cpp:206-225, the exit_t analog of obb.cpp:82-106).  The
            # normal axis is the attempted step axis (tmax ladder) — nbaxis,
            # already merged below via do_bstep.
            med_grid_exit = do_bstep & b_oob & medium_on
            mode = upd(med_brick_exit | med_grid_exit, _HIT, mode)

        bcell = updv(do_bstep, nbcell, s.bcell)
        btmax = updv(do_bstep, nbtmax, s.btmax)
        bt = upd(do_bstep, nbt, s.bt)

        fcell = updv(enter_fine, fcell_new, updv(fine_step & ~fine_exit, nfcell, s.fcell))
        ftmax = updv(enter_fine, ftmax_new, updv(fine_step & ~fine_exit, nftmax, s.ftmax))
        ft = upd(enter_fine, 0.0, upd(fine_step & ~fine_exit, nft, s.ft))

        b_entry = upd(enter_fine, brick_entry_t, s.brick_entry_t)

        axis = upd(do_bstep, nbaxis, upd(fine_step & ~fine_exit, nfaxis, s.axis))
        steps = s.steps + (do_bstep | (fine_step & ~fine_exit)).astype(jnp.int32)

        hit_t = upd(fine_hit, s.brick_entry_t + s.ft / vpu, hit_t)
        hit_mat = upd(fine_hit, voxel.astype(jnp.int32), hit_mat)
        hit_entry = upd(fine_hit, s.steps == 0, hit_entry)

        exited = s.exited
        if ignore is not None:
            saw_air = (is_fine & ~solid) | brick_step
            exited = exited | (saw_air & (ignore > 0))
        if medium is not None:
            hit_t = upd(med_brick_exit, brick_entry_t, hit_t)
            hit_t = upd(med_grid_exit, tmax, hit_t)
            hit_mat = upd(med_brick_exit | med_grid_exit, 0, hit_mat)
            hit_entry = upd(med_brick_exit, s.steps == 0, hit_entry)
            axis = upd(exh_med, _ladder_axis(s.btmax), axis)

        return (DdaState(mode.astype(jnp.int32), bcell, btmax, bt, fcell, ftmax,
                         ft, b_entry, axis, steps, hit_t, hit_mat, hit_entry,
                         exited),
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
