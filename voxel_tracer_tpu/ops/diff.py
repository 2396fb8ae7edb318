"""Differentiable voxel rendering: exact-DDA emission/absorption integration
with a replay-based custom VJP.

This is the capability the reference lacks entirely (SURVEY.md: the new
framework makes the grid differentiable).  Per-voxel parameters are a
continuous density field sigma (Z, Y, X) and an albedo field (Z, Y, X, 3).
A ray accumulates, over its Amanatides-Woo visit sequence, the standard
emission-absorption model with *exact* per-voxel segment lengths dl_i
(no point sampling — the DDA gives the exact overlap of the ray with each
voxel):

    alpha_i = 1 - exp(-sigma_i * dl_i)
    w_i     = T_i * alpha_i,   T_{i+1} = T_i * (1 - alpha_i)
    C       = sum_i w_i * albedo_i  (+ T_final * background)

The backward pass does NOT store the traversal tape: it **replays** the
march (same DDA sequence bit-for-bit — same entry setup and step rule as the
forward pass) and reconstructs the needed suffix sums from the saved final
radiance, scatter-adding gradients into the parameter grids.  This is the
rematerialization strategy mandated by BASELINE.json (remat tape for 2M rays
x steps does not fit HBM; SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from voxel_tracer_tpu.ops.dda import slab_test
from voxel_tracer_tpu.ops.math3d import BIG_F32, sign_dir


class _March(NamedTuple):
    cell: jnp.ndarray    # (N, 3) int32
    tmax3: jnp.ndarray   # (N, 3) f32
    t: jnp.ndarray       # (N,) f32 — current segment start (world units)
    alive: jnp.ndarray   # (N,) bool


def _march_setup(origin_l, dir_l, vpu, size3_i):
    """Shared DDA setup: identical in forward and backward replay."""
    size_l = size3_i.astype(jnp.float32) / vpu
    tmin, tmax, _, ok = slab_test(origin_l, dir_l, size_l)
    stepf = sign_dir(dir_l)
    rdir = 1.0 / dir_l
    # clamp inf (axis-parallel rays) to BIG so 0 * delta stays 0, not NaN
    delta = jnp.minimum(jnp.abs(rdir), BIG_F32)
    entry = (origin_l + dir_l * tmin[..., None]) * vpu
    cell = jnp.clip(jnp.floor(entry).astype(jnp.int32), 0, size3_i - 1)
    tmax3 = ((cell.astype(jnp.float32) - entry)
             + jnp.maximum(stepf, 0.0)) * rdir / vpu + tmin[..., None]
    tmax3 = jnp.where(jnp.isnan(tmax3), BIG_F32, tmax3)
    tmax3 = jnp.minimum(tmax3, BIG_F32)
    st = _March(cell=cell, tmax3=tmax3, t=jnp.where(ok, tmin, BIG_F32),
                alive=ok)
    return st, stepf.astype(jnp.int32), delta / vpu, tmin, tmax


def _step(st: _March, stepi, delta, size3_i, t_exit):
    """One DDA step; returns (new_state, seg_cell, seg_len, seg_valid)."""
    t_next = jnp.min(st.tmax3, axis=-1)
    t_next = jnp.minimum(t_next, t_exit)
    seg_len = jnp.maximum(t_next - st.t, 0.0)
    seg_valid = st.alive & (seg_len > 0.0)
    seg_cell = st.cell

    axis = jnp.argmin(st.tmax3, axis=-1)
    onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
    cell = st.cell + onehot * stepi
    tmax3 = st.tmax3 + onehot.astype(jnp.float32) * delta
    oob = ((cell < 0) | (cell >= size3_i)).any(axis=-1)
    alive = st.alive & ~oob & (t_next < t_exit)
    return _March(cell, tmax3, t_next, alive), seg_cell, seg_len, seg_valid


def _flat_idx(cell, size3_i):
    gx, gy, gz = size3_i[0], size3_i[1], size3_i[2]
    return (jnp.clip(cell[..., 2], 0, gz - 1) * (gy * gx)
            + jnp.clip(cell[..., 1], 0, gy - 1) * gx
            + jnp.clip(cell[..., 0], 0, gx - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def render_density(sigma, albedo, origin_l, dir_l, vpu, max_steps: int = 192):
    """Volume-render N local-space rays through a density/albedo grid.

    Args:
      sigma:  (Z, Y, X) f32 density (>= 0).
      albedo: (Z, Y, X, 3) f32 per-voxel color.
      origin_l, dir_l: (N, 3) f32 local-space rays (unit dir).
      vpu: voxels per unit (scalar, static-ish).
    Returns:
      dict: color (N, 3) pre-multiplied radiance, trans (N,) final
      transmittance (for background compositing), depth (N,) expected depth.
    """
    color, trans, depth = _render_fwd_only(sigma, albedo, origin_l, dir_l,
                                           vpu, max_steps)
    return {"color": color, "trans": trans, "depth": depth}


def _render_fwd_only(sigma, albedo, origin_l, dir_l, vpu, max_steps):
    gz, gy, gx = sigma.shape
    size3_i = jnp.array([gx, gy, gz], jnp.int32)
    st, stepi, delta, tmin, t_exit = _march_setup(origin_l, dir_l, vpu, size3_i)
    n = origin_l.shape[0]
    sig_flat = sigma.reshape(-1)
    alb_flat = albedo.reshape(-1, 3)

    def body(carry, _):
        st, T, C, D = carry
        st2, cell, dl, valid = _step(st, stepi, delta, size3_i, t_exit)
        idx = _flat_idx(cell, size3_i)
        sg = jnp.take(sig_flat, idx, mode="clip")
        al = jnp.take(alb_flat, idx, axis=0, mode="clip")
        alpha = 1.0 - jnp.exp(-jnp.maximum(sg, 0.0) * dl)
        w = jnp.where(valid, T * alpha, 0.0)
        C = C + w[:, None] * al
        D = D + w * (st.t + 0.5 * dl)
        T = jnp.where(valid, T * (1.0 - alpha), T)
        return (st2, T, C, D), None

    init = (st, jnp.ones((n,), jnp.float32), jnp.zeros((n, 3), jnp.float32),
            jnp.zeros((n,), jnp.float32))
    (st, T, C, D), _ = jax.lax.scan(body, init, None, length=max_steps)
    return C, T, D


def _render_fwd(sigma, albedo, origin_l, dir_l, vpu, max_steps):
    # custom_vjp fwd receives the same signature as the primal
    color, trans, depth = _render_fwd_only(sigma, albedo, origin_l, dir_l,
                                           vpu, max_steps)
    out = {"color": color, "trans": trans, "depth": depth}
    res = (sigma, albedo, origin_l, dir_l, vpu, color, trans, depth)
    return out, res


def _render_bwd(max_steps, res, g):
    """Replay the march; reconstruct suffix sums from the saved outputs.

    For C = sum w_i a_i with w_i = T_i alpha_i:
      dC/da_i     = w_i
      dC/dsigma_i = dl_i * [ T_i e^{-sigma_i dl_i} a_i - S_i ]
    where S_i = sum_{j>i} w_j a_j is the suffix radiance, obtained during
    replay as S_i = C_total - C_prefix_including_i.
    Depth gradient handled analogously with suffix depth.
    """
    sigma, albedo, origin_l, dir_l, vpu, C_total, T_final, D_total = res
    gC, gT, gD = g["color"], g["trans"], g["depth"]

    gz, gy, gx = sigma.shape
    size3_i = jnp.array([gx, gy, gz], jnp.int32)
    st, stepi, delta, tmin, t_exit = _march_setup(origin_l, dir_l, vpu, size3_i)
    n = origin_l.shape[0]
    sig_flat = sigma.reshape(-1)
    alb_flat = albedo.reshape(-1, 3)

    d_sigma = jnp.zeros_like(sig_flat)
    d_albedo = jnp.zeros_like(alb_flat)

    def body(carry, _):
        st, T, Cpre, Dpre, d_sigma, d_albedo = carry
        st2, cell, dl, valid = _step(st, stepi, delta, size3_i, t_exit)
        idx = _flat_idx(cell, size3_i)
        sg = jnp.take(sig_flat, idx, mode="clip")
        al = jnp.take(alb_flat, idx, axis=0, mode="clip")
        e = jnp.exp(-jnp.maximum(sg, 0.0) * dl)
        alpha = 1.0 - e
        w = jnp.where(valid, T * alpha, 0.0)
        seg_d = st.t + 0.5 * dl

        Cpre2 = Cpre + w[:, None] * al
        Dpre2 = Dpre + w * seg_d
        suffixC = C_total - Cpre2          # sum_{j>i} w_j a_j
        suffixD = D_total - Dpre2

        # d/d sigma_i of outputs, dotted with cotangents:
        #   color: dl * (T_i e_i a_i - suffixC)
        #   trans: -dl * T_final   (T_final scales multiplicatively)
        #   depth: dl * (T_i e_i seg_d - suffixD)
        relu = (sg > 0.0).astype(jnp.float32)   # sigma clamped at 0 in fwd
        gsig = (
            jnp.sum(gC * (T * e)[:, None] * al - gC * suffixC, axis=-1)
            + gD * ((T * e) * seg_d - suffixD)
            - gT * T_final
        ) * dl * relu
        gsig = jnp.where(valid, gsig, 0.0)
        galb = jnp.where(valid[:, None], gC * w[:, None], 0.0)

        d_sigma = d_sigma.at[idx].add(gsig, mode="drop")
        d_albedo = d_albedo.at[idx].add(galb, mode="drop")
        T2 = jnp.where(valid, T * (1.0 - alpha), T)
        return (st2, T2, Cpre2, Dpre2, d_sigma, d_albedo), None

    init = (st, jnp.ones((n,), jnp.float32), jnp.zeros((n, 3), jnp.float32),
            jnp.zeros((n,), jnp.float32), d_sigma, d_albedo)
    (st, T, Cp, Dp, d_sigma, d_albedo), _ = jax.lax.scan(
        body, init, None, length=max_steps)

    return (d_sigma.reshape(sigma.shape), d_albedo.reshape(albedo.shape),
            None, None, None)


render_density.defvjp(_render_fwd, _render_bwd)
