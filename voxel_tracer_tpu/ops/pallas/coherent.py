"""Coherent brick-slice traversal kernel — the hot primary/shadow-ray path.

This is the reference's packet traversal (vv.cpp:449-870: slice marching
along the major axis with per-slice rect bounds) re-designed for the TPU
lane model.  Per-ray random gathers are lane-hostile (Mosaic gathers are
8-tall sublane shuffles at best), so the kernel NEVER gathers per ray:

- a TILE of 1024 rays (8 sublanes x 128 lanes) marches brick-slices along
  its shared major axis, front to back;
- per slice, the tile's (u, v) footprint rect is reduced to SCALARS and a
  scalar loop walks candidate bricks, testing occupancy with scalar SMEM
  reads (the Brick512::voxcnt analog, vv.h:23-38);
- an occupied brick's 16 bit-packed words (8^3 voxels = 512 bits) are read
  as scalars and BROADCAST to all lanes; every ray then runs a masked fine
  DDA against registers only (select-tree over 16 broadcast words +
  per-lane variable shift, ~2-4 cycles/op);
- all per-ray state lives in registers/VMEM for the whole march — zero HBM
  state traffic (the XLA wavefront path pays ~200 MB of HBM state per
  lock-step iteration; that is why it runs at ~0.1 Mrays/s on sparse
  scenes).

Rays whose direction fights the tile's major axis (opposite sign or
near-perpendicular) are reported unresolved; the caller re-traces that
residue (typically <1%) with the XLA state machine.  Semantics match
ops/oracle.py: same slab entry, same A&W stepping inside bricks, same
entry-face normals.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3e37  # python float: a jnp scalar here would be a captured constant
BRICK = 8
TILE_ROWS = 8
TILE_LANES = 128
TILE = TILE_ROWS * TILE_LANES


class PackedVolume(NamedTuple):
    """Bit-packed device representation for the kernel (built on host)."""

    occ: jnp.ndarray          # (1, NB) int32: 1 if brick has any voxel
    words: jnp.ndarray        # (16, NB) int32: brick content bits, word-major
    bsize: tuple              # (BX, BY, BZ) python ints
    vpu: float


def pack_volume(grid: np.ndarray, vpu: float) -> PackedVolume:
    """Host-side packing: (Z, Y, X) uint8 -> brick occupancy + bit words.

    Bit layout inside a brick: bit index = z*64 + y*8 + x; word = bit >> 5,
    bit-in-word = bit & 31.
    """
    gz, gy, gx = grid.shape
    bx, by, bz = (gx + 7) // 8, (gy + 7) // 8, (gz + 7) // 8
    pad = np.zeros((bz * 8, by * 8, bx * 8), np.uint8)
    pad[:gz, :gy, :gx] = grid != 0
    # (bz, 8, by, 8, bx, 8) -> (bz, by, bx, z, y, x)
    b = pad.reshape(bz, 8, by, 8, bx, 8).transpose(0, 2, 4, 1, 3, 5)
    bits = b.reshape(bz * by * bx, 512).astype(np.uint32)
    weights = (1 << (np.arange(512, dtype=np.uint64) & 31)).astype(np.uint32)
    words = np.zeros((bz * by * bx, 16), np.uint32)
    for w in range(16):
        sl = bits[:, w * 32:(w + 1) * 32]
        words[:, w] = (sl * weights[w * 32:(w + 1) * 32][None, :]).sum(
            axis=1, dtype=np.uint64).astype(np.uint32)
    occ = (bits.any(axis=1)).astype(np.int32)
    nb = bz * by * bx
    return PackedVolume(
        occ=jnp.asarray(occ.reshape(1, nb).astype(np.int32)),
        words=jnp.asarray(words.T.astype(np.int32).copy()),  # (16, NB)
        bsize=(bx, by, bz),
        vpu=float(vpu),
    )


def _select16(widx, words):
    """Per-lane select of one of 16 broadcast scalar words (binary tree)."""
    # level 0: pairs by bit 0
    lvl = [jnp.where((widx & 1) == 0, words[i], words[i + 1])
           for i in range(0, 16, 2)]
    lvl = [jnp.where((widx & 2) == 0, lvl[i], lvl[i + 1])
           for i in range(0, 8, 2)]
    lvl = [jnp.where((widx & 4) == 0, lvl[i], lvl[i + 1])
           for i in range(0, 4, 2)]
    return jnp.where((widx & 8) == 0, lvl[0], lvl[1])


def _make_kernel(bsize, vpu, max_bricks_per_tile, fine_iters,
                 tile_rows=TILE_ROWS):
    """Build the tile kernel specialized for a brick-grid size and vpu."""
    BX, BY, BZ = bsize
    NB = BX * BY * BZ
    bpu = vpu / BRICK
    rbpu = 1.0 / bpu
    shape = (tile_rows, TILE_LANES)

    def kernel(occ_ref, words_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               t_ref, vox_ref, ax_ref, steps_ref, resolved_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

        o3 = (ox, oy, oz)
        d3 = (dx, dy, dz)
        size = (BX * BRICK / vpu, BY * BRICK / vpu, BZ * BRICK / vpu)

        # ---- slab entry (obb.cpp:48-80 / dda.slab_test semantics) --------
        tmin = jnp.zeros(shape, jnp.float32)
        tmax = jnp.full(shape, BIG, jnp.float32)
        entry_axis = jnp.zeros(shape, jnp.int32)
        for a in range(3):
            rd = 1.0 / d3[a]
            rd = jnp.clip(rd, -BIG, BIG)
            t1 = (0.0 - o3[a]) * rd
            t2 = (size[a] - o3[a]) * rd
            tn = jnp.minimum(t1, t2)
            tf = jnp.maximum(t1, t2)
            tn = jnp.where(jnp.isnan(tn), -BIG, tn)
            tf = jnp.where(jnp.isnan(tf), BIG, tf)
            upd = tn > tmin
            entry_axis = jnp.where(upd, a, entry_axis)
            tmin = jnp.maximum(tmin, tn)
            tmax = jnp.minimum(tmax, tf)
        valid = (tmax - 1e-4) >= tmin

        # ---- tile major axis from mean direction (scalar) ----------------
        mdx = jnp.sum(dx) ; mdy = jnp.sum(dy); mdz = jnp.sum(dz)
        amx, amy, amz = jnp.abs(mdx), jnp.abs(mdy), jnp.abs(mdz)
        k = jnp.where((amx >= amy) & (amx >= amz), 0,
                      jnp.where(amy >= amz, 1, 2)).astype(jnp.int32)
        ksign = jnp.where(
            jnp.where(k == 0, mdx, jnp.where(k == 1, mdy, mdz)) >= 0.0,
            1, -1).astype(jnp.int32)

        def pick3(a, b, c, axis):
            return jnp.where(axis == 0, a, jnp.where(axis == 1, b, c))

        # per-ray components along (k, u, v)
        ku = (k + 1) % 3
        kv = (k + 2) % 3
        ok_ = pick3(ox, oy, oz, k); dk_ = pick3(dx, dy, dz, k)
        ou_ = pick3(ox, oy, oz, ku); du_ = pick3(dx, dy, dz, ku)
        ov_ = pick3(ox, oy, oz, kv); dv_ = pick3(dx, dy, dz, kv)
        nk = pick3(BX, BY, BZ, k)
        nu = pick3(BX, BY, BZ, ku)
        nv = pick3(BX, BY, BZ, kv)

        # rays aligned with the tile's march direction (arithmetic form —
        # selecting between two i1 vectors is not legalizable in Mosaic)
        aligned = dk_ * ksign.astype(jnp.float32) > 1e-6
        resolved = aligned | ~valid         # misses count as resolved
        active0 = valid & aligned

        rdk = jnp.clip(1.0 / dk_, -BIG, BIG)

        # ---- march state --------------------------------------------------
        hit_t = jnp.full(shape, BIG, jnp.float32)
        hit_vox = jnp.full(shape, -1, jnp.int32)
        hit_ax = entry_axis * 4             # axis*4 + sign-bits placeholder
        steps = jnp.zeros(shape, jnp.int32)

        sgnx = jnp.where(jnp.signbit(dx), -1, 1).astype(jnp.int32)
        sgny = jnp.where(jnp.signbit(dy), -1, 1).astype(jnp.int32)
        sgnz = jnp.where(jnp.signbit(dz), -1, 1).astype(jnp.int32)

        # slice index range along k for each ray (entry position)
        # march slices s = 0..nk-1 in ksign order
        s_begin = jnp.where(ksign > 0, 0, nk - 1)

        def slice_body(si, carry):
            # done/resolved carried as int32: Mosaic cannot select i1 vectors
            hit_t, hit_vox, hit_ax, steps, done_i, resolved_i = carry
            done = done_i > 0
            s = s_begin + si * ksign        # scalar brick-slice index

            # slice k-window in t per ray
            k0 = s.astype(jnp.float32) * rbpu
            k1 = (s + 1).astype(jnp.float32) * rbpu
            ta = (k0 - ok_) * rdk
            tb = (k1 - ok_) * rdk
            t0 = jnp.minimum(ta, tb)
            t1 = jnp.maximum(ta, tb)
            t0 = jnp.maximum(t0, tmin)
            t1 = jnp.minimum(t1, tmax)
            in_slice = active0 & ~done & (t1 >= t0) & (t1 >= 0.0)

            # uv footprint over [t0, t1] in brick coords
            ua = (ou_ + du_ * t0) * bpu
            ub = (ou_ + du_ * t1) * bpu
            va = (ov_ + dv_ * t0) * bpu
            vb = (ov_ + dv_ * t1) * bpu
            inf_hi = jnp.full(shape, 1e9, jnp.float32)
            inf_lo = jnp.full(shape, -1e9, jnp.float32)
            u_lo = jnp.min(jnp.where(in_slice, jnp.minimum(ua, ub), inf_hi))
            u_hi = jnp.max(jnp.where(in_slice, jnp.maximum(ua, ub), inf_lo))
            v_lo = jnp.min(jnp.where(in_slice, jnp.minimum(va, vb), inf_hi))
            v_hi = jnp.max(jnp.where(in_slice, jnp.maximum(va, vb), inf_lo))
            any_in = jnp.any(in_slice)

            iu0 = jnp.clip(jnp.floor(u_lo).astype(jnp.int32), 0, nu - 1)
            iu1 = jnp.clip(jnp.floor(u_hi).astype(jnp.int32), 0, nu - 1)
            iv0 = jnp.clip(jnp.floor(v_lo).astype(jnp.int32), 0, nv - 1)
            iv1 = jnp.clip(jnp.floor(v_hi).astype(jnp.int32), 0, nv - 1)
            n_u = jnp.where(any_in, iu1 - iu0 + 1, 0)
            n_v = jnp.where(any_in, iv1 - iv0 + 1, 0)

            # iterate the rect near-to-far along the mean ray direction so
            # the per-brick `enter < hit_t` prune kills far bricks after the
            # wavefront has hit (conservative — never skips a nearer brick)
            u_fwd = jnp.sum(du_) >= 0.0
            v_fwd = jnp.sum(dv_) >= 0.0

            def brick_body(bi, carry2):
                hit_t, hit_vox, hit_ax, steps, done_i = carry2
                ui = bi % jnp.maximum(n_u, 1)
                vi = bi // jnp.maximum(n_u, 1)
                su = jnp.where(u_fwd, iu0 + ui, iu1 - ui)
                sv = jnp.where(v_fwd, iv0 + vi, iv1 - vi)

                # brick integer coords (bx, by, bz) from (k, u, v) = (s, su, sv)
                bxc = pick3(s, sv, su, k)
                byc = pick3(su, s, sv, k)
                bzc = pick3(sv, su, s, k)
                bidx = (bzc * BY + byc) * BX + bxc

                occ = occ_ref[0, bidx]

                def occupied(carry3):
                    hit_t, hit_vox, hit_ax, steps, done_i = carry3
                    done = done_i > 0

                    # per-ray slab vs brick AABB (local units)
                    bx0 = bxc.astype(jnp.float32) * rbpu
                    by0 = byc.astype(jnp.float32) * rbpu
                    bz0 = bzc.astype(jnp.float32) * rbpu
                    tn = jnp.full(shape, 0.0, jnp.float32)
                    tf = jnp.full(shape, BIG, jnp.float32)
                    b_ax = jnp.zeros(shape, jnp.int32)
                    for a, (oa, da, b0) in enumerate(
                            ((ox, dx, bx0), (oy, dy, by0), (oz, dz, bz0))):
                        rd = jnp.clip(1.0 / da, -BIG, BIG)
                        t1_ = (b0 - oa) * rd
                        t2_ = (b0 + rbpu - oa) * rd
                        lo = jnp.minimum(t1_, t2_)
                        hi = jnp.maximum(t1_, t2_)
                        lo = jnp.where(jnp.isnan(lo), -BIG, lo)
                        hi = jnp.where(jnp.isnan(hi), BIG, hi)
                        upd = lo > tn
                        b_ax = jnp.where(upd, a, b_ax)
                        tn = jnp.maximum(tn, lo)
                        tf = jnp.minimum(tf, hi)
                    enter = jnp.maximum(tn, tmin)
                    cross = (tf - 1e-5 >= enter) & in_slice & ~done \
                        & (enter < hit_t)

                    def fine(carry4):
                        hit_t, hit_vox, hit_ax, steps = carry4
                        # broadcast brick words (scalar reads) — only paid
                        # when some ray actually crosses this brick
                        w = [words_ref[wi, bidx] for wi in range(16)]
                        # fine entry (vv.cpp:237-251)
                        fex = (ox + dx * enter - bx0) * vpu
                        fey = (oy + dy * enter - by0) * vpu
                        fez = (oz + dz * enter - bz0) * vpu
                        cx = jnp.clip(jnp.floor(fex).astype(jnp.int32), 0, 7)
                        cy = jnp.clip(jnp.floor(fey).astype(jnp.int32), 0, 7)
                        cz = jnp.clip(jnp.floor(fez).astype(jnp.int32), 0, 7)
                        rdx = jnp.clip(1.0 / dx, -BIG, BIG)
                        rdy = jnp.clip(1.0 / dy, -BIG, BIG)
                        rdz = jnp.clip(1.0 / dz, -BIG, BIG)
                        dlx = jnp.minimum(jnp.abs(rdx), BIG)
                        dly = jnp.minimum(jnp.abs(rdy), BIG)
                        dlz = jnp.minimum(jnp.abs(rdz), BIG)
                        stpx = jnp.maximum(sgnx, 0).astype(jnp.float32)
                        stpy = jnp.maximum(sgny, 0).astype(jnp.float32)
                        stpz = jnp.maximum(sgnz, 0).astype(jnp.float32)
                        tmx = (cx.astype(jnp.float32) - fex + stpx) * rdx
                        tmy = (cy.astype(jnp.float32) - fey + stpy) * rdy
                        tmz = (cz.astype(jnp.float32) - fez + stpz) * rdz
                        tmx = jnp.minimum(jnp.where(jnp.isnan(tmx), BIG, tmx), BIG)
                        tmy = jnp.minimum(jnp.where(jnp.isnan(tmy), BIG, tmy), BIG)
                        tmz = jnp.minimum(jnp.where(jnp.isnan(tmz), BIG, tmz), BIG)

                        # first-cell axis: brick entry face (or volume entry)
                        at_vol_entry = enter <= tmin + 1e-12
                        ax0 = jnp.where(at_vol_entry, entry_axis, b_ax)

                        st0 = dict(cx=cx, cy=cy, cz=cz, tmx=tmx, tmy=tmy,
                                   tmz=tmz, ft=jnp.zeros(shape, jnp.float32),
                                   ax=ax0, live=cross.astype(jnp.int32),
                                   h_t=hit_t, h_v=hit_vox, h_a=hit_ax,
                                   stp=steps)

                        def fine_step(fi, st):
                            live_b = st["live"] > 0
                            bit = st["cz"] * 64 + st["cy"] * 8 + st["cx"]
                            word = _select16(bit >> 5, w)
                            vbit = (word >> (bit & 31)) & 1
                            is_hit = live_b & (vbit == 1)
                            t_here = enter + st["ft"] / vpu
                            better = is_hit & (t_here < st["h_t"])
                            vox_flat = (((bzc * 8 + st["cz"]) * (BY * 8)
                                         + (byc * 8 + st["cy"])) * (BX * 8)
                                        + (bxc * 8 + st["cx"]))
                            h_t = jnp.where(better, t_here, st["h_t"])
                            h_v = jnp.where(better, vox_flat, st["h_v"])
                            sgn_ax = pick3(sgnx, sgny, sgnz, st["ax"])
                            h_a = jnp.where(
                                better,
                                st["ax"] * 2 + jnp.where(sgn_ax > 0, 1, 0),
                                st["h_a"])
                            live = live_b & ~is_hit

                            # A&W step (reference comparison order)
                            use_x = (st["tmx"] < st["tmy"]) & (st["tmx"] < st["tmz"])
                            use_y = ~(st["tmx"] < st["tmy"]) & (st["tmy"] < st["tmz"])
                            ax = jnp.where(use_x, 0, jnp.where(use_y, 1, 2))
                            cx2 = st["cx"] + jnp.where(use_x, sgnx, 0)
                            cy2 = st["cy"] + jnp.where(use_y, sgny, 0)
                            use_z = ~use_x & ~use_y
                            cz2 = st["cz"] + jnp.where(use_z, sgnz, 0)
                            ft2 = jnp.where(use_x, st["tmx"],
                                            jnp.where(use_y, st["tmy"], st["tmz"]))
                            tmx2 = st["tmx"] + jnp.where(use_x, dlx, 0.0)
                            tmy2 = st["tmy"] + jnp.where(use_y, dly, 0.0)
                            tmz2 = st["tmz"] + jnp.where(use_z, dlz, 0.0)
                            oob = ((cx2 < 0) | (cx2 > 7) | (cy2 < 0)
                                   | (cy2 > 7) | (cz2 < 0) | (cz2 > 7))
                            live = live & ~oob
                            stp = st["stp"] + jnp.where(live_b, 1, 0)
                            return dict(cx=cx2, cy=cy2, cz=cz2, tmx=tmx2,
                                        tmy=tmy2, tmz=tmz2, ft=ft2,
                                        ax=ax.astype(jnp.int32),
                                        live=live.astype(jnp.int32),
                                        h_t=h_t, h_v=h_v, h_a=h_a, stp=stp)

                        def fine_cond(c):
                            fi, st = c
                            return (fi < fine_iters) & (jnp.sum(st["live"]) > 0)

                        def fine_body(c):
                            fi, st = c
                            return (fi + 1, fine_step(fi, st))

                        _, st = jax.lax.while_loop(fine_cond, fine_body,
                                                   (jnp.int32(0), st0))
                        return (st["h_t"], st["h_v"], st["h_a"], st["stp"])

                    hit_t, hit_vox, hit_ax, steps = jax.lax.cond(
                        jnp.any(cross), fine,
                        lambda c: c, (hit_t, hit_vox, hit_ax, steps))
                    return (hit_t, hit_vox, hit_ax, steps, done_i)

                carry3 = jax.lax.cond(
                    occ > 0, occupied, lambda c: c,
                    (hit_t, hit_vox, hit_ax, steps, done_i))
                return carry3

            total = n_u * n_v
            overflow = total > max_bricks_per_tile
            # rect too large for the scalar budget: those rays fall back
            resolved_i = jnp.where(in_slice & overflow, 0, resolved_i)
            n_bricks = jnp.minimum(total, max_bricks_per_tile)
            carry2 = jax.lax.fori_loop(
                0, n_bricks, brick_body,
                (hit_t, hit_vox, hit_ax, steps, done_i))
            hit_t, hit_vox, hit_ax, steps, done_i = carry2
            # front-to-back: a hit in this slice is final; rays whose slab
            # exit lies inside this slice are finished (miss)
            fin = (hit_t < BIG) | (active0 & (t1 >= tmax - 1e-7))
            done_i = jnp.where(fin, 1, done_i)
            return (hit_t, hit_vox, hit_ax, steps, done_i, resolved_i)

        n_slices = nk
        init_done = (~active0).astype(jnp.int32)

        def outer_cond(c):
            si, carry = c
            done_i = carry[4]
            return (si < n_slices) & (jnp.sum(1 - done_i) > 0)

        def outer_body(c):
            si, carry = c
            return (si + 1, slice_body(si, carry))

        _, (hit_t, hit_vox, hit_ax, steps, done_i, resolved_i) = (
            jax.lax.while_loop(
                outer_cond, outer_body,
                (jnp.int32(0),
                 (hit_t, hit_vox, hit_ax, steps, init_done,
                  resolved.astype(jnp.int32)))))

        t_ref[:] = hit_t
        vox_ref[:] = hit_vox
        ax_ref[:] = hit_ax
        steps_ref[:] = steps
        resolved_ref[:] = resolved_i

    return kernel


@functools.partial(jax.jit, static_argnames=("bsize", "vpu",
                                             "max_bricks_per_tile",
                                             "fine_iters", "interpret",
                                             "tile_rows"))
def trace_coherent(occ, words, o_l, d_l, bsize, vpu,
                   max_bricks_per_tile: int = 64, fine_iters: int = 24,
                   interpret: bool = False, tile_rows: int = TILE_ROWS):
    """Trace N local-space rays via the coherent tile kernel.

    o_l, d_l: (N, 3) with N a multiple of 1024 (pad outside).
    Returns dict: t, vox (flat voxel index, -1 = miss), ax (axis*2+sign>0),
    steps, resolved (bool — False rays need the fallback tracer).
    """
    n = o_l.shape[0]
    tile = tile_rows * TILE_LANES
    assert n % tile == 0, f"{n} rays not a multiple of {tile}"
    n_tiles = n // tile
    comp = [o_l[:, i].reshape(n_tiles * tile_rows, TILE_LANES) for i in range(3)]
    comp += [d_l[:, i].reshape(n_tiles * tile_rows, TILE_LANES) for i in range(3)]

    kernel = _make_kernel(bsize, vpu, max_bricks_per_tile, fine_iters,
                          tile_rows)
    nb = bsize[0] * bsize[1] * bsize[2]

    block = pl.BlockSpec((tile_rows, TILE_LANES),
                         lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((n_tiles * tile_rows, TILE_LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles * tile_rows, TILE_LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles * tile_rows, TILE_LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles * tile_rows, TILE_LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles * tile_rows, TILE_LANES), jnp.int32),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, nb), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((16, nb), lambda i: (0, 0), memory_space=pltpu.SMEM),
            *([block] * 6),
        ],
        out_specs=[block] * 5,
        out_shape=out_shapes,
        interpret=interpret,
    )(occ, words, *comp)

    t, vox, ax, steps, resolved = [o.reshape(n) for o in outs]
    return dict(t=t, vox=vox, ax=ax, steps=steps,
                resolved=resolved.astype(bool))
