"""Independent two-level DDA megakernel (per-lane brick march + vote fine).

The slice-walk megakernel (mega.py) amortizes traversal over a tile by
marching brick SLICES along the tile's shared major axis; its cost scales
with the tile footprint's brick RECTANGLES (every rect brick pays a tile-
wide slab test) and rays fighting the major axis are left unresolved.

This kernel instead runs the reference's two-level Amanatides-Woo DDA
(vv.cpp:127-235) with NO tile-coherence requirement at the brick level:

- the ENTIRE brick-level occupancy bitmap (<= 4096 bricks = 128 x u32) is
  broadcast as one VMEM row, so every lane marches its own brick DDA with
  one lane gather per step — fully divergent, ~45 VPU ops per brick step;
- only the 512-bit brick CONTENTS need coherence: lanes stopped at an
  occupied brick enter a min-vote loop (the run-mode material-vote trick,
  mega.py:832-856, applied to traversal) — each round broadcasts one
  brick's 16 occupancy words and runs the masked in-register fine DDA for
  the lanes waiting on that brick;
- every ray is resolvable regardless of direction: there is no major
  axis, no per-slice scalar rect walk, no corner-footprint math, and no
  unresolved residue for the caller to re-trace.

Coherent primary tiles hit few distinct bricks, so the vote loop runs
2-6 rounds; the win over the slice walk is that empty/far bricks cost one
lane-local step instead of a tile-wide slab pass.  Same outputs and aux
encoding as mega.render_mega_tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxel_tracer_tpu.ops.pallas.mega import (
    BIG, BRICK, LANES, AUX_AX_SHIFT, AUX_RESOLVED_SHIFT, AUX_STEPS_SHIFT,
    _aces, _analytic_sky)


def pack_brickbits(occ: np.ndarray) -> jnp.ndarray:
    """(1, NB) brick occupancy flags -> (1, 128) u32 bitmap row.

    One VMEM row holds the occupancy bit of every brick (NB <= 4096), so
    the kernel's per-lane brick DDA tests any brick with a single lane
    gather.  Bit index == brick index (bidx = (bz*BY + by)*BX + bx).
    """
    flags = np.asarray(occ).reshape(-1).astype(np.uint32)
    nb = flags.shape[0]
    assert nb <= 4096, f"indep traversal supports <= 4096 bricks, got {nb}"
    words = np.zeros(128, np.uint32)
    idx = np.arange(nb)
    np.bitwise_or.at(words, idx >> 5, (flags & 1) << (idx & 31))
    return jnp.asarray(words.view(np.int32)[None, :])


def _make_indep_kernel(bsize, vpu, *, tile_rows, tile_w, nx_tiles,
                       fine_iters, vote_rounds, sky_mode, shading, ambient,
                       fine_unroll, track_steps, ray_source="camera"):
    BX, BY, BZ = bsize
    NB = BX * BY * BZ
    bpu = vpu / BRICK
    rbpu = 1.0 / bpu
    shape = (tile_rows, LANES)
    log_tw = int(np.log2(tile_w))
    assert 1 << log_tw == tile_w
    max_outer = BX + BY + BZ + 2          # max bricks a ray can cross

    def kernel(*refs):
        if ray_source == "camera":
            (cam_ref, occb_ref, occw_ref, matw_ref, pal_ref,
             rgba_ref, t_ref, aux_ref) = refs
        else:
            (cam_ref, oxr, oyr, ozr, dxr, dyr, dzr,
             occb_ref, occw_ref, matw_ref, pal_ref,
             rgba_ref, t_ref, aux_ref) = refs
        ti = pl.program_id(0)
        ty = ti // nx_tiles
        tx = ti - ty * nx_tiles

        if ray_source == "camera":
            # in-kernel raygen (camera.h:32-37, volume-local space)
            fl = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
                  + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
            px = (tx * tile_w + (fl & (tile_w - 1))).astype(jnp.float32)
            py = (ty * (tile_rows * LANES // tile_w)
                  + (fl >> log_tw)).astype(jnp.float32)
            o3 = tuple(cam_ref[i] for i in range(3))
            ex = cam_ref[3] + px * cam_ref[6] + py * cam_ref[9] - o3[0]
            ey = cam_ref[4] + px * cam_ref[7] + py * cam_ref[10] - o3[1]
            ez = cam_ref[5] + px * cam_ref[8] + py * cam_ref[11] - o3[2]
            rn = jax.lax.rsqrt(ex * ex + ey * ey + ez * ez)
            dx, dy, dz = ex * rn, ey * rn, ez * rn
            ox = jnp.full(shape, o3[0], jnp.float32)
            oy = jnp.full(shape, o3[1], jnp.float32)
            oz = jnp.full(shape, o3[2], jnp.float32)
        else:
            ox, oy, oz = oxr[:], oyr[:], ozr[:]
            dx, dy, dz = dxr[:], dyr[:], dzr[:]

        size = (BX * BRICK / vpu, BY * BRICK / vpu, BZ * BRICK / vpu)

        # slab entry (obb.cpp:48-80 semantics)
        tmin = jnp.zeros(shape, jnp.float32)
        tmax = jnp.full(shape, BIG, jnp.float32)
        entry_axis = jnp.zeros(shape, jnp.int32)
        for a, (oa, da) in enumerate(((ox, dx), (oy, dy), (oz, dz))):
            rd = jnp.clip(1.0 / da, -BIG, BIG)
            t1 = (0.0 - oa) * rd
            t2 = (size[a] - oa) * rd
            tn = jnp.minimum(t1, t2)
            tf = jnp.maximum(t1, t2)
            tn = jnp.where(jnp.isnan(tn), -BIG, tn)
            tf = jnp.where(jnp.isnan(tf), BIG, tf)
            upd = tn > tmin
            entry_axis = jnp.where(upd, a, entry_axis)
            tmin = jnp.maximum(tmin, tn)
            tmax = jnp.minimum(tmax, tf)
        valid = (tmax - 1e-4) >= tmin

        def pick3(a, b, c, axis):
            return jnp.where(axis == 0, a, jnp.where(axis == 1, b, c))

        rdx = jnp.clip(1.0 / dx, -BIG, BIG)
        rdy = jnp.clip(1.0 / dy, -BIG, BIG)
        rdz = jnp.clip(1.0 / dz, -BIG, BIG)
        dlx = jnp.minimum(jnp.abs(rdx), BIG)
        dly = jnp.minimum(jnp.abs(rdy), BIG)
        dlz = jnp.minimum(jnp.abs(rdz), BIG)
        sgnx = jnp.where(jnp.signbit(dx), -1, 1).astype(jnp.int32)
        sgny = jnp.where(jnp.signbit(dy), -1, 1).astype(jnp.int32)
        sgnz = jnp.where(jnp.signbit(dz), -1, 1).astype(jnp.int32)
        stpx = jnp.maximum(sgnx, 0).astype(jnp.float32)
        stpy = jnp.maximum(sgny, 0).astype(jnp.float32)
        stpz = jnp.maximum(sgnz, 0).astype(jnp.float32)

        # brick-level DDA init at the entry point (brick-unit times:
        # t_brick = (t_world - tmin) * bpu, exactly the fine DDA's scheme
        # one level up)
        fbx = (ox + dx * tmin) * bpu
        fby = (oy + dy * tmin) * bpu
        fbz = (oz + dz * tmin) * bpu
        cbx0 = jnp.clip(jnp.floor(fbx).astype(jnp.int32), 0, BX - 1)
        cby0 = jnp.clip(jnp.floor(fby).astype(jnp.int32), 0, BY - 1)
        cbz0 = jnp.clip(jnp.floor(fbz).astype(jnp.int32), 0, BZ - 1)

        def bt(c0, fb, stp, rd):
            v = (c0.astype(jnp.float32) - fb + stp) * rd
            return jnp.minimum(jnp.where(jnp.isnan(v), BIG, v), BIG)

        occb_row = jnp.broadcast_to(occb_ref[0, :][None, :], shape)

        st0 = dict(
            cbx=cbx0, cby=cby0, cbz=cbz0,
            btx=bt(cbx0, fbx, stpx, rdx),
            bty=bt(cby0, fby, stpy, rdy),
            btz=bt(cbz0, fbz, stpz, rdz),
            bft=jnp.zeros(shape, jnp.float32),   # brick-unit entry time
            bax=entry_axis,                       # axis of entry step
            live=valid.astype(jnp.int32),
            res=jnp.ones(shape, jnp.int32),
            hit_t=jnp.full(shape, BIG, jnp.float32),
            h_info=jnp.full(shape, -1, jnp.int32),  # bidx<<9 | bit
            hit_ax=entry_axis * 2,
            stp=jnp.zeros(shape, jnp.int32),
        )

        def fine_pass(st, sel, bsel):
            """Masked in-register fine DDA of brick `bsel` for `sel` lanes
            (identical math to mega.py's brick-mode fine, scalar brick)."""
            bsz = bsel // (BX * BY)
            rem = bsel - bsz * (BX * BY)
            bsy = rem // BX
            bsx = rem - bsy * BX
            bx0 = bsx.astype(jnp.float32) * rbpu
            by0 = bsy.astype(jnp.float32) * rbpu
            bz0 = bsz.astype(jnp.float32) * rbpu
            enter = tmin + st["bft"] * (1.0 / bpu)

            occ_row = jnp.broadcast_to(occw_ref[bsel >> 3, :][None, :],
                                       shape)
            woff = (bsel & 7) * 16

            fex = (ox + dx * enter - bx0) * vpu
            fey = (oy + dy * enter - by0) * vpu
            fez = (oz + dz * enter - bz0) * vpu
            cx = jnp.clip(jnp.floor(fex).astype(jnp.int32), 0, 7)
            cy = jnp.clip(jnp.floor(fey).astype(jnp.int32), 0, 7)
            cz = jnp.clip(jnp.floor(fez).astype(jnp.int32), 0, 7)
            tmx = (cx.astype(jnp.float32) - fex + stpx) * rdx
            tmy = (cy.astype(jnp.float32) - fey + stpy) * rdy
            tmz = (cz.astype(jnp.float32) - fez + stpz) * rdz
            tmx = jnp.minimum(jnp.where(jnp.isnan(tmx), BIG, tmx), BIG)
            tmy = jnp.minimum(jnp.where(jnp.isnan(tmy), BIG, tmy), BIG)
            tmz = jnp.minimum(jnp.where(jnp.isnan(tmz), BIG, tmz), BIG)

            at_vol_entry = st["bft"] <= 1e-12
            ax0 = jnp.where(at_vol_entry, entry_axis, st["bax"])

            fs0 = dict(cx=cx, cy=cy, cz=cz, tmx=tmx, tmy=tmy, tmz=tmz,
                       ft=jnp.zeros(shape, jnp.float32), ax=ax0,
                       live=sel.astype(jnp.int32),
                       h_bit=jnp.full(shape, -1, jnp.int32),
                       h_ft=jnp.zeros(shape, jnp.float32),
                       h_ax=jnp.zeros(shape, jnp.int32),
                       stp=st["stp"])

            def fine_step(fs):
                live_b = fs["live"] > 0
                bit = fs["cz"] * 64 + fs["cy"] * 8 + fs["cx"]
                word = jnp.take_along_axis(occ_row, woff + (bit >> 5),
                                           axis=1)
                vbit = (word >> (bit & 31)) & 1
                is_hit = live_b & (vbit == 1)
                h_bit = jnp.where(is_hit, bit, fs["h_bit"])
                h_ft = jnp.where(is_hit, fs["ft"], fs["h_ft"])
                h_ax = jnp.where(is_hit, fs["ax"], fs["h_ax"])
                live = live_b & ~is_hit

                use_x = (fs["tmx"] < fs["tmy"]) & (fs["tmx"] < fs["tmz"])
                use_y = ~(fs["tmx"] < fs["tmy"]) & (fs["tmy"] < fs["tmz"])
                ax = jnp.where(use_x, 0, jnp.where(use_y, 1, 2))
                cx2 = fs["cx"] + jnp.where(use_x, sgnx, 0)
                cy2 = fs["cy"] + jnp.where(use_y, sgny, 0)
                use_z = ~use_x & ~use_y
                cz2 = fs["cz"] + jnp.where(use_z, sgnz, 0)
                ft2 = jnp.where(use_x, fs["tmx"],
                                jnp.where(use_y, fs["tmy"], fs["tmz"]))
                tmx2 = fs["tmx"] + jnp.where(use_x, dlx, 0.0)
                tmy2 = fs["tmy"] + jnp.where(use_y, dly, 0.0)
                tmz2 = fs["tmz"] + jnp.where(use_z, dlz, 0.0)
                oob = ((cx2 | cy2 | cz2) & ~7) != 0
                live = live & ~oob
                out = dict(cx=cx2, cy=cy2, cz=cz2, tmx=tmx2, tmy=tmy2,
                           tmz=tmz2, ft=ft2, ax=ax.astype(jnp.int32),
                           live=live.astype(jnp.int32),
                           h_bit=h_bit, h_ft=h_ft, h_ax=h_ax,
                           stp=fs["stp"])
                if track_steps:
                    out["stp"] = fs["stp"] + jnp.where(live_b, 1, 0)
                return out

            def fine_cond(c):
                fi, fs = c
                return (fi < fine_iters) & (jnp.sum(fs["live"]) > 0)

            def fine_body(c):
                fi, fs = c
                for _ in range(fine_unroll):
                    fs = fine_step(fs)
                return (fi + fine_unroll, fs)

            _, fs = jax.lax.while_loop(fine_cond, fine_body,
                                       (jnp.int32(0), fs0))

            # fine cap overflow: hand those lanes to the caller unresolved
            res = jnp.where(fs["live"] > 0, 0, st["res"])
            t_new = enter + fs["h_ft"] * (1.0 / vpu)
            hitb = fs["h_bit"] >= 0
            hit_t = jnp.where(hitb, t_new, st["hit_t"])
            sgn_ax = pick3(sgnx, sgny, sgnz, fs["h_ax"])
            hit_ax = jnp.where(
                hitb, fs["h_ax"] * 2 + jnp.where(sgn_ax > 0, 1, 0),
                st["hit_ax"])
            h_info = jnp.where(hitb, (bsel << 9) | jnp.maximum(fs["h_bit"],
                                                               0),
                               st["h_info"])
            live = jnp.where(hitb | (fs["live"] > 0), 0, st["live"])
            return dict(st, hit_t=hit_t, hit_ax=hit_ax, h_info=h_info,
                        res=res, live=live, stp=fs["stp"])

        def outer_body(c):
            it, st = c
            live_b = st["live"] > 0
            bidx = (st["cbz"] * BY + st["cby"]) * BX + st["cbx"]
            word = jnp.take_along_axis(occb_row, bidx >> 5, axis=1)
            occ_bit = (word >> (bidx & 31)) & 1
            pend0 = live_b & (occ_bit == 1)

            def vote_cond(c2):
                vi, pend_i, st2 = c2
                return (vi < vote_rounds) & (jnp.sum(pend_i) > 0)

            def vote_body(c2):
                vi, pend_i, st2 = c2
                p = pend_i > 0
                bsel = jnp.min(jnp.where(p, bidx, jnp.int32(1 << 30)))
                sel = p & (bidx == bsel)
                st2 = fine_pass(st2, sel, bsel)
                return (vi + 1, (p & ~sel).astype(jnp.int32), st2)

            _, pend_left, st = jax.lax.while_loop(
                vote_cond, vote_body,
                (jnp.int32(0), pend0.astype(jnp.int32), st))
            # vote cap overflow: unresolved, stop tracing those lanes
            st["res"] = jnp.where(pend_left > 0, 0, st["res"])
            st["live"] = jnp.where(pend_left > 0, 0, st["live"])

            # one brick step for every still-live lane
            live_b = st["live"] > 0
            use_x = (st["btx"] < st["bty"]) & (st["btx"] < st["btz"])
            use_y = ~(st["btx"] < st["bty"]) & (st["bty"] < st["btz"])
            use_z = ~use_x & ~use_y
            cbx2 = st["cbx"] + jnp.where(use_x & live_b, sgnx, 0)
            cby2 = st["cby"] + jnp.where(use_y & live_b, sgny, 0)
            cbz2 = st["cbz"] + jnp.where(use_z & live_b, sgnz, 0)
            ft2 = jnp.where(use_x, st["btx"],
                            jnp.where(use_y, st["bty"], st["btz"]))
            st["btx"] = st["btx"] + jnp.where(use_x & live_b, dlx, 0.0)
            st["bty"] = st["bty"] + jnp.where(use_y & live_b, dly, 0.0)
            st["btz"] = st["btz"] + jnp.where(use_z & live_b, dlz, 0.0)
            st["bft"] = jnp.where(live_b, ft2, st["bft"])
            st["bax"] = jnp.where(live_b,
                                  jnp.where(use_x, 0,
                                            jnp.where(use_y, 1, 2)),
                                  st["bax"])
            oob = (((cbx2 < 0) | (cbx2 >= BX)) | ((cby2 < 0) | (cby2 >= BY))
                   | ((cbz2 < 0) | (cbz2 >= BZ)))
            st["cbx"] = jnp.clip(cbx2, 0, BX - 1)
            st["cby"] = jnp.clip(cby2, 0, BY - 1)
            st["cbz"] = jnp.clip(cbz2, 0, BZ - 1)
            st["live"] = jnp.where(oob, 0, st["live"])
            if track_steps:
                st["stp"] = st["stp"] + jnp.where(live_b, 1, 0)
            return (it + 1, st)

        def outer_cond(c):
            it, st = c
            return (it < max_outer) & (jnp.sum(st["live"]) > 0)

        _, st = jax.lax.while_loop(outer_cond, outer_body,
                                   (jnp.int32(0), st0))

        hit_t = st["hit_t"]
        hit_ax = st["hit_ax"]
        steps = st["stp"]
        # outer cap leftovers are unresolved
        resolved_i = jnp.where(st["live"] > 0, 0, st["res"])
        h_info = st["h_info"]

        # tile-end material vote (mega.py run-mode scheme)
        hit = (hit_t < BIG) & (resolved_i > 0)
        pending0 = (hit & (h_info >= 0)).astype(jnp.int32)

        def mat_cond(c):
            it, pending_i, hm = c
            return (it < vote_rounds) & (jnp.sum(pending_i) > 0)

        def mat_body(c):
            it, pending_i, hm = c
            p = pending_i > 0
            bsel = jnp.min(jnp.where(p, h_info >> 9, jnp.int32(1 << 30)))
            sel = p & ((h_info >> 9) == bsel)
            mrow = jnp.broadcast_to(matw_ref[bsel, :][None, :], shape)
            hb = h_info & 511
            mword = jnp.take_along_axis(mrow, hb >> 2, axis=1)
            mbyte = (mword >> ((hb & 3) * 8)) & 255
            hm = jnp.where(sel, mbyte, hm)
            return (it + 1, (p & ~sel).astype(jnp.int32), hm)

        _, pending_left, hit_mat = jax.lax.while_loop(
            mat_cond, mat_body,
            (jnp.int32(0), pending0, jnp.zeros(shape, jnp.int32)))
        # Lanes whose brick never won a vote round stay UNRESOLVED instead
        # of silently shading with palette entry 0 (mirrors the traversal
        # vote's pend_left handling in outer_body).
        vote_overflow = pending_left > 0
        resolved_i = jnp.where(vote_overflow, 0, resolved_i)
        hit = hit & ~vote_overflow

        if shading == "trace":
            aux = (hit_mat | (hit_ax << AUX_AX_SHIFT)
                   | (resolved_i << AUX_RESOLVED_SHIFT)
                   | (jnp.minimum(steps, 0x7ffff) << AUX_STEPS_SHIFT))
            rgba_ref[:] = jnp.zeros(shape, jnp.int32)
            t_ref[:] = jnp.where(hit, hit_t, BIG)
            aux_ref[:] = aux
            return

        # shade + sky + tonemap (mega.py tail semantics)
        pidx = hit_mat & 127
        hi_half = hit_mat >= 128
        alb = []
        for c in range(3):
            lo = jnp.take_along_axis(
                jnp.broadcast_to(pal_ref[2 * c, :][None, :], shape), pidx,
                axis=1)
            hi = jnp.take_along_axis(
                jnp.broadcast_to(pal_ref[2 * c + 1, :][None, :], shape),
                pidx, axis=1)
            alb.append(jnp.where(hi_half, hi, lo))

        if shading == "lambert":
            axis_k = hit_ax >> 1
            sgn = jnp.where((hit_ax & 1) == 1, -1.0, 1.0)
            nxw = pick3(cam_ref[12], cam_ref[13], cam_ref[14], axis_k)
            nyw = pick3(cam_ref[15], cam_ref[16], cam_ref[17], axis_k)
            nzw = pick3(cam_ref[18], cam_ref[19], cam_ref[20], axis_k)
            ndl = (nxw * cam_ref[21] + nyw * cam_ref[22]
                   + nzw * cam_ref[23]) * sgn
            irr = jnp.maximum(ndl, 0.0) * cam_ref[25] + ambient
            alb = [a * irr for a in alb]

        if sky_mode == "analytic":
            dwx = cam_ref[12] * dx + cam_ref[13] * dy + cam_ref[14] * dz
            dwy = cam_ref[15] * dx + cam_ref[16] * dy + cam_ref[17] * dz
            dwz = cam_ref[18] * dx + cam_ref[19] * dy + cam_ref[20] * dz
            sky = _analytic_sky((dwx, dwy, dwz),
                                (cam_ref[21], cam_ref[22], cam_ref[23]))
        elif sky_mode == "constant":
            sky = [jnp.full(shape, 0.0, jnp.float32) + cam_ref[26 + c]
                   for c in range(3)]
        else:
            sky = [jnp.zeros(shape, jnp.float32)] * 3

        rgb = [jnp.where(hit, a, s) for a, s in zip(alb, sky)]
        if shading == "raw":
            rgb8 = [jnp.clip(v * 255.0 + 0.5, 0.0, 255.0).astype(jnp.int32)
                    for v in rgb]
        else:
            rgb8 = [jnp.clip(_aces(v) * 255.0 + 0.5, 0.0,
                             255.0).astype(jnp.int32) for v in rgb]
        rgba = rgb8[0] | (rgb8[1] << 8) | (rgb8[2] << 16) \
            | jnp.int32(-(1 << 24))

        aux = (hit_mat | (hit_ax << AUX_AX_SHIFT)
               | (resolved_i << AUX_RESOLVED_SHIFT)
               | (jnp.minimum(steps, 0x7ffff) << AUX_STEPS_SHIFT))
        rgba_ref[:] = rgba
        t_ref[:] = jnp.where(hit, hit_t, BIG)
        aux_ref[:] = aux

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("bsize", "vpu", "width", "height", "tile_rows",
                     "tile_w", "fine_iters", "vote_rounds", "sky_mode",
                     "shading", "ambient", "fine_unroll", "track_steps",
                     "interpret"))
def render_indep_tiles(cam16, occb, occw, matw, pal, *, bsize, vpu, width,
                       height, tile_rows=8, tile_w=32, fine_iters=24,
                       vote_rounds=64, sky_mode="analytic", shading="flat",
                       ambient=0.2, fine_unroll=6, track_steps=True,
                       interpret=False):
    """Fused frame via the independent two-level DDA.  Same tile-order
    outputs (rgba i32, t f32, aux i32) as mega.render_mega_tiles."""
    tile_h = tile_rows * LANES // tile_w
    assert width % tile_w == 0 and height % tile_h == 0, \
        f"{width}x{height} not divisible by {tile_w}x{tile_h} tiles"
    nx, ny = width // tile_w, height // tile_h
    n_tiles = nx * ny

    kernel = _make_indep_kernel(
        bsize, vpu, tile_rows=tile_rows, tile_w=tile_w, nx_tiles=nx,
        fine_iters=fine_iters, vote_rounds=vote_rounds, sky_mode=sky_mode,
        shading=shading, ambient=ambient, fine_unroll=fine_unroll,
        track_steps=track_steps)

    nb = bsize[0] * bsize[1] * bsize[2]
    out_block = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    fixed = lambda i: (0, 0)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # cam
            pl.BlockSpec((1, 128), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec(occw.shape, fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 128), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=[out_block] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * tile_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles * tile_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * tile_rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(cam16, occb, occw, matw, pal)


@functools.partial(
    jax.jit,
    static_argnames=("bsize", "vpu", "tile_rows", "fine_iters",
                     "vote_rounds", "fine_unroll", "track_steps",
                     "interpret"))
def trace_rays_indep(o_l, d_l, occb, occw, matw, *, bsize, vpu, tile_rows=8,
                     fine_iters=24, vote_rounds=64, fine_unroll=6,
                     track_steps=False, interpret=False):
    """Ray-list twin (shadow/bounce wavefronts) of render_indep_tiles.

    Unlike mega.trace_rays there is no *direction-dependent* residue (any
    ray direction traces); lanes can still come back resolved=False when an
    outer iteration sees more than `vote_rounds` distinct occupied bricks
    or `fine_iters` is exhausted.  Returns dict of (N,) arrays: t, mat, ax,
    steps, resolved.
    """
    n = o_l.shape[0]
    tile = tile_rows * LANES
    assert n % tile == 0, f"{n} rays not a multiple of {tile}"
    n_tiles = n // tile
    comps = [o_l[:, i].reshape(n_tiles * tile_rows, LANES) for i in range(3)]
    comps += [d_l[:, i].reshape(n_tiles * tile_rows, LANES)
              for i in range(3)]

    kernel = _make_indep_kernel(
        bsize, vpu, tile_rows=tile_rows, tile_w=128, nx_tiles=n_tiles,
        fine_iters=fine_iters, vote_rounds=vote_rounds, sky_mode="none",
        shading="trace", ambient=0.0, fine_unroll=fine_unroll,
        track_steps=track_steps, ray_source="refs")

    cam = jnp.zeros((29,), jnp.float32)
    pal = jnp.zeros((8, 128), jnp.float32)
    block = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    fixed = lambda i: (0, 0)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *([block] * 6),
            pl.BlockSpec((1, 128), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec(occw.shape, fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec(matw.shape, fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=[block] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * tile_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles * tile_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * tile_rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(cam, *comps, occb, occw, matw, pal)
    _, t, aux = outs
    t = t.reshape(n)
    aux = aux.reshape(n)
    return dict(
        t=t,
        mat=aux & 255,
        ax=(aux >> AUX_AX_SHIFT) & 7,
        steps=(aux >> AUX_STEPS_SHIFT) & 0x7ffff,
        resolved=((aux >> AUX_RESOLVED_SHIFT) & 1).astype(bool),
    )


# ---------------------------------------------------------------------------
# Host-side wrapper (render_mega twin)
# ---------------------------------------------------------------------------

def occb_of(tables) -> jnp.ndarray:
    """Brick-bitmap row for a MegaTables bundle."""
    return pack_brickbits(np.asarray(tables.occ))


def render_indep(mv, camera, width, height, *, sun_dir=None, sun_scale=1.0,
                 sky_mode="analytic", shading="flat", ambient=0.2,
                 tile_rows=8, tile_w=32, fine_iters=24, vote_rounds=64,
                 sky_const=(0.0, 0.0, 0.0), fine_unroll=6, track_steps=True,
                 interpret=False):
    """Fused flat/lambert frame via the independent DDA (render_mega twin:
    same AOV dict).  `mv` is a mega.MegaVolume; the brick bitmap row is
    derived (and cached) from its tables."""
    from voxel_tracer_tpu.models.scene import SUN_DIR
    from voxel_tracer_tpu.ops.pallas.mega import mega_camera, untile

    occb = getattr(mv, "_occb", None)
    if occb is None or getattr(mv, "_occb_src", None) is not mv.tables:
        occb = occb_of(mv.tables)
        mv._occb = occb
        mv._occb_src = mv.tables

    sd = jnp.asarray(SUN_DIR if sun_dir is None else sun_dir, jnp.float32)
    cam_p = mega_camera(mv, camera, sd, width, height, sun_scale, sky_const)
    tb = mv.tables
    tile_h = tile_rows * LANES // tile_w
    wp = -(-width // tile_w) * tile_w
    hp = -(-height // tile_h) * tile_h
    rgba, t, aux = render_indep_tiles(
        cam_p, occb, tb.occw, tb.matw, mv.pal, bsize=tb.bsize, vpu=tb.vpu,
        width=wp, height=hp, tile_rows=tile_rows, tile_w=tile_w,
        fine_iters=fine_iters, vote_rounds=vote_rounds, sky_mode=sky_mode,
        shading=shading, ambient=ambient, fine_unroll=fine_unroll,
        track_steps=track_steps, interpret=interpret)
    n = wp * hp
    rgba = untile(rgba.reshape(n), hp, wp, tile_h, tile_w)
    t = untile(t.reshape(n), hp, wp, tile_h, tile_w)
    aux = untile(aux.reshape(n), hp, wp, tile_h, tile_w)
    img = jnp.stack([(rgba >> s) & 255 for s in (0, 8, 16)],
                    axis=-1).astype(jnp.uint8)
    out = dict(
        image=img.reshape(hp, wp, 3),
        depth=t.reshape(hp, wp),
        mat=(aux & 255).reshape(hp, wp),
        steps=((aux >> AUX_STEPS_SHIFT) & 0x7ffff).reshape(hp, wp),
        resolved=((aux >> AUX_RESOLVED_SHIFT) & 1).reshape(hp, wp),
    )
    if (wp, hp) != (width, height):
        out = {kk: vv[:height, :width] for kk, vv in out.items()}
    return out
