"""Kernel-backed full-material (Whitted) pipeline.

The reference's default frame runs the complete material system — mirror,
glass (Beer + Fresnel + internal reflections), sphere area lights, sun,
ambient — per pixel on the hot path (renderer.cpp:199-223 ->
materials.cpp:15-48).  Here the SAME wavefront shading math as
`ops/shading.py:shade_full` runs with every traversal routed through the
fused Pallas megakernel instead of the XLA state-machine DDA:

  - plain nearest-hit        -> `trace_rays` on the full hier3 tables
  - glass interior march     -> `trace_rays` on INVERTED tables (occupied
    (medium semantics,          = voxel != medium): the first differing
    vv.cpp:166-232)             voxel IS the interior exit; a kernel miss
                                = grid exit -> analytic OBB exit (slab
                                tmax), reproducing vv.cpp:206-232
  - scan rays (ignore_medium -> exact two-trace decomposition: trace the
    semantics, vv.cpp:328-335)  inverted tables to the first non-medium
                                voxel; if it is air ("exited"), continue
                                on the FULL tables from inside that voxel
                                (after air, any solid hits — incl. the
                                medium itself)
  - stochastic glass shadows -> bounded re-trace rounds on the full
    (vv.cpp:314-327)            tables: each round stops at the next
                                solid voxel, rolls the SAME
                                `dda.hash_shadow` at that cell, and
                                either occludes or advances past it —
                                the exact per-voxel roll sequence of the
                                wavefront DDA up to `shadow_rounds` voxels

Materials/normals are post-processed in XLA from the kernel's (t, ax)
outputs (one grid gather per hit) — no in-kernel material vote needed, so
every trace runs the cheap `fetch_mat=False` configuration.

`MegaIntersector` is composite-compatible (`intersect_scene` /
`march_interior` / `is_occluded`), so `renderer.render_rays(...,
isect=MegaIntersector(...))` runs the full Whitted shader unchanged on
the kernel backend — parity with the XLA wavefront by construction, up to
traversal FP boundary flips.

Single-volume intersector; dynamic multi-volume scenes (moving/rotating
objects) compose per-volume instances via `ops/pallas/multi.py`;
static aligned scenes can instead merge via
`renderer_fast.bake_aligned_scene`.

With ``exact_fallback=True`` the kernel's unresolvable residue — rays
fighting their tile's majority axis after every resolve pass, and
shadow walks truncated at `shadow_rounds` — re-traces on the exact XLA
wavefront DDA (compacted, inside the same jit), eliminating the
miss/unoccluded degradation class entirely (vv.cpp:314-335 exact
semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from voxel_tracer_tpu.ops.composite import HitResult, _to_local
from voxel_tracer_tpu.ops.dda import hash_shadow
from voxel_tracer_tpu.ops.math3d import BIG_F32
from voxel_tracer_tpu.ops.pallas import mega
from voxel_tracer_tpu.ops.pallas.mega import (
    pack_mega16, pack_mega16_axes, trace_rays)

LANES = 128


def _pad_rays(o_l, d_l, tile):
    """Pad a local-space ray list to a tile multiple with instant
    slab-reject rays (far origin, +z)."""
    n = o_l.shape[0]
    pad = (-n) % tile
    if pad:
        o_l = jnp.concatenate(
            [o_l, jnp.full((pad, 3), 1e6, jnp.float32)], axis=0)
        d_l = jnp.concatenate(
            [d_l, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
                           (pad, 1))], axis=0)
    return o_l, d_l, n


class MegaIntersector:
    """Megakernel traversal backend for the full-material wavefront.

    Packs hier3 span-scan tables for the volume plus one inverted table
    set per glass material id present (ids 1..8, materials.h:8-10) for
    medium/scan semantics.
    """

    def __init__(self, mv: mega.MegaVolume, *, tile_rows=8, fine_iters=48,
                 fine_unroll=4, max_bricks_per_tile=64, shadow_rounds=4,
                 block_hw=None, resolve_passes=2, compact=False,
                 list_tile_rows=None, exact_fallback=False,
                 interpret=False):
        self.mv = mv
        vol = mv.volume
        self.grid_j = jnp.asarray(vol.grid.astype(np.int32))
        self.pal_j = jnp.asarray(vol.palette.astype(np.float32))
        self.vpu = float(vol.vpu)
        gz, gy, gx = vol.grid.shape
        self.vsize_l = jnp.asarray(
            np.array([gx, gy, gz], np.float32) / self.vpu)
        self.gsize = jnp.asarray(np.array([gx, gy, gz], np.int32))
        self.rot, self.pos, self.pivot = mv.rot, mv.pos, mv.pivot
        self.tile_rows = tile_rows
        # Compacted/scattered ray lists converge per-tile: a 16384-ray
        # tile (tile_rows=128, right for blocked full-frame lists) makes
        # every lane march until the tile's slowest ray finishes.  Short
        # incoherent lists want small tiles.
        self.list_tile_rows = (tile_rows if list_tile_rows is None
                               else list_tile_rows)
        self.fine_iters = fine_iters
        self.fine_unroll = fine_unroll
        self.max_bricks = max_bricks_per_tile
        self.shadow_rounds = shadow_rounds
        # A tile's march axis is chosen per tile, so rays fighting their
        # tile's majority axis defer (resolved=False) — ~36% of a
        # RANDOM-direction list (ambient rays).  Each extra resolve pass
        # re-traces only the still-unresolved rays (others parked), whose
        # own majority picks the next axis: 2 passes leave ~1/9
        # incoherent rays unresolved, 3 leave ~none.  Unresolved rays
        # degrade to miss/unoccluded (a light leak, never a false hit).
        self.resolve_passes = resolve_passes
        # Compact the still-live shadow-ray set between stochastic
        # rounds (rounds >= 2 process only rays that transmitted through
        # a glass/mirror voxel — a few percent of the list).
        self.compact = compact
        # Route the kernel's unresolvable residue — rays still fighting
        # their tile's majority axis after every resolve pass, and
        # shadow rays deeper than `shadow_rounds` voxels — through the
        # exact XLA wavefront DDA inside the same jit (compacted), so
        # the miss/unoccluded degradation (a light leak) never happens.
        self.exact_fallback = exact_fallback
        self.grid_dda = self.grid_j                  # (Z, Y, X) int32
        self.brick_occ_j = jnp.asarray(
            np.asarray(vol.brick_occ).astype(np.int32))
        self.interpret = interpret
        # Square-block ray ordering (same trick as the lambert pipeline's
        # shadow_block): when a ray list is a full H x W wavefront in
        # raster order, reorder it so each kernel tile is a square pixel
        # block — hit-point origins stay spatially tight and the
        # per-slice footprint rects shrink.  block_hw=(H, W).
        self.block = None
        if block_hw is not None:
            h, w = block_hw
            area = tile_rows * LANES
            th = int(np.sqrt(area))
            while th > 1 and (h % th or area % th or w % (area // th)):
                th //= 2
            if th > 1 and h % th == 0 and w % (area // th) == 0:
                self.block = (h, w, th, area // th)

        # full-grid hier3 tables (shared with the lambert/flat pipelines)
        self.full_tables = (mv.occ16, mv.ensure_axes())
        self.bsize16 = mv.bsize16
        self.mat_bsize = mv.tables.bsize
        # 8^3 material words for the in-kernel tile-end vote: XLA-side
        # dynamic gathers of the grid at 1M hit cells measured ~15 ms
        # each; the kernel's vote resolves the same byte nearly free.
        # The SAME table serves inverted-table traces — the hit voxel's
        # ORIGINAL material is exactly what medium/scan semantics need
        # (air = 0 at interior exits).
        self.matw_j = mv.tables.matw

        # inverted tables per glass id present (occupied = voxel != id)
        self.glass_ids = sorted(
            int(g) for g in np.unique(vol.grid) if 1 <= g <= 8)
        self.inv_tables = {}
        for g in self.glass_ids:
            inv = (vol.grid != g).astype(np.uint8)
            occ16, _occw16, bs = pack_mega16(inv)
            assert bs == self.bsize16
            self.inv_tables[g] = (occ16, pack_mega16_axes(inv))

    # -- dynamic state ------------------------------------------------------

    def set_voxel(self, x, y, z, val):
        """O(1) dynamic edit across every packed kernel table
        (vv.cpp:377-432 / Enemy::process_hit carving): updates the
        MegaVolume device tables and re-points this intersector's
        handles.  Glass inverted tables are re-packed only when the
        volume actually carries glass ids (drones don't)."""
        self.mv.set_voxel(x, y, z, val)
        self.full_tables = (self.mv.occ16, self.mv.ensure_axes())
        self.matw_j = self.mv.tables.matw
        self.grid_j = self.grid_j.at[z, y, x].set(jnp.int32(val))
        self.grid_dda = self.grid_j
        self.brick_occ_j = jnp.asarray(
            np.asarray(self.mv.volume.brick_occ).astype(np.int32))
        self._repack_inv()

    def refresh_tables(self):
        """Re-point the handles after a bulk `mv.refresh()` (model
        reload on enemy respawn, enemy.cpp:60-63).  Table shapes are
        unchanged, so jitted frames taking `table_state()` as arguments
        never retrace."""
        self.full_tables = (self.mv.occ16, self.mv.ensure_axes())
        self.matw_j = self.mv.tables.matw
        self.grid_j = jnp.asarray(
            self.mv.volume.grid.astype(np.int32))
        self.grid_dda = self.grid_j
        self.brick_occ_j = jnp.asarray(
            np.asarray(self.mv.volume.brick_occ).astype(np.int32))
        self._repack_inv()

    def _repack_inv(self):
        for g in self.glass_ids:
            inv = (np.asarray(self.mv.volume.grid) != g).astype(np.uint8)
            occ16, _occw16, _bs = pack_mega16(inv)
            self.inv_tables[g] = (occ16, pack_mega16_axes(inv))

    def table_state(self):
        """The per-frame-dynamic device arrays (for passing as traced
        jit arguments so edits don't retrace)."""
        return (self.full_tables[0], self.full_tables[1], self.matw_j,
                self.grid_j, self.brick_occ_j)

    def with_table_state(self, st):
        import copy
        v2 = copy.copy(self)
        v2.full_tables = (st[0], st[1])
        v2.matw_j = st[2]
        v2.grid_j = st[3]
        v2.grid_dda = st[3]
        v2.brick_occ_j = st[4]
        return v2

    # -- low-level ---------------------------------------------------------

    def _dda_fallback(self, need, o_l, d_l, medium=None, shadow_seed=None):
        """Exact XLA wavefront DDA (vv.cpp:127-369 semantics) on the
        compacted ``need`` subset — the escape hatch for rays the tiled
        kernel cannot resolve.  Returns full-size dict(ok, t, mat, ax,
        steps); ``medium`` (python int) switches to the interior-exit
        march on that id (vv.cpp:166-232); ``shadow_seed`` enables the
        exact stochastic shadow walk (vv.cpp:314-327)."""
        from voxel_tracer_tpu.ops import dda
        from voxel_tracer_tpu.ops.compact import bucket_caps, masked_apply

        n = o_l.shape[0]
        extra = () if shadow_seed is None else (shadow_seed,)

        def run(lv, _idx, o_g, d_g, *ex):
            o_p = jnp.where(lv[:, None], o_g, 1e6)
            d_p = jnp.where(lv[:, None], d_g,
                            jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
            kw = {}
            if medium is not None:
                kw["medium"] = jnp.full((o_g.shape[0],), medium, jnp.int32)
            if shadow_seed is not None:
                kw["shadow"] = True
                kw["shadow_seed"] = ex[0]
            r = dda.intersect_volume_local(
                self.grid_dda, self.brick_occ_j, o_p, d_p, self.vpu, **kw)
            sgn_k = jnp.take_along_axis(
                r["step_sign"], r["axis"][:, None], axis=1)[:, 0]
            ax = r["axis"] * 2 + (sgn_k > 0).astype(jnp.int32)
            ok = lv & (r["t"] < BIG_F32)
            return (ok, jnp.where(ok, r["t"], BIG_F32),
                    jnp.where(ok, r["mat"].astype(jnp.int32), 0), ax,
                    r["steps"])

        fill = (jnp.zeros((n,), bool), jnp.full((n,), BIG_F32),
                jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32),
                jnp.zeros((n,), jnp.int32))
        ok, t, mat, ax, steps = masked_apply(
            need, run, (o_l, d_l) + extra, fill,
            bucket_caps(n, (1 / 16,)))
        return dict(ok=ok, t=t, mat=mat, ax=ax, steps=steps)

    def _trace(self, o_l, d_l, tables, fetch=False, fallback_medium=None):
        """trace_rays on (occ16, occw3) hier3 tables; returns dict with
        t/ax/steps/resolved of the ORIGINAL (unpadded) ray count.
        fetch=True resolves the hit voxel's ORIGINAL material in-kernel
        (tile-end vote against the 8^3 matw table) as res["mat"].
        With ``exact_fallback`` the still-unresolved residue is re-traced
        by the exact XLA DDA and merged as resolved; inverted-table
        callers pass ``fallback_medium`` = their glass id so the
        fallback runs the matching interior-exit semantics."""
        occ16, occw3 = tables
        blocked = (self.block is not None
                   and o_l.shape[0] == self.block[0] * self.block[1])
        if blocked:
            from voxel_tracer_tpu.ops.pallas.diffint import tile_raster
            h, w, th, tw = self.block
            o_l = tile_raster(o_l, h, w, th, tw)
            d_l = tile_raster(d_l, h, w, th, tw)
        tr = self.tile_rows if blocked else self.list_tile_rows
        o_p, d_p, n = _pad_rays(o_l, d_l, tr * LANES)

        matw = self.matw_j if fetch else jnp.zeros((1, 128), jnp.int32)

        def one_pass(o_in, d_in):
            r = trace_rays(
                o_in, d_in, occ16, occw3, jnp.zeros((1, 1), jnp.int32),
                matw, bsize=self.bsize16,
                vpu=self.vpu, tile_rows=tr,
                max_bricks_per_tile=self.max_bricks,
                fine_iters=self.fine_iters, fetch_mat=fetch,
                fine_unroll=self.fine_unroll, brick=16,
                mat_bsize=self.mat_bsize, traversal="hier3",
                interpret=self.interpret)
            return r

        res = one_pass(o_p, d_p)
        for _ in range(self.resolve_passes - 1):
            un = ~res["resolved"]
            o2 = jnp.where(un[:, None], o_p, 1e6)
            d2 = jnp.where(un[:, None],
                           d_p, jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
            r2 = one_pass(o2, d2)
            take = un & r2["resolved"]
            res = {k: jnp.where(take, r2[k], v) for k, v in res.items()}
        res = {k: v[:n] for k, v in res.items()}
        if blocked:
            from voxel_tracer_tpu.ops.pallas.diffint import untile_raster
            h, w, th, tw = self.block
            res = {k: untile_raster(v, h, w, th, tw)
                   for k, v in res.items()}
        if self.exact_fallback:
            need = ~res["resolved"]
            fb = self._dda_fallback(need, o_l, d_l,
                                    medium=fallback_medium)
            res = dict(
                t=jnp.where(need,
                            jnp.where(fb["ok"], fb["t"], mega.BIG),
                            res["t"]),
                mat=jnp.where(need, fb["mat"], res["mat"]),
                ax=jnp.where(need, fb["ax"], res["ax"]),
                steps=res["steps"] + jnp.where(need, fb["steps"], 0),
                resolved=res["resolved"] | need,
            )
        return res

    def _hit_cell(self, o_l, d_l, t, ax):
        """Voxel cell of a kernel hit from (t, axis, step sign).

        On the hit axis the intersection point sits exactly on a voxel
        boundary: take the boundary voxel in the step direction.  Rays
        that START inside a solid voxel (t = 0 entry hits away from any
        boundary) fall back to plain floor."""
        p = (o_l + d_l * t[:, None]) * self.vpu
        k = (ax >> 1).astype(jnp.int32)
        s = jnp.where((ax & 1) == 1, 1, -1)         # normal = -step sign
        base = jnp.floor(p).astype(jnp.int32)
        bk = jnp.take_along_axis(p, k[:, None], axis=1)[:, 0]
        nearest = jnp.round(bk)
        on_boundary = jnp.abs(bk - nearest) < 1e-3
        idx_k = jnp.where(on_boundary,
                          jnp.where(s > 0, nearest, nearest - 1.0),
                          jnp.floor(bk)).astype(jnp.int32)
        onehot = jax.nn.one_hot(k, 3, dtype=jnp.int32)
        cell = base * (1 - onehot) + idx_k[:, None] * onehot
        return jnp.clip(cell, 0, self.gsize - 1), s

    def _gather_mat(self, cell):
        gz, gy, gx = self.grid_j.shape
        flat = (cell[:, 2] * (gy * gx) + cell[:, 1] * gx + cell[:, 0])
        return jnp.take(self.grid_j.reshape(-1), flat, mode="clip")

    def _normal(self, ax):
        k = (ax >> 1).astype(jnp.int32)
        sgn = jnp.where((ax & 1) == 1, -1.0, 1.0)
        n_local = jax.nn.one_hot(k, 3, dtype=jnp.float32) * sgn[:, None]
        return n_local @ self.rot.T

    def _to_local(self, origins, dirs):
        return _to_local(self.rot, self.pos, self.pivot, origins, dirs)

    def _exit_slab(self, o_l, d_l):
        """Analytic OBB exit: per-axis exit t of the local box + the
        reference's tmax-ladder axis (vv.cpp:206-225, obb.cpp:82-106)."""
        safe_d = jnp.where(jnp.abs(d_l) < 1e-12,
                          jnp.where(d_l < 0, -1e-12, 1e-12), d_l)
        hi = jnp.where(d_l >= 0, self.vsize_l, 0.0)
        t3 = (hi - o_l) / safe_d
        t3 = jnp.where(jnp.abs(d_l) < 1e-12, BIG_F32, t3)
        tx, ty, tz = t3[:, 0], t3[:, 1], t3[:, 2]
        use_x = (tx < ty) & (tx < tz)
        use_y = (~(tx < ty)) & (ty < tz)
        axis = jnp.where(use_x, 0, jnp.where(use_y, 1, 2)).astype(jnp.int32)
        t_exit = jnp.minimum(jnp.minimum(tx, ty), tz)
        return t_exit, axis

    def _volume_hit(self, o_l, d_l, res, obj_val=0):
        """Kernel trace dict -> world-space HitResult (materials resolved
        in-kernel by the tile-end vote, albedo via palette take)."""
        ok = (res["t"] < mega.BIG) & res["resolved"]
        t = jnp.where(ok, res["t"], BIG_F32)
        mat = jnp.where(ok, res["mat"], 0)
        normal = self._normal(res["ax"])
        albedo = jnp.take(self.pal_j, jnp.clip(mat, 0, 255), axis=0)
        return HitResult(
            t=t,
            mat=mat,
            normal=jnp.where(ok[:, None], normal, 0.0),
            albedo=jnp.where(ok[:, None], albedo, 0.0),
            steps=res["steps"],
            obj=jnp.where(ok, obj_val, -1),
        )

    # -- composite-compatible API -----------------------------------------

    def intersect_scene(self, scene, origins, dirs, max_candidates=4,
                        max_steps=None, ignore=None, shadow_seed=None,
                        shadow=False) -> HitResult:
        from voxel_tracer_tpu.ops.prims import intersect_prims

        if shadow:
            best = self._shadow_trace(origins, dirs, shadow_seed)
        else:
            o_l, d_l = self._to_local(origins, dirs)
            best = self._volume_hit(o_l, d_l, self._trace(
                o_l, d_l, self.full_tables, fetch=True))
            if ignore is not None and self.glass_ids:
                for g in self.glass_ids:
                    scan = self._scan_trace(o_l, d_l, g)
                    sel = ignore == g
                    best = HitResult(
                        t=jnp.where(sel, scan.t, best.t),
                        mat=jnp.where(sel, scan.mat, best.mat),
                        normal=jnp.where(sel[:, None], scan.normal,
                                         best.normal),
                        albedo=jnp.where(sel[:, None], scan.albedo,
                                         best.albedo),
                        steps=jnp.where(sel, scan.steps, best.steps),
                        obj=jnp.where(sel, scan.obj, best.obj),
                    )

        prim = intersect_prims(scene.prims, origins, dirs)
        if prim is not None:
            t, mat, normal, albedo = prim
            best = best.nearer(HitResult(
                t=t, mat=mat, normal=normal, albedo=albedo,
                steps=jnp.zeros_like(mat),
                obj=jnp.where(t < BIG_F32, -2, -1)))
        return best

    def _scan_trace(self, o_l, d_l, g) -> HitResult:
        """Exact ignore_medium scan semantics for medium id ``g``
        (vv.cpp:328-335): pass through g-voxels until the first non-g
        voxel; if that voxel is air, the ray has "exited" and ANY solid
        voxel from there on hits (including g again)."""
        resB = self._trace(o_l, d_l, self.inv_tables[g], fetch=True,
                           fallback_medium=g)
        okB = (resB["t"] < mega.BIG) & resB["resolved"]
        vB = resB["mat"]
        solidB = okB & (vB > 0)
        air_at = okB & (vB == 0)

        # continuation from just inside the air voxel on the FULL tables
        eps = jnp.float32(1e-3 / self.vpu)
        oC = o_l + d_l * (resB["t"] + eps)[:, None]
        # rays that already resolved don't need the second trace: park
        # them far away so the slab rejects instantly
        oC = jnp.where(air_at[:, None], oC, 1e6)
        resC = self._trace(oC, d_l, self.full_tables, fetch=True)
        okC = (resC["t"] < mega.BIG) & resC["resolved"]
        vC = resC["mat"]

        hit = solidB | (air_at & okC)
        t = jnp.where(solidB, resB["t"],
                      jnp.where(air_at & okC, resB["t"] + eps + resC["t"],
                                BIG_F32))
        mat = jnp.where(solidB, vB, jnp.where(air_at & okC, vC, 0))
        ax = jnp.where(solidB, resB["ax"], resC["ax"])
        normal = self._normal(ax)
        albedo = jnp.take(self.pal_j, jnp.clip(mat, 0, 255), axis=0)
        return HitResult(
            t=t,
            mat=jnp.where(hit, mat, 0),
            normal=jnp.where(hit[:, None], normal, 0.0),
            albedo=jnp.where(hit[:, None], albedo, 0.0),
            steps=resB["steps"] + resC["steps"],
            obj=jnp.where(hit, 0, -1),
        )

    def _shadow_trace(self, origins, dirs, shadow_seed) -> HitResult:
        """Stochastic shadow semantics (vv.cpp:314-327): ids > 16 occlude;
        glass/mirror voxels occlude with p = 0.15 per voxel.  Each round
        advances exactly one solid voxel, rolling `hash_shadow` at its
        cell — the same roll sequence as the wavefront DDA, truncated at
        `shadow_rounds` voxels (deeper rays count as transmitted; the
        truncation error is p_pass^rounds ~ 0.5 at 4 rounds per extra
        voxel, and glass walls in the test scenes are thin)."""
        o_l, d_l = self._to_local(origins, dirs)
        n = o_l.shape[0]
        shadow_seed = jnp.broadcast_to(
            jnp.asarray(shadow_seed, jnp.uint32), (n,))
        state0 = (o_l, d_l, shadow_seed,
                  jnp.ones((n,), bool),                     # live
                  jnp.zeros((n,), jnp.float32),             # t_base
                  jnp.full((n,), BIG_F32, jnp.float32),     # hit_t
                  jnp.zeros((n,), jnp.int32),               # hit_mat
                  jnp.zeros((n,), jnp.int32),               # hit_ax
                  jnp.zeros((n,), jnp.int32))               # steps

        if self.compact and self.shadow_rounds > 1 and n >= 4 * 16384:
            from voxel_tracer_tpu.ops.compact import (bucket_caps,
                                                      masked_apply)
            st = self._shadow_rounds(state0, 1)
            o_c, d_c, sd_c, live, t_base, hit_t, hit_mat, hit_ax, steps = st

            def tail(lv, _idx, *gathered):
                o_g, d_g, sd_g, tb_g, ht_g, hm_g, ha_g, st_g = gathered
                o_p = jnp.where(lv[:, None], o_g, 1e6)
                d_p = jnp.where(lv[:, None], d_g,
                                jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
                r = self._shadow_rounds(
                    (o_p, d_p, sd_g, lv, tb_g, ht_g, hm_g, ha_g, st_g),
                    self.shadow_rounds - 1)
                return self._shadow_finish(r)

            hit_t, hit_mat, hit_ax, steps = masked_apply(
                live, tail,
                (o_c, d_c, sd_c, t_base, hit_t, hit_mat, hit_ax, steps),
                (hit_t, hit_mat, hit_ax, steps),
                bucket_caps(n, (1 / 16, 1 / 4)))
        else:
            st = self._shadow_rounds(state0, self.shadow_rounds)
            hit_t, hit_mat, hit_ax, steps = self._shadow_finish(st)

        ok_any = hit_t < BIG_F32
        normal = self._normal(hit_ax)
        # albedo of an occluder is never read by the shader — skip the
        # palette gather
        return HitResult(
            t=hit_t,
            mat=jnp.where(ok_any, hit_mat, 0),
            normal=jnp.where(ok_any[:, None], normal, 0.0),
            albedo=jnp.zeros((n, 3), jnp.float32),
            steps=steps,
            obj=jnp.where(ok_any, 0, -1),
        )

    def _shadow_rounds(self, state, rounds):
        """Run ``rounds`` stochastic-shadow rounds from ``state``
        (see `_shadow_trace`); each round advances live rays exactly one
        solid voxel.  Pure function of its state tuple so `_shadow_trace`
        can compact the still-live set between rounds."""
        o_cur, d_l, shadow_seed, live, t_base, hit_t, hit_mat, hit_ax, \
            steps = state
        n = o_cur.shape[0]
        eps = jnp.float32(1e-3 / self.vpu)
        for _ in range(rounds):
            res = self._trace(o_cur, d_l, self.full_tables, fetch=True)
            ok = (res["t"] < mega.BIG) & res["resolved"]
            steps = steps + jnp.where(live, res["steps"], 0)
            cell, _s = self._hit_cell(o_cur, d_l, res["t"], res["ax"])
            v = res["mat"]
            rnd = hash_shadow(shadow_seed, cell)
            occl_now = live & ok & ((v > 16) | (rnd > 0.85))
            hit_t = jnp.where(occl_now, t_base + res["t"], hit_t)
            hit_mat = jnp.where(occl_now, v, hit_mat)
            hit_ax = jnp.where(occl_now, res["ax"], hit_ax)

            # transmit: advance just past the far side of this voxel
            cont = live & ok & ~occl_now
            p = o_cur + d_l * res["t"][:, None]
            safe_d = jnp.where(jnp.abs(d_l) < 1e-12, 1e-12, d_l)
            far = (cell + jnp.where(d_l >= 0, 1, 0)
                   ).astype(jnp.float32) / self.vpu
            t3 = (far - p) / safe_d
            t3 = jnp.where(jnp.abs(d_l) < 1e-12, BIG_F32, t3)
            dt = jnp.maximum(jnp.min(t3, axis=-1), 0.0) + eps
            adv = res["t"] + dt
            o_cur = jnp.where(cont[:, None], p + d_l * dt[:, None],
                              jnp.full((n, 3), 1e6, jnp.float32))
            t_base = t_base + jnp.where(cont, adv, 0.0)
            live = cont
        return (o_cur, d_l, shadow_seed, live, t_base, hit_t, hit_mat,
                hit_ax, steps)

    def _shadow_finish(self, st):
        """Close out a shadow walk: rays still live after the last round
        previously counted as TRANSMITTED (truncation bias).  With
        `exact_fallback` they continue on the exact XLA shadow DDA from
        their current position — `hash_shadow` keys on the voxel CELL,
        so the continuation's roll sequence is exactly what the
        untruncated walk would have rolled."""
        o_cur, d_l, seed, live, t_base, hit_t, hit_mat, hit_ax, steps = st
        if not self.exact_fallback:
            return hit_t, hit_mat, hit_ax, steps
        fb = self._dda_fallback(live, o_cur, d_l, shadow_seed=seed)
        occ = live & fb["ok"]
        hit_t = jnp.where(occ, t_base + fb["t"], hit_t)
        hit_mat = jnp.where(occ, fb["mat"], hit_mat)
        hit_ax = jnp.where(occ, fb["ax"], hit_ax)
        steps = steps + jnp.where(live, fb["steps"], 0)
        return hit_t, hit_mat, hit_ax, steps

    def march_interior(self, scene, obj, origins, dirs, medium,
                       max_steps=None) -> HitResult:
        """Interior exit march (medium semantics, vv.cpp:166-232): trace
        the inverted tables of each glass id — the first occupied voxel
        there IS the first voxel differing from the medium.  A kernel
        miss is the grid exit -> analytic OBB exit with material air."""
        o_l, d_l = self._to_local(origins, dirs)
        n = o_l.shape[0]
        t_exit, exit_axis = self._exit_slab(o_l, d_l)
        # default: exit at the OBB exit plane with material air; rays
        # whose slab misses entirely exit at t = 0 (vv.cpp:228-232)
        from voxel_tracer_tpu.ops import dda as _dda
        tmin, tmax, _eax, slab_ok = _dda.slab_test(o_l, d_l, self.vsize_l)
        base_t = jnp.where(slab_ok, jnp.maximum(t_exit, 0.0), 0.0)
        step_sign = jnp.where(
            jnp.take_along_axis(d_l, exit_axis[:, None], axis=1)[:, 0] >= 0,
            1.0, -1.0)
        n_local = jax.nn.one_hot(exit_axis, 3, dtype=jnp.float32) \
            * (-step_sign)[:, None]
        base_normal = n_local @ self.rot.T

        t = base_t
        mat = jnp.zeros((n,), jnp.int32)
        normal = base_normal
        steps = jnp.zeros((n,), jnp.int32)
        for g in self.glass_ids:
            sel = medium == g
            res = self._trace(o_l, d_l, self.inv_tables[g], fetch=True,
                              fallback_medium=g)
            ok = (res["t"] < mega.BIG) & res["resolved"]
            v = res["mat"]
            g_normal = self._normal(res["ax"])
            t = jnp.where(sel & ok, res["t"], t)
            mat = jnp.where(sel & ok, v, mat)
            normal = jnp.where((sel & ok)[:, None], g_normal, normal)
            steps = steps + jnp.where(sel, res["steps"], 0)

        # interior-exit albedo is never read (Beer absorption uses the
        # ENTRY surface albedo) — skip the palette gather
        albedo = jnp.zeros((n, 3), jnp.float32)
        return HitResult(t=t, mat=mat, normal=normal, albedo=albedo,
                         steps=steps, obj=obj)

    def is_occluded(self, scene, origins, dirs, tmax, max_candidates=4,
                    max_steps=None, shadow_seed=None):
        hit = self.intersect_scene(
            scene, origins, dirs, max_candidates, max_steps,
            shadow_seed=shadow_seed, shadow=shadow_seed is not None)
        return hit.t < tmax, hit


# ---------------------------------------------------------------------------
# Whole-frame wrapper: fused primary pass + kernel-backed full shading
# ---------------------------------------------------------------------------

def primary_hit_mega(isect: MegaIntersector, camera, width, height, *,
                     tile_rows=8, tile_w=32):
    """Fused camera-mode primary pass (render_mega_tiles shading='raw')
    -> world-space HitResult + the matching wavefront rays."""
    from voxel_tracer_tpu.models.camera import primary_rays
    from voxel_tracer_tpu.models.scene import SUN_DIR

    mv = isect.mv
    sd = jnp.asarray(SUN_DIR, jnp.float32)
    tile_h = tile_rows * LANES // tile_w
    wp = -(-width // tile_w) * tile_w
    hp = -(-height // tile_h) * tile_h
    # camera params use the REAL dims; padded pixels extrapolate outside
    # the frustum (same convention as render_lambert_mega)
    cam_p = mega.mega_camera(mv, camera, sd, width, height)
    _rgba, t, aux = mega.render_mega_tiles(
        cam_p, mv.occ16, isect.full_tables[1], jnp.zeros((1, 1), jnp.int32),
        isect.matw_j, mv.pal, bsize=isect.bsize16,
        vpu=isect.vpu, width=wp, height=hp, tile_rows=tile_rows,
        tile_w=tile_w, sky_mode="none", shading="trace", fetch_mat=True,
        fine_iters=isect.fine_iters, fine_unroll=isect.fine_unroll,
        track_steps=True, brick=16, mat_bsize=isect.mat_bsize,
        traversal="hier3", interpret=isect.interpret)
    npix = wp * hp
    t = mega.untile(t.reshape(npix), hp, wp, tile_h, tile_w)
    aux = mega.untile(aux.reshape(npix), hp, wp, tile_h, tile_w)
    if (wp, hp) != (width, height):
        t = t.reshape(hp, wp)[:height, :width].reshape(-1)
        aux = aux.reshape(hp, wp)[:height, :width].reshape(-1)

    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32),
                          indexing="ij")
    origins, dirs = primary_rays(camera, xs, ys, width, height)
    origins = origins.reshape(-1, 3)
    dirs = dirs.reshape(-1, 3)

    ax = (aux >> mega.AUX_AX_SHIFT) & 7
    resolved = ((aux >> mega.AUX_RESOLVED_SHIFT) & 1).astype(bool)
    ok = (t < mega.BIG) & resolved
    mat = jnp.where(ok, aux & 255, 0)   # in-kernel vote-resolved
    normal = isect._normal(ax)
    albedo = jnp.take(isect.pal_j, jnp.clip(mat, 0, 255), axis=0)
    hit = HitResult(
        t=jnp.where(ok, t, BIG_F32),
        mat=mat,
        normal=jnp.where(ok[:, None], normal, 0.0),
        albedo=jnp.where(ok[:, None], albedo, 0.0),
        steps=(aux >> mega.AUX_STEPS_SHIFT) & 0x7ffff,
        obj=jnp.where(ok, 0, -1),
    )
    return hit, origins, dirs


class WhittedMegaRenderer:
    """Stateful convenience wrapper (the kernel-backed sibling of
    `renderer.Renderer`): owns the frame counter and, with
    ``config.accumulate``, carries the temporal accumulator + previous
    view pyramid across frames (renderer.cpp:240-244, camera.cpp:3-16)."""

    def __init__(self, isect: MegaIntersector, scene, config):
        self.isect = isect
        self.scene = scene
        self.config = config
        self.frame = 0
        self._accu = None
        self._prev_planes = None

    def reset_history(self):
        self._accu = None
        self._prev_planes = None

    def render(self, camera, depth_delta: float = 0.0):
        cfg = self.config
        frame = self.frame
        self.frame = (self.frame + 1) % 120      # renderer.cpp:161-162
        if not cfg.accumulate:
            return render_whitted_mega(
                self.isect, self.scene, camera, cfg.width, cfg.height,
                frame, config=cfg)
        if self._accu is None:
            h, w = cfg.height, cfg.width
            self._accu = jnp.concatenate(
                [jnp.zeros((h, w, 3), jnp.float32),
                 jnp.full((h, w, 1), BIG_F32, jnp.float32)], axis=-1)
            self._prev_planes = camera.planes
        out = render_whitted_mega(
            self.isect, self.scene, camera, cfg.width, cfg.height, frame,
            config=cfg, prev_accu=self._accu,
            prev_planes=self._prev_planes, depth_delta=depth_delta)
        self._accu = out["accu"]
        self._prev_planes = camera.planes        # Camera::tick save
        return out


def render_whitted_mega(isect: MegaIntersector, scene, camera, width,
                        height, frame, *, config=None, tile_rows=8,
                        tile_w=32, prev_accu=None, prev_planes=None,
                        depth_delta=0.0):
    """Full-material frame on the kernel backend (renderer.cpp:199-223 +
    materials.cpp:15-48, kernel-traversed).  Returns renderer.render_rays'
    output dict (image + AOVs (+accu when config.accumulate))."""
    from voxel_tracer_tpu.renderer import RenderConfig, render_rays

    if config is None:
        config = RenderConfig(width=width, height=height, shading="full")
    frame = jnp.asarray(frame, jnp.int32)
    hit, origins, dirs = primary_hit_mega(
        isect, camera, width, height, tile_rows=tile_rows, tile_w=tile_w)
    return render_rays(scene, origins, dirs, frame, config=config,
                       isect=isect, primary_hit=hit, prev_accu=prev_accu,
                       prev_planes=prev_planes, depth_delta=depth_delta)
