"""Dynamic multi-object kernel traversal: N oriented volumes on hier3.

The reference moves and ROTATES its 4 drone volumes every frame, rebuilds
the BVH, and traces rotated OBBs in the hot loop (scene.cpp:40-43,
obb.cpp:48-134, enemy.cpp:10-43).  The single-volume kernel pipelines
require a host-side re-bake (`bake_aligned_scene`) and identity rotation,
so a moving drone forced the slow XLA wavefront.

`MultiMegaIntersector` removes that limit: each volume is traced in ITS
OWN local frame by the hier3 megakernel (`MegaIntersector`), and the
per-volume world-space hits are nearest-combined — exactly the
composite wavefront's structure (`ops/composite.py:intersect_scene`), so
parity holds by construction.  Per-frame `set_position`/`set_rotation`
becomes a pure parameter update (`with_transforms`): rot/pos enter the
jitted frame as TRACED arrays, so moving/rotating a volume costs zero
recompile and zero re-bake.

The BVH's job — don't trace rays against objects they can't hit — maps
TPU-style: a cheap XLA slab prepass against each volume's local box
masks the rays that can touch it, and `masked_apply` compacts the
volume's trace to that subset (drones cover a few % of the frame; the
glass box covers more).  This is `composite.py`'s top-K candidate idea
re-done with dense compaction instead of per-ray candidate lists.

Shadow/scan/medium semantics are inherited per volume:
  - stochastic shadows: each volume's `_shadow_trace` marches
    independently (per-volume roll sequences, like the wavefront DDA);
    results nearest-combine.
  - interior march: scoped to the entered object (obj routing), matching
    `composite.march_interior`.
  - scan rays (ignore_medium): volumes carrying the medium id run the
    exact two-trace scan; volumes without it run a plain trace (for them
    every voxel already differs from the medium).
"""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np

from voxel_tracer_tpu.ops.composite import HitResult
from voxel_tracer_tpu.ops.math3d import BIG_F32
from voxel_tracer_tpu.ops.pallas import mega
from voxel_tracer_tpu.ops.pallas.whitted import MegaIntersector


class MultiMegaIntersector:
    """Composite-compatible kernel backend for N oriented volumes.

    vols: list of `MegaIntersector` (one per volume; their packed tables
    are static — only rot/pos may change per frame via
    `with_transforms`).  compact_fracs sizes the per-volume slab-mask
    compaction buckets (None disables compaction: every volume traces
    the full list).
    """

    def __init__(self, vols, *, compact_fracs=(1 / 16, 1 / 4)):
        self.vols = list(vols)
        self.compact_fracs = compact_fracs
        # shared palette for scene-level lookups (volume 0's, like the
        # reference's per-volume palettes resolved at shading)
        self.pal_j = self.vols[0].pal_j

    # -- dynamic transforms -------------------------------------------------

    def with_transforms(self, transforms):
        """Shallow view with per-volume (rot, pos) replaced by (possibly
        traced) arrays — call INSIDE the jitted frame so per-frame motion
        is a parameter update, not a recompile (scene.cpp:40-43)."""
        return self.with_state(transforms=transforms)

    def with_state(self, transforms=None, tables=None):
        """Shallow view with per-volume transforms and/or table states
        replaced by traced arrays: the full per-frame dynamic state —
        motion AND voxel edits (laser carving) — enters the jitted frame
        as arguments, never causing a retrace."""
        out = copy.copy(self)
        out.vols = []
        for vi, v in enumerate(self.vols):
            v2 = v
            if tables is not None and tables[vi] is not None:
                v2 = v2.with_table_state(tables[vi])
            tr = None if transforms is None else transforms[vi]
            if tr is not None:
                rot, pos = tr
                if v2 is v:
                    v2 = copy.copy(v)
                v2.rot = jnp.asarray(rot, jnp.float32)
                v2.pos = jnp.asarray(pos, jnp.float32)
            out.vols.append(v2)
        return out

    def table_states(self):
        return [v.table_state() for v in self.vols]

    # -- per-volume masked trace -------------------------------------------

    def _slab_mask(self, v: MegaIntersector, origins, dirs):
        """Rays whose local-frame slab test can touch volume v."""
        from voxel_tracer_tpu.ops import dda

        o_l, d_l = v._to_local(origins, dirs)
        _tmin, _tmax, _ax, ok = dda.slab_test(o_l, d_l, v.vsize_l)
        return ok

    def _masked_volume(self, v, origins, dirs, fn, extras=()):
        """Run `fn(v, o, d, *extras) -> HitResult` on the slab-masked
        subset of the ray list, compacted (miss elsewhere).  ``extras``
        are per-ray arrays gathered alongside the rays (e.g. shadow
        seeds, ignore ids)."""
        n = origins.shape[0]
        if self.compact_fracs is None:
            return fn(v, origins, dirs, *extras)
        from voxel_tracer_tpu.ops.compact import bucket_caps, masked_apply

        mask = self._slab_mask(v, origins, dirs)

        def run(lv, _idx, o_g, d_g, *ex_g):
            o_p = jnp.where(lv[:, None], o_g, 1e6)
            d_p = jnp.where(lv[:, None], d_g,
                            jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
            h = fn(v, o_p, d_p, *ex_g)
            return (h.t, h.mat, h.normal, h.albedo, h.steps, h.obj)

        m = HitResult.miss(n)
        t, mat, nrm, alb, st, obj = masked_apply(
            mask, run, (origins, dirs) + tuple(extras),
            (m.t, m.mat, m.normal, m.albedo, m.steps, m.obj),
            bucket_caps(n, self.compact_fracs))
        return HitResult(t=t, mat=mat, normal=nrm, albedo=alb, steps=st,
                         obj=obj)

    # -- composite-compatible API -------------------------------------------

    def intersect_scene(self, scene, origins, dirs, max_candidates=4,
                        max_steps=None, ignore=None, shadow_seed=None,
                        shadow=False) -> HitResult:
        from voxel_tracer_tpu.ops.prims import intersect_prims

        n = origins.shape[0]
        best = HitResult.miss(n)
        extras = ()
        if shadow:
            extras = (jnp.broadcast_to(
                jnp.asarray(shadow_seed, jnp.uint32), (n,)),)
        elif ignore is not None:
            extras = (ignore,)
        for i, v in enumerate(self.vols):
            if shadow:
                def fn(v_, o_, d_, seed_g, _i=i):
                    h = v_._shadow_trace(o_, d_, seed_g)
                    return h._replace(
                        obj=jnp.where(h.t < BIG_F32, _i, -1))
            elif ignore is not None and v.glass_ids:
                def fn(v_, o_, d_, ign_g, _i=i):
                    o_l, d_l = v_._to_local(o_, d_)
                    h = v_._volume_hit(o_l, d_l, v_._trace(
                        o_l, d_l, v_.full_tables, fetch=True), obj_val=_i)
                    for g in v_.glass_ids:
                        scan = v_._scan_trace(o_l, d_l, g)
                        sel = ign_g == g
                        h = HitResult(
                            t=jnp.where(sel, scan.t, h.t),
                            mat=jnp.where(sel, scan.mat, h.mat),
                            normal=jnp.where(sel[:, None], scan.normal,
                                             h.normal),
                            albedo=jnp.where(sel[:, None], scan.albedo,
                                             h.albedo),
                            steps=jnp.where(sel, scan.steps, h.steps),
                            obj=jnp.where(sel, jnp.where(
                                scan.t < BIG_F32, _i, -1), h.obj),
                        )
                    return h
            elif ignore is not None:
                def fn(v_, o_, d_, _ign_g, _i=i):
                    o_l, d_l = v_._to_local(o_, d_)
                    return v_._volume_hit(o_l, d_l, v_._trace(
                        o_l, d_l, v_.full_tables, fetch=True), obj_val=_i)
            else:
                def fn(v_, o_, d_, _i=i):
                    o_l, d_l = v_._to_local(o_, d_)
                    return v_._volume_hit(o_l, d_l, v_._trace(
                        o_l, d_l, v_.full_tables, fetch=True), obj_val=_i)

            best = best.nearer(
                self._masked_volume(v, origins, dirs, fn, extras))

        prim = intersect_prims(scene.prims, origins, dirs)
        if prim is not None:
            t, mat, normal, albedo = prim
            best = best.nearer(HitResult(
                t=t, mat=mat, normal=normal, albedo=albedo,
                steps=jnp.zeros_like(mat),
                obj=jnp.where(t < BIG_F32, -2, -1)))
        return best

    def march_interior(self, scene, obj, origins, dirs, medium,
                       max_steps=None) -> HitResult:
        """Interior march scoped to the entered object (obj routing —
        composite.march_interior's semantics)."""
        n = origins.shape[0]
        out = HitResult.miss(n)
        for i, v in enumerate(self.vols):
            if not v.glass_ids:
                continue
            sel = obj == i
            # park rays not in this volume so its traces slab-reject
            o_p = jnp.where(sel[:, None], origins, 1e6)
            d_p = jnp.where(sel[:, None], dirs,
                            jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
            h = v.march_interior(scene, obj, o_p, d_p, medium, max_steps)
            out = HitResult(
                t=jnp.where(sel, h.t, out.t),
                mat=jnp.where(sel, h.mat, out.mat),
                normal=jnp.where(sel[:, None], h.normal, out.normal),
                albedo=jnp.where(sel[:, None], h.albedo, out.albedo),
                steps=out.steps + jnp.where(sel, h.steps, 0),
                obj=jnp.where(sel, obj, out.obj),
            )
        return out

    def is_occluded(self, scene, origins, dirs, tmax, max_candidates=4,
                    max_steps=None, shadow_seed=None):
        hit = self.intersect_scene(
            scene, origins, dirs, max_candidates, max_steps,
            shadow_seed=shadow_seed, shadow=shadow_seed is not None)
        return hit.t < tmax, hit


def make_drone_scene(*, glass=True):
    """The reference's default scene, kernel-native and DYNAMIC: glass
    test box + 4 enemy drones as five separate oriented volumes
    (scene.cpp:5-31) — drones get per-frame transforms."""
    from voxel_tracer_tpu.models.scene import Scene
    from voxel_tracer_tpu.models.skydome import SkyDome
    from voxel_tracer_tpu.models.volume import VoxelVolume

    box = VoxelVolume.from_vox(
        "/root/reference/assets/vox/testing/glass-box.vox")
    if glass:
        box.grid[box.grid == 16] = 4
        box.grid[box.grid == 62] = 12
    vols = [box]
    for i in range(4):
        vols.append(VoxelVolume.from_vox(
            "/root/reference/assets/vox/enemy-drone.vox",
            pos=(float(i), 2.0, 0.0)))
    scene = Scene(volumes=vols, skydome=SkyDome.procedural(64, 32))
    scene.add_light((2.0, 3.5, -1.5), 0.15, (1.0, 0.9, 0.8), 40.0)
    return vols, scene


def render_whitted_multi(multi: MultiMegaIntersector, scene, camera,
                         width, height, frame, transforms=None, *,
                         config=None):
    """Full-material frame over N dynamic volumes: XLA raygen + the
    multi-volume kernel backend through the SAME shared shade_full
    (renderer.render_rays) as every other pipeline."""
    from voxel_tracer_tpu.models.camera import rays_for_image
    from voxel_tracer_tpu.renderer import RenderConfig, render_rays

    if config is None:
        config = RenderConfig(width=width, height=height, shading="full")
    isect = multi if transforms is None else multi.with_transforms(
        transforms)
    origins, dirs = rays_for_image(camera, width, height)
    return render_rays(scene, origins, dirs, jnp.asarray(frame, jnp.int32),
                       config=config, isect=isect)
