"""Brick-sharded grid mode: the scene "model parallel" axis (SURVEY §2.4).

For grids too large to replicate per chip, the voxel grid is sharded over a
2-D mesh axis as brick-aligned z-slabs: device (i, j) traces ray-shard i
against grid-slab j (a local two-level DDA clipped to its slab), and the
per-slab candidate hits resolve with ONE `all_gather` over the grid axis +
a masked nearest-hit min — rays crossing shard boundaries are resolved by
the reduction, not by halo cells.  This is the halo-free formulation of
the brick-sharded design: each device marches only its own slab content
(the slab's OBB slab-test clips the ray), so no traversal work is
duplicated; the collective moves one HitResult per (ray, slab), G small.

Slab boundaries are brick-aligned (multiples of 8) so each slab packs its
own intact brickmap.  Agreement with the replicated trace is exact up to
FP boundary flips: a ray stepping across a slab boundary enters the next
slab through its z entry face, which reproduces the z-step normal the
full-volume march would have produced (entry-voxel hits keep the slab
entry normal, vv.cpp:159).  `steps` AOVs differ (per-slab budgets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from voxel_tracer_tpu.models.volume import BRICK, VolumeData, VoxelVolume
from voxel_tracer_tpu.ops import composite
from voxel_tracer_tpu.ops.math3d import BIG_F32
from voxel_tracer_tpu.parallel.mesh import RAYS

GRID = "grid"


def make_ray_grid_mesh(n_ray: int, n_grid: int, devices=None) -> Mesh:
    """2-D mesh: (rays, grid)."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_ray * n_grid, (
        f"need {n_ray * n_grid} devices, have {len(devices)}")
    arr = np.array(devices[: n_ray * n_grid]).reshape(n_ray, n_grid)
    return Mesh(arr, (RAYS, GRID))


def split_volume_z(vol: VoxelVolume, g: int) -> VolumeData:
    """Split one volume into g brick-aligned z-slabs, stacked on axis 0.

    Each slab is a self-contained VolumeData (own grid block, brickmap,
    pivot-adjusted transform) positioned so its local frame tiles the
    original volume exactly.
    """
    gz, gy, gx = vol.grid.shape
    bz = (gz + BRICK - 1) // BRICK
    per = (bz + g - 1) // g * BRICK           # slab depth in voxels
    slabs = []
    for j in range(g):
        z0 = j * per
        block = np.zeros((per, gy, gx), np.uint8)
        if z0 < gz:
            src = vol.grid[z0: min(z0 + per, gz)]
            block[: src.shape[0]] = src
        sv = VoxelVolume(block, vol.palette, vpu=vol.vpu)
        # slab j's local origin sits z0 voxels further along the volume's
        # local +z; world pos shifts by R @ (offset from volume pivot)
        off_l = np.array([0.0, 0.0, z0 / vol.vpu], np.float32) \
            + sv.pivot - vol.pivot
        sv.pos = (vol.pos + vol.rot @ off_l).astype(np.float32)
        sv.rot = vol.rot.copy()
        slabs.append(sv.data())
    return VolumeData(*[jnp.stack([getattr(s, f) for s in slabs])
                        for f in VolumeData._fields])


def _min_reduce_hits(h: composite.HitResult, g: int) -> composite.HitResult:
    """Nearest hit across the leading gather axis (g, N): fold `nearer`."""
    best = composite.HitResult(*[x[0] for x in h])
    for j in range(1, g):
        best = best.nearer(composite.HitResult(*[x[j] for x in h]))
    return best


def make_grid_sharded_trace(mesh: Mesh, max_steps: int = 256):
    """Trace fn over a (rays, grid) mesh: rays sharded on RAYS, slabs on
    GRID; one all_gather(HitResult) over GRID resolves nearest hits.

    Returns fn(slabs: VolumeData stacked (G, ...), origins, dirs) ->
    HitResult for the full volume (the stack size G must equal the mesh's
    grid-axis size so each device holds exactly one slab).
    """
    g = mesh.shape[GRID]

    def trace(slabs, o, d):
        # local block: (G/g = 1, Z', Y, X) — this device's slab
        hit = composite._trace_one(slabs, 0, o, d, max_steps)
        gathered = jax.tree.map(
            lambda x: jax.lax.all_gather(x, GRID), hit)    # (g, n_local)
        return _min_reduce_hits(gathered, g)

    specs_in = (
        jax.tree.map(lambda _: P(GRID), VolumeData(*[0] * len(
            VolumeData._fields))),
        P(RAYS), P(RAYS),
    )
    out_spec = composite.HitResult(
        t=P(RAYS), mat=P(RAYS), normal=P(RAYS), albedo=P(RAYS),
        steps=P(RAYS), obj=P(RAYS))
    fn = shard_map(trace, mesh=mesh, in_specs=specs_in,
                   out_specs=out_spec, check_rep=False)
    return jax.jit(fn)
