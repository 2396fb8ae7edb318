"""Fused frame megakernel: raygen + two-level DDA + shade + tonemap.

One Pallas kernel renders a whole flat-shaded frame tile-by-tile with ZERO
intermediate HBM arrays: no (N,3) ray buffers, no post-kernel material /
palette / sky gathers (XLA's dynamic gathers cost ~2 ms per million rays on
TPU — they dominated the unfused pipeline).  Everything rides VMEM lane
gathers (Mosaic `dynamic_gather` via `jnp.take_along_axis` on the lane dim):

- per-tile raygen from 12 camera floats in SMEM (camera.h:32-37 semantics,
  pre-transformed to volume-local space, obb.cpp:128-134);
- brick-slice coherent traversal (vv.cpp:449-870 re-thought for the VPU:
  slice marching along the tile's shared major axis, scalar rect walks,
  brick-level slab tests, masked in-register fine DDA — see coherent.py);
- the fine DDA reads a brick's 512 occupancy bits as ONE VMEM row load +
  one lane gather per step (vs 16 scalar SMEM reads + a 15-op select tree);
- the hit voxel's 8-bit material is fetched ONCE per brick from a
  (NB, 128) byte-packed VMEM table: row load + lane gather + byte extract;
- palette -> albedo via lane gathers from a (6, 128) palette table;
- misses get the analytic procedural sky (SkyDome.procedural formula
  evaluated at the exact ray dir instead of a texel center), constant sky,
  or are left for an XLA HDR-texture blend by the caller;
- ACES tonemap (tonemap.h:22-30) + RGBA8 pack (precomp.h:342-359) in-kernel.

Outputs are in square-tile order ((n_tiles*R, 128): tile-major, row-major
32x32 pixels inside each tile); `integrate.image_of_tiles` restores image
order.  Rays that fight the tile's major axis are flagged unresolved via
the aux word so callers can re-trace the residue with the XLA wavefront.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3e37
BRICK = 8
LANES = 128

# aux word layout: mat (8b) | axis (2b) | sign (1b) | resolved (1b) | steps (19b)
AUX_MAT_SHIFT = 0
AUX_AX_SHIFT = 8
AUX_SIGN_SHIFT = 10
AUX_RESOLVED_SHIFT = 11
AUX_STEPS_SHIFT = 12


class MegaTables(NamedTuple):
    """Device tables for the megakernel (built host-side from a grid)."""

    occ: jnp.ndarray       # (1, NB) i32 SMEM occupancy flags
    occw: jnp.ndarray      # (ceil(NB/8), 128) i32: 8 bricks/row x 16 words
    wsm: jnp.ndarray       # (16, NB) i32: same words, SMEM word-major layout
    matw: jnp.ndarray      # (NB, 128) i32: 512 material bytes per brick
    occr: jnp.ndarray      # (1, NRT) i32 SMEM per-run occupancy (3 axes)
    runw: jnp.ndarray      # (NRT, 128) i32 run rows: 8 u-contiguous bricks
    bsize: tuple           # (BX, BY, BZ) python ints
    vpu: float


def _run_axes(bsize):
    """(s, u, v) global-axis dims per major axis k (u is the run axis)."""
    BX, BY, BZ = bsize
    return (
        (BX, BY, BZ),   # k=0 (x): u=y, v=z
        (BY, BZ, BX),   # k=1 (y): u=z, v=x
        (BZ, BX, BY),   # k=2 (z): u=x, v=y
    )


def pack_runs(occw16: np.ndarray, bsize) -> tuple:
    """Per-axis run tables: row = 8 u-contiguous bricks at fixed (s, v).

    Row index for axis k: base_k + (s*NV + v)*NRU + ru, lane =
    (u&7)*16 + word.  Lets the run-mode fine DDA march across 8 bricks
    with one lane gather per step instead of 8 serial per-brick passes.
    """
    BX, BY, BZ = bsize
    nb = BX * BY * BZ
    # occw16 is (NB, 16) with bidx = (bz*BY + by)*BX + bx
    grid16 = occw16.reshape(BZ, BY, BX, 16)
    blocks = []
    occs = []
    for kk, (ns, nu, nv) in enumerate(_run_axes((BX, BY, BZ))):
        nru = (nu + 7) // 8
        # arrange as (s, v, u, 16)
        if kk == 0:
            arr = grid16.transpose(2, 0, 1, 3)      # (x, z, y, 16)
        elif kk == 1:
            arr = grid16.transpose(1, 2, 0, 3)      # (y, x, z, 16)
        else:
            arr = grid16                             # (z, y, x, 16)
        pad = np.zeros((ns, nv, nru * 8, 16), np.int32)
        pad[:, :, :nu, :] = arr.astype(np.uint32).view(np.int32)
        rows = pad.reshape(ns * nv * nru, 128)
        blocks.append(rows)
        occs.append((rows != 0).any(axis=1).astype(np.int32))
    runw = np.concatenate(blocks, axis=0)
    occr = np.concatenate(occs)[None, :]
    return jnp.asarray(occr), jnp.asarray(runw)


def pack_mega(grid: np.ndarray, vpu: float) -> MegaTables:
    """Host-side packing of a (Z, Y, X) uint8 grid into kernel tables.

    Bit/byte index inside a brick: idx = z*64 + y*8 + x (vv.h:23-38 layout).
    """
    gz, gy, gx = grid.shape
    bx, by, bz = (gx + 7) // 8, (gy + 7) // 8, (gz + 7) // 8
    nb = bx * by * bz
    pad = np.zeros((bz * 8, by * 8, bx * 8), np.uint8)
    pad[:gz, :gy, :gx] = grid
    # (bz, 8, by, 8, bx, 8) -> (brick, z, y, x) -> (NB, 512) bytes
    b = pad.reshape(bz, 8, by, 8, bx, 8).transpose(0, 2, 4, 1, 3, 5)
    bytes_ = b.reshape(nb, 512)

    bits = (bytes_ != 0).astype(np.uint32)
    w = bits.reshape(nb, 16, 32)
    shifts = (1 << np.arange(32, dtype=np.uint64)).astype(np.uint32)
    occw16 = (w * shifts[None, None, :]).sum(axis=2, dtype=np.uint64)
    occw16 = occw16.astype(np.uint32)                     # (NB, 16)
    nbr = (nb + 7) // 8
    occw_rows = np.zeros((nbr, 128), np.int32)            # row: 8 bricks
    occw_rows.reshape(-1)[: nb * 16] = occw16.view(np.int32).reshape(-1)

    mw = bytes_.reshape(nb, 128, 4).astype(np.uint32)
    matw = (mw[:, :, 0] | (mw[:, :, 1] << 8) | (mw[:, :, 2] << 16)
            | (mw[:, :, 3] << 24)).view(np.int32)          # (NB, 128)

    occ = bits.any(axis=1).astype(np.int32).reshape(1, nb)
    occr, runw = pack_runs(occw16, (bx, by, bz))
    return MegaTables(
        occ=jnp.asarray(occ),
        occw=jnp.asarray(occw_rows),
        wsm=jnp.asarray(occw16.view(np.int32).T.copy()),
        matw=jnp.asarray(matw),
        occr=occr,
        runw=runw,
        bsize=(bx, by, bz),
        vpu=float(vpu),
    )


def pack_mega16(grid: np.ndarray):
    """16^3 super-brick tables: occupancy scalar + ONE (128,) word row per
    brick (4096 bits = exactly 128 i32 words — a perfect lane-gather fit).

    Halves the slice count and quarters the rect footprints of the brick
    traversal (measured: the per-window/per-brick skeleton dominates the
    dense-scene frame).  Bit index inside a brick: z*256 + y*16 + x.
    Materials keep the 8^3 `matw` table and resolve in a tile-end vote.
    """
    gz, gy, gx = grid.shape
    bx, by, bz = (gx + 15) // 16, (gy + 15) // 16, (gz + 15) // 16
    nb = bx * by * bz
    pad = np.zeros((bz * 16, by * 16, bx * 16), np.uint8)
    pad[:gz, :gy, :gx] = grid
    b = pad.reshape(bz, 16, by, 16, bx, 16).transpose(0, 2, 4, 1, 3, 5)
    bits_ = (b.reshape(nb, 4096) != 0).astype(np.uint32)
    w = bits_.reshape(nb, 128, 32)
    shifts = (1 << np.arange(32, dtype=np.uint64)).astype(np.uint32)
    occw = (w * shifts[None, None, :]).sum(axis=2,
                                           dtype=np.uint64).astype(np.uint32)
    occ = bits_.any(axis=1).astype(np.int32).reshape(1, nb)
    return (jnp.asarray(occ), jnp.asarray(occw.view(np.int32)), (bx, by, bz))


def pack_mega32(grid: np.ndarray):
    """32^3 super-brick tables: occupancy scalar + EIGHT (128,) word rows
    per brick (32768 bits = 1024 i32 words; brick b owns rows
    [b*8, b*8+8), word w lives at row b*8 + (w>>7), lane w&127).

    One more rung up the super-brick ladder (see pack_mega16): a 64^3
    grid collapses to 2x2x2 bricks, so a whole frame traverses at most 8
    brick visits per tile — the per-visit slab/setup/vote skeleton all but
    vanishes.  The price is the fine march's occupancy fetch: a 3-level
    select over the brick's 8 staged word rows per step (vs one row for
    16^3).  Bit index inside a brick: z*1024 + y*32 + x.  Materials keep
    the 8^3 `matw` and resolve in the tile-end vote (deferred mode).
    """
    gz, gy, gx = grid.shape
    bx, by, bz = (gx + 31) // 32, (gy + 31) // 32, (gz + 31) // 32
    nb = bx * by * bz
    pad = np.zeros((bz * 32, by * 32, bx * 32), np.uint8)
    pad[:gz, :gy, :gx] = grid
    b = pad.reshape(bz, 32, by, 32, bx, 32).transpose(0, 2, 4, 1, 3, 5)
    bits_ = (b.reshape(nb, 32768) != 0).astype(np.uint32)
    w = bits_.reshape(nb, 1024, 32)
    shifts = (1 << np.arange(32, dtype=np.uint64)).astype(np.uint32)
    occw = (w * shifts[None, None, :]).sum(axis=2,
                                           dtype=np.uint64).astype(np.uint32)
    occ = bits_.any(axis=1).astype(np.int32).reshape(1, nb)
    return (jnp.asarray(occ),
            jnp.asarray(occw.view(np.int32).reshape(nb * 8, 128)),
            (bx, by, bz))


def set_voxel_tables32(occ32, occw32, bsize32, x, y, z, val):
    """O(1) single-voxel edit on the `pack_mega32` tables (vv.cpp:377-432
    analog for the 32^3 super-brick layout)."""
    BX, BY, _ = bsize32
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    z = jnp.asarray(z, jnp.int32)
    bidx = ((z >> 5) * BY + (y >> 5)) * BX + (x >> 5)
    bit = ((z & 31) << 10) | ((y & 31) << 5) | (x & 31)
    word = bit >> 5
    row = bidx * 8 + (word >> 7)
    lane = word & 127
    mask = jnp.int32(1) << (bit & 31)
    old = occw32[row, lane]
    solid = jnp.asarray(val, jnp.int32) != 0
    new = jnp.where(solid, old | mask, old & ~mask)
    occw32 = occw32.at[row, lane].set(new)
    # occupancy flag: set on solid; on clear, re-check the brick's 8 rows
    brick_any = jnp.any(
        jax.lax.dynamic_slice(occw32, (bidx * 8, 0), (8, 128)) != 0)
    occ32 = occ32.at[0, bidx].set(
        jnp.where(solid, 1, brick_any.astype(jnp.int32)))
    return occ32, occw32


def pack_mat16(grid: np.ndarray) -> jnp.ndarray:
    """16^3-brick material table: (NB16*8, 128) i32 — brick b's 4096
    material bytes live in rows [b*8, b*8+8).  For voxel bit
    idx = z*256 + y*16 + x: word = idx>>2, row = b*8 + (word>>7),
    lane = word&127, byte = idx&3.

    Lets the megakernel resolve the hit material inside the brick visit
    (8 scalar-indexed row loads + a 3-level select + one lane gather)
    instead of the serialized tile-end vote loop — the vote costs ~11 %
    of the dense-scene frame (one cross-lane reduction per distinct hit
    brick per tile).  VMEM-resident: use only when NB16*4 KiB fits
    (the vote + matw_space='hbm' remains the giant-scene path)."""
    gz, gy, gx = grid.shape
    bx, by, bz = (gx + 15) // 16, (gy + 15) // 16, (gz + 15) // 16
    nb = bx * by * bz
    pad = np.zeros((bz * 16, by * 16, bx * 16), np.uint8)
    pad[:gz, :gy, :gx] = grid
    b = pad.reshape(bz, 16, by, 16, bx, 16).transpose(0, 2, 4, 1, 3, 5)
    mw = b.reshape(nb, 1024, 4).astype(np.uint32)
    words = (mw[:, :, 0] | (mw[:, :, 1] << 8) | (mw[:, :, 2] << 16)
             | (mw[:, :, 3] << 24)).view(np.int32)         # (NB, 1024)
    return jnp.asarray(words.reshape(nb * 8, 128))


def set_voxel_mat16(matw16, bsize16, x, y, z, val):
    """O(1) single-voxel material edit on the `pack_mat16` table."""
    BX, BY, _ = bsize16
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    z = jnp.asarray(z, jnp.int32)
    val = jnp.asarray(val, jnp.int32)
    bidx = ((z >> 4) * BY + (y >> 4)) * BX + (x >> 4)
    bit = ((z & 15) << 8) | ((y & 15) << 4) | (x & 15)
    row = bidx * 8 + (bit >> 9)
    lane = (bit >> 2) & 127
    sh = (bit & 3) * 8
    mword = matw16[row, lane]
    return matw16.at[row, lane].set(
        (mword & ~jnp.left_shift(jnp.int32(255), sh))
        | jnp.left_shift(val & 255, sh))


def pack_sub4(grid: np.ndarray) -> jnp.ndarray:
    """4^3 sub-block occupancy for the hierarchical fine march
    (`traversal='hier'`): each 16^3 brick's 64 sub-blocks (4x4x4 voxels)
    collapse to 64 bits = two i32 words.  Layout: (ceil(NB16/64), 128)
    i32 — brick b's words live at row b>>6, lanes (b&63)*2 + w.  Sub-block
    bit index: sb = (z>>2)*16 + (y>>2)*4 + (x>>2), word = sb>>5.

    The fine march gathers the sub-word each step and, when the ray's
    current 4^3 block is empty, skips straight to the block's exit plane
    instead of stepping voxel-by-voxel — the two-level brickmap idea
    (vv.h:23-38) applied a third time, inside the brick."""
    gz, gy, gx = grid.shape
    bx, by, bz = (gx + 15) // 16, (gy + 15) // 16, (gz + 15) // 16
    nb = bx * by * bz
    pad = np.zeros((bz * 16, by * 16, bx * 16), np.uint8)
    pad[:gz, :gy, :gx] = grid
    # (brick, sz, sy, sx) any() over each 4^3 sub-block
    b = pad.reshape(bz, 4, 4, by, 4, 4, bx, 4, 4)
    sub = b.transpose(0, 3, 6, 1, 4, 7, 2, 5, 8).reshape(nb, 64, 64)
    bits_ = sub.any(axis=2).astype(np.uint32)               # (NB, 64)
    w = bits_.reshape(nb, 2, 32)
    shifts = (1 << np.arange(32, dtype=np.uint64)).astype(np.uint32)
    words = (w * shifts[None, None, :]).sum(axis=2,
                                            dtype=np.uint64).astype(np.uint32)
    rows = (nb + 63) // 64
    out = np.zeros((rows, 128), np.uint32)
    out.reshape(-1, 2)[:nb] = words
    return jnp.asarray(out.view(np.int32))


def pack_mega16_axes(grid: np.ndarray) -> jnp.ndarray:
    """Per-axis 16^3 occupancy tables for the span-scanning march
    (`traversal='hier3'`): three copies of the pack_mega16 word table,
    one per major axis k, each laid out with k as the FASTEST bit axis
    (bit = v<<8 | u<<4 | ck).  A gathered word then holds the ray's
    whole 16-voxel k-run (x2 u-pair), so one float-exponent bit scan
    jumps straight to the next solid voxel in the run — the tile's
    major-axis coherence (vv.cpp:449-870's slice idea) applied to the
    bit layout itself.

    Returns (3*NB, 128) i32; axis k's brick b_k = (v*BU + u)*BK + s
    lives at row k*NB + b_k.  Table k=0 is the standard x-fastest
    layout; k=1/2 pack the grid transposed so y/z become fastest."""
    grid = np.asarray(grid)

    def words(g):
        gz, gy, gx = g.shape
        bx, by, bz = (gx + 15) // 16, (gy + 15) // 16, (gz + 15) // 16
        nb = bx * by * bz
        pad = np.zeros((bz * 16, by * 16, bx * 16), np.uint8)
        pad[:gz, :gy, :gx] = g
        b = pad.reshape(bz, 16, by, 16, bx, 16).transpose(0, 2, 4, 1, 3, 5)
        bits_ = (b.reshape(nb, 4096) != 0).astype(np.uint32)
        w = bits_.reshape(nb, 128, 32)
        shifts = (1 << np.arange(32, dtype=np.uint64)).astype(np.uint32)
        return (w * shifts[None, None, :]).sum(
            axis=2, dtype=np.uint64).astype(np.uint32).view(np.int32)

    occw0 = words(grid)
    occw1 = words(grid.transpose(2, 0, 1))
    occw2 = words(grid.transpose(1, 2, 0))
    assert occw0.shape == occw1.shape == occw2.shape
    return jnp.asarray(np.concatenate([occw0, occw1, occw2], axis=0))


def pack_sub4_axes(grid: np.ndarray) -> jnp.ndarray:
    """Per-axis 4^3 sub-block occupancy for hier3's `sub_skip`: three
    copies of the pack_sub4 table, transposed to match the
    `pack_mega16_axes` (k, u, v) layouts — sub-block bit index
    sb = (v4<<4) | (u4<<2) | k4 for axis k's table.  Shape
    (3 * ceil(NB/64), 128); axis k's brick b_k lives at row
    k*rows + (b_k >> 6), lanes (b_k & 63)*2 + w."""
    s0 = np.asarray(pack_sub4(grid))
    s1 = np.asarray(pack_sub4(grid.transpose(2, 0, 1)))
    s2 = np.asarray(pack_sub4(grid.transpose(1, 2, 0)))
    return jnp.asarray(np.concatenate([s0, s1, s2], axis=0))


def set_voxel_occw3(occw3, bsize16, x, y, z, val):
    """O(1) single-voxel edit on the `pack_mega16_axes` table (all three
    per-axis copies)."""
    BX, BY, BZ = bsize16
    nb = BX * BY * BZ
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    z = jnp.asarray(z, jnp.int32)
    solid = jnp.asarray(val, jnp.int32) != 0
    # per-axis (k, u, v) coords and brick dims: k=0 -> (x, y, z);
    # k=1 -> (y, z, x); k=2 -> (z, x, y)
    for kk, (ck, cu, cv, bk, bu, bv) in enumerate(
            ((x, y, z, BX, BY, BZ), (y, z, x, BY, BZ, BX),
             (z, x, y, BZ, BX, BY))):
        bidx = ((cv >> 4) * bu + (cu >> 4)) * bk + (ck >> 4)
        bit = ((cv & 15) << 8) | ((cu & 15) << 4) | (ck & 15)
        row = kk * nb + bidx
        lane = bit >> 5
        mask = jnp.int32(1) << (bit & 31)
        old = occw3[row, lane]
        new = jnp.where(solid, old | mask, old & ~mask)
        occw3 = occw3.at[row, lane].set(new)
    return occw3


def set_voxel_sub4_axes(sub4x, occw16, bsize16, x, y, z, val):
    """O(1) single-voxel edit on the `pack_sub4_axes` table: the 4^3
    block's occupancy is the same set of voxels in all three per-axis
    copies, so derive it once from occw16 and write the three bits."""
    BX, BY, BZ = bsize16
    nb = BX * BY * BZ
    rows = (nb + 63) // 64
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    z = jnp.asarray(z, jnp.int32)
    solid = jnp.asarray(val, jnp.int32) != 0
    # block any() from the global occw16 words (see set_voxel_sub4)
    bidx_g = ((z >> 4) * BY + (y >> 4)) * BX + (x >> 4)
    z0 = z & 12
    y0 = y & 12
    x0 = x & 12
    xmask = jnp.int32(0xF) << x0
    rowmask = xmask | (xmask << 16)
    any_bits = jnp.int32(0)
    for dz in range(4):
        for dy2 in range(2):
            widx = ((z0 + dz) << 3) + (y0 >> 1) + dy2
            any_bits = any_bits | (occw16[bidx_g, widx] & rowmask)
    bit_on = solid | (any_bits != 0)
    for kk, (ck, cu, cv, bk, bu, bv) in enumerate(
            ((x, y, z, BX, BY, BZ), (y, z, x, BY, BZ, BX),
             (z, x, y, BZ, BX, BY))):
        bidx = ((cv >> 4) * bu + (cu >> 4)) * bk + (ck >> 4)
        sb = ((((cv >> 2) & 3)) << 4) | (((cu >> 2) & 3) << 2) \
            | ((ck >> 2) & 3)
        row = kk * rows + (bidx >> 6)
        lane = ((bidx & 63) << 1) + (sb >> 5)
        mask = jnp.int32(1) << (sb & 31)
        old = sub4x[row, lane]
        new = jnp.where(bit_on, old | mask, old & ~mask)
        sub4x = sub4x.at[row, lane].set(new)
    return sub4x


def set_voxel_sub4(sub4, occw16, bsize16, x, y, z, val):
    """O(1) single-voxel edit on the `pack_sub4` table.  On clear, the
    sub-block's new occupancy is re-derived from the brick's occw16 words
    (a 4^3 block spans 2 occw16 words' halves — recheck via the 8
    16-bit lanes it owns)."""
    BX, BY, _ = bsize16
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    z = jnp.asarray(z, jnp.int32)
    bidx = ((z >> 4) * BY + (y >> 4)) * BX + (x >> 4)
    sb = (((z >> 2) & 3) << 4) | (((y >> 2) & 3) << 2) | ((x >> 2) & 3)
    row = bidx >> 6
    lane = ((bidx & 63) << 1) + (sb >> 5)
    mask = jnp.int32(1) << (sb & 31)
    solid = jnp.asarray(val, jnp.int32) != 0
    # recompute the sub-block's any() from occw16: voxel bit index
    # idx = z16*256 + y16*16 + x16; the 4^3 block covers z16 in
    # [4(z>>2)&.., +4), each z-plane is 8 words of 2 y-rows; the block's
    # bits live in 4 z-planes x 2 words (y-pair rows) at nibble x-ranges.
    z0 = (z & 12)
    y0 = (y & 12)
    x0 = (x & 12)
    xmask = jnp.int32(0xF) << x0                  # 4 x-bits inside a row
    rowmask = xmask | (xmask << 16)               # both y-rows of a word
    any_bits = jnp.int32(0)
    for dz in range(4):
        for dy2 in range(2):                      # the block's 2 y-pairs
            widx = ((z0 + dz) << 3) + (y0 >> 1) + dy2   # word = bit>>5
            w = occw16[bidx, widx]
            any_bits = any_bits | (w & rowmask)
    occ_sub = any_bits != 0
    old = sub4[row, lane]
    new = jnp.where(solid, old | mask,
                    jnp.where(occ_sub, old | mask, old & ~mask))
    return sub4.at[row, lane].set(new)


def set_voxel_tables(tb: MegaTables, x, y, z, val):
    """O(1) incremental single-voxel edit on the packed kernel tables.

    The jit-friendly analog of the reference's in-place `set_voxel`
    (vv.cpp:377-432): instead of repacking the whole grid host-side
    (`pack_mega`, O(N)), scatter-update the one occupancy word, material
    word, and 3 run-table words the voxel touches, and refresh the
    affected occupancy flags from the updated words.  x/y/z/val may be
    traced values — laser carving can run inside a jitted frame loop.
    """
    BXb, BYb, BZb = tb.bsize
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    z = jnp.asarray(z, jnp.int32)
    val = jnp.asarray(val, jnp.int32)
    solid = val != 0
    bx, by, bz = x >> 3, y >> 3, z >> 3
    bidx = (bz * BYb + by) * BXb + bx
    bit = ((z & 7) << 6) | ((y & 7) << 3) | (x & 7)
    bitset = jnp.left_shift(jnp.int32(1), bit & 31)

    # occupancy word (occw: 8 bricks x 16 words per row)
    r, l = bidx >> 3, (bidx & 7) * 16 + (bit >> 5)
    word2 = jnp.where(solid, tb.occw[r, l] | bitset,
                      tb.occw[r, l] & ~bitset)
    occw = tb.occw.at[r, l].set(word2)
    # SMEM word-major mirror (wsm[word, bidx])
    wsm = tb.wsm.at[bit >> 5, bidx].set(word2)

    # material byte (matw: 512 bytes per brick row)
    sh = (bit & 3) * 8
    mword = tb.matw[bidx, bit >> 2]
    matw = tb.matw.at[bidx, bit >> 2].set(
        (mword & ~jnp.left_shift(jnp.int32(255), sh))
        | jnp.left_shift(val & 255, sh))

    # brick occupancy flag = any of its 16 words
    words16 = jax.lax.dynamic_slice(occw, (r, (bidx & 7) * 16), (1, 16))
    occ = tb.occ.at[0, bidx].set(jnp.any(words16 != 0).astype(jnp.int32))

    # run tables: the brick appears once per major axis
    axes_dims = _run_axes(tb.bsize)
    nru_list = [(u + 7) // 8 for (_, u, _v) in axes_dims]
    size_list = [s * v * r_ for (s, _u, v), r_ in zip(axes_dims, nru_list)]
    bases = [0, size_list[0], size_list[0] + size_list[1]]
    suv = [(bx, by, bz), (by, bz, bx), (bz, bx, by)]
    occr, runw = tb.occr, tb.runw
    for k in range(3):
        s, u, v = suv[k]
        _, _, nv = axes_dims[k]
        row = bases[k] + (s * nv + v) * nru_list[k] + (u >> 3)
        lane = (u & 7) * 16 + (bit >> 5)
        runw = runw.at[row, lane].set(word2)
        rrow = jax.lax.dynamic_slice(runw, (row, 0), (1, 128))
        occr = occr.at[0, row].set(jnp.any(rrow != 0).astype(jnp.int32))

    return MegaTables(occ=occ, occw=occw, wsm=wsm, matw=matw, occr=occr,
                      runw=runw, bsize=tb.bsize, vpu=tb.vpu)


def set_voxel_tables16(occ16, occw16, bsize16, x, y, z, val):
    """The 16^3 super-brick twin of `set_voxel_tables`."""
    BX, BY, _ = bsize16
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    z = jnp.asarray(z, jnp.int32)
    solid = jnp.asarray(val, jnp.int32) != 0
    bidx = ((z >> 4) * BY + (y >> 4)) * BX + (x >> 4)
    bit = ((z & 15) << 8) | ((y & 15) << 4) | (x & 15)
    bitset = jnp.left_shift(jnp.int32(1), bit & 31)
    word2 = jnp.where(solid, occw16[bidx, bit >> 5] | bitset,
                      occw16[bidx, bit >> 5] & ~bitset)
    occw16 = occw16.at[bidx, bit >> 5].set(word2)
    row = jax.lax.dynamic_slice(occw16, (bidx, 0), (1, 128))
    occ16 = occ16.at[0, bidx].set(jnp.any(row != 0).astype(jnp.int32))
    return occ16, occw16


def pack_palette(palette: np.ndarray) -> jnp.ndarray:
    """(256, 3) f32 palette -> (8, 128) lane-gather table.

    Row 2*c + h holds component c for palette entries h*128..h*128+127.
    """
    pal = np.zeros((8, 128), np.float32)
    p = np.asarray(palette, np.float32)
    for c in range(3):
        pal[2 * c + 0] = p[:128, c]
        pal[2 * c + 1] = p[128:256, c]
    return jnp.asarray(pal)


SKY_ZENITH = (0.35, 0.45, 0.65)
SKY_HORIZON = (0.85, 0.65, 0.45)
SKY_BASE = (0.08, 0.08, 0.10)
SKY_SUNCOL = (1.0, 0.9, 0.75)


def pack_compact_matw(tables: MegaTables):
    """Compact the (NB, 128) material table to OCCUPIED bricks only.

    Giant sparse scenes (e.g. the 512-crate profiling grid: 240^3, 15 %
    of 8^3 bricks occupied) have matw tables that outgrow VMEM while the
    occupied subset fits easily.  Returns (matw_c, remap):
      matw_c: (Ncomp_padded, 128) i32 — occupied bricks' material words
      remap:  (1, NB) i32 SMEM brick->slot map (0 for empty bricks —
              never read, since only hit bricks reach the vote)
    Pass remap through the kernel's `wsm` input with
    matw_space='compact'."""
    occ = np.asarray(tables.occ).reshape(-1)
    matw = np.asarray(tables.matw)
    idx = np.flatnonzero(occ)
    ncomp = max(int(idx.size), 1)
    matw_c = np.zeros((ncomp, 128), np.int32)
    matw_c[: idx.size] = matw[idx]
    remap = np.zeros((1, occ.size), np.int32)
    remap[0, idx] = np.arange(idx.size, dtype=np.int32)
    return jnp.asarray(matw_c), jnp.asarray(remap)


def _analytic_sky(dw, sun):
    """SkyDome.procedural formula at exact dirs (skydome.py) — vector ops."""
    y = dw[1]
    cos_sun = dw[0] * sun[0] + dw[1] * sun[1] + dw[2] * sun[2]
    horizon = jnp.exp(-jnp.abs(y) * 3.0)
    zenith = jnp.clip(y, 0.0, 1.0)
    c2 = jnp.clip(cos_sun, 0.0, 1.0)
    g2 = c2 * c2
    g4 = g2 * g2
    g8 = g4 * g4
    g16 = g8 * g8
    glow = g16 * g16
    disk = jnp.clip((cos_sun - 0.9995) * 2000.0, 0.0, 1.0)
    disk = disk * disk
    lum = 25.0 * disk + 0.6 * glow
    out = []
    for c in range(3):
        v = (SKY_ZENITH[c] * zenith + SKY_HORIZON[c] * horizon + SKY_BASE[c]
             + lum * SKY_SUNCOL[c])
        out.append(jnp.sqrt(jnp.maximum(v, 0.0)) * 0.65)
    return out


def _aces(v):
    """tonemap.aces_approx (tonemap.h:22-30)."""
    v = v * 0.6
    return jnp.clip((v * (2.51 * v + 0.03)) / (v * (2.43 * v + 0.59) + 0.14),
                    0.0, 1.0)


def _make_mega_kernel(bsize, vpu, *, tile_rows, tile_w, nx_tiles,
                      max_bricks_per_tile, fine_iters, sky_mode,
                      shading, ambient, word_gather=True, fetch_mat=True,
                      fine_unroll=1, track_steps=True, slice_depth=1,
                      traversal="brick", mat_rounds=128,
                      ray_source="camera", brick=BRICK, mat_bsize=None,
                      matw_space="vmem", mat16=False, footprint="corners",
                      sub_skip=False, conv_rows=0):
    """Build the fused kernel. sky_mode: 'analytic' | 'constant' | 'none'.

    matw_space: 'vmem' (material table resident on-chip — small scenes),
    'compact' (matw holds only OCCUPIED bricks, the `wsm` input carries
    the (1, NB) brick->slot remap in SMEM — giant SPARSE scenes), or
    'hbm' (table stays in HBM; the tile-end vote DMAs one 512-byte brick
    row per distinct hit brick).  NOTE: 'hbm' is blocked by a toolchain
    bug on the current stack (Mosaic hangs compiling a DMA inside a
    while_loop body); prefer 'compact', which fits any scene whose
    occupied-brick material bytes fit VMEM.

    shading: 'flat' (albedo), 'lambert' (N.L sun + ambient, no shadows),
    'raw' (albedo8, no tonemap — for multi-pass pipelines), or 'trace'
    (no shade stage: rgba output is zero, consumers read t + aux).

    ray_source: 'camera' (in-kernel raygen, scalar corner footprints) or
    'refs' (six (R,128) VMEM blocks of local-space o/d — arbitrary ray
    lists, e.g. shadow/bounce wavefronts; footprints via per-slice
    cross-lane reductions since there is no shared pinhole).

    brick: traversal brick edge (8 = reference Brick512; 16 = super-bricks
    whose 4096 occupancy bits are one (128,) word row — fewer slices and
    smaller rect footprints, 'brick' traversal only).  With brick=16,
    `bsize` is the 16-brick grid, `occw` rows are per-16-brick words, and
    materials resolve via the tile-end vote against the 8^3 `matw` table
    whose grid dims are `mat_bsize`.
    """
    BX, BY, BZ = bsize
    NB = BX * BY * BZ
    bpu = vpu / brick
    rbpu = 1.0 / bpu
    log_b = int(np.log2(brick))
    assert 1 << log_b == brick and brick in (8, 16, 32)
    assert brick == BRICK or traversal in ("brick", "patch", "hier",
                                           "hier3", "hier3p"), \
        "brick=16/32 supports brick/patch/hier/hier3/hier3p traversals only"
    if traversal == "hier":
        # hierarchical fine march: needs the pack_sub4 table in the wsm
        # slot and the brick16 one-row occupancy layout
        assert brick == 16 and slice_depth == 1, \
            "hier traversal requires brick=16, slice_depth=1"
    if traversal == "hier3":
        # span-scanning march: needs the per-axis pack_mega16_axes table
        # as occw.  slice_depth>1 windows amortize the footprint/vote
        # skeleton; bricks still march serially near-to-far inside
        # (the brick_body sub-slice loop)
        assert brick == 16 and slice_depth in (1, 2), \
            "hier3 traversal requires brick=16, slice_depth in (1, 2)"
    if conv_rows:
        # sub-tile convergence groups: the hier3 fine march votes/exits
        # per `conv_rows`-row group instead of per tile — each group's
        # while_loop runs to ITS slowest ray (not the tile's), and a
        # group none of whose rays cross the brick skips the visit
        # entirely (no prologue).  Attacks PERF.md's "convergence tax".
        assert traversal == "hier3", "conv_rows is a hier3 option"
        assert conv_rows % 8 == 0, "conv_rows must be a multiple of 8 rows"
    if traversal == "hier3p":
        # k-pair span scan: the window's TWO k-slices march as ONE box
        # whose 32-voxel k-runs are synthesized from the brick pair's
        # adjacent per-axis word rows — half the windows/visits of hier3
        # at the cost of one extra word gather and an exact two-level
        # (16+16) bit scan per step (a 32-bit highest-set-bit via one f32
        # exponent is WRONG for values in [2^30, 2^31) with a full
        # mantissa — rounding carries into the next exponent)
        assert brick == 16 and slice_depth == 2 and not sub_skip, \
            "hier3p requires brick=16, slice_depth=2, no sub_skip"
    assert not sub_skip or traversal == "hier3", \
        "sub_skip (pack_sub4_axes block skipping) is a hier3 option"
    assert not (sub_skip and matw_space == "compact"), \
        "sub_skip and matw_space='compact' both claim the wsm operand " \
        "(pack_sub4_axes table vs brick->slot remap)"
    assert brick != 32 or traversal == "brick", \
        "brick=32 supports the 'brick' traversal only"
    # h_bit packs the in-brick voxel bit plus the entry axis; the axis
    # shift must clear the bit field (9/12/15 bits for brick 8/16/32)
    ax_shift = 3 * log_b if brick == 32 else 12
    # mat16: resolve materials inside the brick visit from a pack_mat16
    # table (8 scalar-row loads + select tree + lane gather) — no vote
    if mat16:
        assert brick == 16 and traversal in ("brick", "patch", "hier",
                                             "hier3", "hier3p") \
            and matw_space == "vmem" \
            and not (slice_depth == 2 and traversal == "brick"), \
            "mat16 requires brick=16 brick/patch traversal, VMEM matw, " \
            "non-deep slice_depth (the fused-depth pair needs per-lane " \
            "row bases)"
    if traversal == "patch":
        # patch mode: ONE masked fine march per 2x2-brick window patch
        # with per-lane occupancy-row select — no per-brick fine re-entry
        assert brick == 16 and slice_depth == 1, \
            "patch traversal requires brick=16, slice_depth=1"
        assert mat16 or not fetch_mat, \
            "patch traversal resolves materials via mat16 only"
    # deferred materials: hit_mat carries packed hit info until a tile-end
    # vote loop (run mode: (bidx<<9 | bit); brick16: 8^3 (bidx8<<9 | bit8))
    defer_mat = traversal == "run" or (brick != BRICK and not mat16
                                       and traversal != "patch")
    assert matw_space in ("vmem", "hbm", "compact")
    assert matw_space == "vmem" or defer_mat, \
        "matw_space='hbm'/'compact' requires a deferred-material mode " \
        "(run/brick16/brick32)"
    # trace-only consumers with fetch_mat=False never read materials —
    # skip the vote (and any matw access) entirely
    vote_mats = defer_mat and (fetch_mat or shading != "trace")
    # fused-depth mode: slice_depth=2 16^3 bricks march as ONE 32-deep box
    # (two word rows, per-lane row select) — halves the window/slab/entry
    # overhead and avoids wasted chunk tails at brick crossings
    deep = brick == 16 and slice_depth == 2 and traversal == "brick"
    h3p = traversal == "hier3p"
    # deep_box: the window's slice pair is ONE fused box (deep fine DDA
    # or hier3p span scan) — shared brick-pair/extent geometry
    deep_box = deep or h3p
    shape = (tile_rows, LANES)
    log_tw = int(np.log2(tile_w))
    assert 1 << log_tw == tile_w

    def kernel(*refs):
        if matw_space == "hbm":
            *refs, mat_scratch, mat_sem = refs
        if ray_source == "camera":
            (cam_ref, occ_ref, occw_ref, wsm_ref, matw_ref, pal_ref,
             rgba_ref, t_ref, aux_ref) = refs
        else:
            (cam_ref, oxr, oyr, ozr, dxr, dyr, dzr,
             occ_ref, occw_ref, wsm_ref, matw_ref, pal_ref,
             rgba_ref, t_ref, aux_ref) = refs
        ti = pl.program_id(0)
        ty = ti // nx_tiles
        tx = ti - ty * nx_tiles

        if ray_source == "camera":
            # ---- in-kernel raygen (camera.h:32-37, local space) -----------
            fl = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
                  + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
            px = (tx * tile_w + (fl & (tile_w - 1))).astype(jnp.float32)
            py = (ty * (tile_rows * LANES // tile_w)
                  + (fl >> log_tw)).astype(jnp.float32)
            o3 = tuple(cam_ref[i] for i in range(3))      # scalar origin
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
        d3 = (dx, dy, dz)
        o3v = (ox, oy, oz)

        size = (BX * brick / vpu, BY * brick / vpu, BZ * brick / vpu)

        # ---- slab entry (obb.cpp:48-80 semantics) --------------------------
        # rd is clipped to +-BIG (finite), so the products below can reach
        # +-inf but never NaN (no 0 * inf) — no NaN guards needed.
        tmin = jnp.zeros(shape, jnp.float32)
        tmax = jnp.full(shape, BIG, jnp.float32)
        entry_axis = jnp.zeros(shape, jnp.int32)
        for a in range(3):
            rd = jnp.clip(1.0 / d3[a], -BIG, BIG)
            t1 = (0.0 - o3v[a]) * rd
            t2 = (size[a] - o3v[a]) * rd
            tn = jnp.minimum(t1, t2)
            tf = jnp.maximum(t1, t2)
            upd = tn > tmin
            entry_axis = jnp.where(upd, a, entry_axis)
            tmin = jnp.maximum(tmin, tn)
            tmax = jnp.minimum(tmax, tf)
        valid = (tmax - 1e-4) >= tmin

        def pick3(a, b, c, axis):
            return jnp.where(axis == 0, a, jnp.where(axis == 1, b, c))

        tile_h = tile_rows * LANES // tile_w
        if ray_source == "camera":
            # ---- tile major axis from the center ray (all scalar ops) -----
            cxp = tx * tile_w + tile_w * 0.5
            cyp = ty * tile_h + tile_h * 0.5
            mdx = cam_ref[3] + cxp * cam_ref[6] + cyp * cam_ref[9] - o3[0]
            mdy = cam_ref[4] + cxp * cam_ref[7] + cyp * cam_ref[10] - o3[1]
            mdz = cam_ref[5] + cxp * cam_ref[8] + cyp * cam_ref[11] - o3[2]
        else:
            # mean direction over the tile's rays
            mdx = jnp.sum(dx); mdy = jnp.sum(dy); mdz = jnp.sum(dz)
        amx, amy, amz = jnp.abs(mdx), jnp.abs(mdy), jnp.abs(mdz)
        k = jnp.where((amx >= amy) & (amx >= amz), 0,
                      jnp.where(amy >= amz, 1, 2)).astype(jnp.int32)
        ksign = jnp.where(
            jnp.where(k == 0, mdx, jnp.where(k == 1, mdy, mdz)) >= 0.0,
            1, -1).astype(jnp.int32)

        corners = []
        if ray_source == "camera" and footprint == "corners":
            # ---- tile corner rays (scalars): bound slice footprints -------
            # The tile frustum's section on a k-plane is the hull of the 4
            # corner-ray intersections — scalar math replaces 4 cross-lane
            # min/max reductions per slice (vv.cpp:461-535's rect).
            for pxc, pyc in ((tx * tile_w - 0.5, ty * tile_h - 0.5),
                             (tx * tile_w + tile_w, ty * tile_h - 0.5),
                             (tx * tile_w - 0.5, ty * tile_h + tile_h),
                             (tx * tile_w + tile_w, ty * tile_h + tile_h)):
                cex = cam_ref[3] + pxc * cam_ref[6] + pyc * cam_ref[9] - o3[0]
                cey = cam_ref[4] + pxc * cam_ref[7] + pyc * cam_ref[10] - o3[1]
                cez = cam_ref[5] + pxc * cam_ref[8] + pyc * cam_ref[11] - o3[2]
                cok = pick3(o3[0], o3[1], o3[2], k)
                cou = pick3(o3[0], o3[1], o3[2], (k + 1) % 3)
                cov = pick3(o3[0], o3[1], o3[2], (k + 2) % 3)
                cdk = pick3(cex, cey, cez, k)
                cdu = pick3(cex, cey, cez, (k + 1) % 3)
                cdv = pick3(cex, cey, cez, (k + 2) % 3)
                cinv = jnp.clip(1.0 / cdk, -BIG, BIG)
                corners.append((cok, cou, cov, cdu, cdv, cinv))

        ku = (k + 1) % 3
        kv = (k + 2) % 3
        ok_ = pick3(ox, oy, oz, k); dk_ = pick3(dx, dy, dz, k)
        ou_ = pick3(ox, oy, oz, ku); du_ = pick3(dx, dy, dz, ku)
        ov_ = pick3(ox, oy, oz, kv); dv_ = pick3(dx, dy, dz, kv)
        nk = pick3(BX, BY, BZ, k)
        nu = pick3(BX, BY, BZ, ku)
        nv = pick3(BX, BY, BZ, kv)

        aligned = dk_ * ksign.astype(jnp.float32) > 1e-6
        resolved = aligned | ~valid
        active0 = valid & aligned
        rdk = jnp.clip(1.0 / dk_, -BIG, BIG)
        rdu = jnp.clip(1.0 / du_, -BIG, BIG)
        rdv = jnp.clip(1.0 / dv_, -BIG, BIG)

        hit_t = jnp.full(shape, BIG, jnp.float32)
        # deferred-material modes carry packed hit info (-1 = none) in the
        # `hit_mat` slot until the tile-end material vote loop
        hit_mat = (jnp.full(shape, -1, jnp.int32) if defer_mat
                   else jnp.zeros(shape, jnp.int32))
        hit_ax = entry_axis * 2
        steps = jnp.zeros(shape, jnp.int32)

        sgnx = jnp.where(jnp.signbit(dx), -1, 1).astype(jnp.int32)
        sgny = jnp.where(jnp.signbit(dy), -1, 1).astype(jnp.int32)
        sgnz = jnp.where(jnp.signbit(dz), -1, 1).astype(jnp.int32)

        s_begin = jnp.where(ksign > 0, 0, nk - 1)
        u_fwd = pick3(mdx, mdy, mdz, ku) >= 0.0
        v_fwd = pick3(mdx, mdy, mdz, kv) >= 0.0

        rdx = jnp.clip(1.0 / dx, -BIG, BIG)
        rdy = jnp.clip(1.0 / dy, -BIG, BIG)
        rdz = jnp.clip(1.0 / dz, -BIG, BIG)
        dlx = jnp.minimum(jnp.abs(rdx), BIG)
        dly = jnp.minimum(jnp.abs(rdy), BIG)
        dlz = jnp.minimum(jnp.abs(rdz), BIG)
        stpx = jnp.maximum(sgnx, 0).astype(jnp.float32)
        stpy = jnp.maximum(sgny, 0).astype(jnp.float32)
        stpz = jnp.maximum(sgnz, 0).astype(jnp.float32)

        if traversal == "run":
            # per-ray components along (k, u, v) for the run-box DDA
            dlk = jnp.minimum(jnp.abs(rdk), BIG)
            dlu = jnp.minimum(jnp.abs(rdu), BIG)
            dlv = jnp.minimum(jnp.abs(rdv), BIG)
            sgnu = jnp.where(jnp.signbit(du_), -1, 1).astype(jnp.int32)
            sgnv = jnp.where(jnp.signbit(dv_), -1, 1).astype(jnp.int32)
            stpk = jnp.where(ksign > 0, 1.0, 0.0)        # scalar
            stpu = jnp.maximum(sgnu, 0).astype(jnp.float32)
            stpv = jnp.maximum(sgnv, 0).astype(jnp.float32)
            # static run-table geometry (see pack_runs): per-axis sizes
            axes_dims = _run_axes(bsize)
            nru_list = [(u + 7) // 8 for (_, u, _v) in axes_dims]
            size_list = [s * v * r for (s, _u, v), r in zip(axes_dims,
                                                            nru_list)]
            NVk = pick3(axes_dims[0][2], axes_dims[1][2], axes_dims[2][2], k)
            NRUk = pick3(*nru_list, k)
            basek = pick3(0, size_list[0], size_list[0] + size_list[1], k)

        def slice_body(si, carry):
            # one iteration marches a WINDOW of `slice_depth` brick slices:
            # the loop skeleton (footprint, in-window mask, done-vote)
            # amortizes over depth; bricks still process near-to-far
            hit_t, hit_mat, hit_ax, steps, done_i, resolved_i = carry
            done = done_i > 0
            s_first = s_begin + si * (slice_depth * ksign)
            s_last = s_first + (slice_depth - 1) * ksign
            kw0 = jnp.minimum(s_first, s_last)
            kw1 = jnp.maximum(s_first, s_last) + 1

            k0 = kw0.astype(jnp.float32) * rbpu
            k1 = kw1.astype(jnp.float32) * rbpu
            ta = (k0 - ok_) * rdk
            tb = (k1 - ok_) * rdk
            t0 = jnp.maximum(jnp.minimum(ta, tb), tmin)
            t1 = jnp.minimum(jnp.maximum(ta, tb), tmax)
            in_slice = active0 & ~done & (t1 >= t0) & (t1 >= 0.0)

            if ray_source == "camera" and footprint == "corners":
                # scalar corner-ray footprint on the window's two k-planes
                u_lo = jnp.float32(1e9); u_hi = jnp.float32(-1e9)
                v_lo = jnp.float32(1e9); v_hi = jnp.float32(-1e9)
                for (cok, cou, cov, cdu, cdv, cinv) in corners:
                    for kk in (k0, k1):
                        tt = (kk - cok) * cinv
                        uu = (cou + cdu * tt) * bpu
                        vv = (cov + cdv * tt) * bpu
                        u_lo = jnp.minimum(u_lo, uu)
                        u_hi = jnp.maximum(u_hi, uu)
                        v_lo = jnp.minimum(v_lo, vv)
                        v_hi = jnp.maximum(v_hi, vv)
            else:
                # per-ray extents + 4 cross-lane reductions.  For camera
                # tiles (footprint='active') this is tighter than the
                # corner hull: done rays drop out of `in_slice`, so later
                # windows shrink to the still-unresolved silhouette rays
                tc0 = jnp.maximum(t0, 0.0)
                ua = (ou_ + du_ * tc0) * bpu
                ub = (ou_ + du_ * t1) * bpu
                va = (ov_ + dv_ * tc0) * bpu
                vb = (ov_ + dv_ * t1) * bpu
                inf_hi = jnp.full(shape, 1e9, jnp.float32)
                inf_lo = jnp.full(shape, -1e9, jnp.float32)
                u_lo = jnp.min(jnp.where(in_slice, jnp.minimum(ua, ub),
                                         inf_hi))
                u_hi = jnp.max(jnp.where(in_slice, jnp.maximum(ua, ub),
                                         inf_lo))
                v_lo = jnp.min(jnp.where(in_slice, jnp.minimum(va, vb),
                                         inf_hi))
                v_hi = jnp.max(jnp.where(in_slice, jnp.maximum(va, vb),
                                         inf_lo))
            any_in = jnp.any(in_slice)

            iu0 = jnp.clip(jnp.floor(u_lo).astype(jnp.int32), 0, nu - 1)
            iu1 = jnp.clip(jnp.floor(u_hi).astype(jnp.int32), 0, nu - 1)
            iv0 = jnp.clip(jnp.floor(v_lo).astype(jnp.int32), 0, nv - 1)
            iv1 = jnp.clip(jnp.floor(v_hi).astype(jnp.int32), 0, nv - 1)
            n_u = jnp.where(any_in, iu1 - iu0 + 1, 0)
            n_v = jnp.where(any_in, iv1 - iv0 + 1, 0)
            if traversal == "patch":
                # 2x2-brick patch rect (patch coords = cell coords >> 1)
                pu0 = iu0 >> 1
                pu1 = iu1 >> 1
                pv0 = iv0 >> 1
                pv1 = iv1 >> 1
                n_pu = jnp.where(any_in, pu1 - pu0 + 1, 0)
                n_pv = jnp.where(any_in, pv1 - pv0 + 1, 0)

            def brick_body(bi, carry2):
                hit_t, hit_mat, hit_ax, steps, done_i = carry2
                done = done_i > 0
                n_rect = jnp.maximum(n_u * n_v, 1)
                if deep_box:
                    # fused-depth mode: one box spans the whole window's
                    # slice_depth bricks along k; no sub-slice loop
                    sub = 0
                    rb = bi
                else:
                    sub = bi // n_rect          # sub-slice: near to far
                    rb = bi - sub * n_rect
                s = s_first + sub * ksign
                s_ok = (s >= 0) & (s < nk)
                ui = rb % jnp.maximum(n_u, 1)
                vi = rb // jnp.maximum(n_u, 1)
                su = jnp.where(u_fwd, iu0 + ui, iu1 - ui)
                sv = jnp.where(v_fwd, iv0 + vi, iv1 - vi)

                if deep_box:
                    # box-min brick along k + pair validity
                    s2 = s + ksign
                    s2_ok = (s2 >= 0) & (s2 < nk)
                    smin = jnp.minimum(s, jnp.where(s2_ok, s2, s))
                else:
                    smin = s

                bxc = pick3(smin, sv, su, k)
                byc = pick3(su, smin, sv, k)
                bzc = pick3(sv, su, smin, k)
                bidx = (bzc * BY + byc) * BX + bxc
                occ = jnp.where(s_ok, occ_ref[0, jnp.clip(bidx, 0, NB - 1)],
                                0)
                if deep_box:
                    # second brick of the pair = box-min + 1 along k
                    kstride = pick3(1, BX, BX * BY, k)
                    bidx2 = bidx + kstride
                    occ2 = jnp.where(s2_ok,
                                     occ_ref[0, jnp.clip(bidx2, 0, NB - 1)],
                                     0)
                    occ = occ | occ2
                    # k-extent of the box (1 or 2 bricks) + per-axis fine
                    # coordinate masks (k axis spans 0..31 when paired)
                    ext_k = rbpu * (1.0 + s2_ok.astype(jnp.float32))
                    mk = jnp.where(s2_ok, 31, 15)
                    mx_c = jnp.where(k == 0, mk, 15)
                    my_c = jnp.where(k == 1, mk, 15)
                    mz_c = jnp.where(k == 2, mk, 15)

                def occupied(carry3):
                    hit_t, hit_mat, hit_ax, steps, done_i = carry3
                    done = done_i > 0
                    bx0 = bxc.astype(jnp.float32) * rbpu
                    by0 = byc.astype(jnp.float32) * rbpu
                    bz0 = bzc.astype(jnp.float32) * rbpu
                    if not deep and slice_depth == 1:
                        # k-axis slab == the window interval: reuse t0/t1
                        # (already tmin/tmax-clamped) and slab only u/v
                        tn = t0
                        tf = t1
                        b_ax = jnp.broadcast_to(k, shape)
                        for a_ax, oa, rd, c0 in ((ku, ou_, rdu, su),
                                                 (kv, ov_, rdv, sv)):
                            b0 = c0.astype(jnp.float32) * rbpu
                            t1_ = (b0 - oa) * rd
                            t2_ = (b0 + rbpu - oa) * rd
                            lo = jnp.minimum(t1_, t2_)
                            hi = jnp.maximum(t1_, t2_)
                            upd = lo > tn
                            b_ax = jnp.where(upd, a_ax, b_ax)
                            tn = jnp.maximum(tn, lo)
                            tf = jnp.minimum(tf, hi)
                        enter = tn
                    else:
                        tn = jnp.zeros(shape, jnp.float32)
                        tf = jnp.full(shape, BIG, jnp.float32)
                        b_ax = jnp.zeros(shape, jnp.int32)
                        if deep_box:
                            exts = (jnp.where(k == 0, ext_k, rbpu),
                                    jnp.where(k == 1, ext_k, rbpu),
                                    jnp.where(k == 2, ext_k, rbpu))
                        else:
                            exts = (rbpu, rbpu, rbpu)
                        for a, (oa, rd, b0) in enumerate(
                                ((ox, rdx, bx0), (oy, rdy, by0),
                                 (oz, rdz, bz0))):
                            # rd finite (pre-clipped) -> no NaN possible
                            t1_ = (b0 - oa) * rd
                            t2_ = (b0 + exts[a] - oa) * rd
                            lo = jnp.minimum(t1_, t2_)
                            hi = jnp.maximum(t1_, t2_)
                            upd = lo > tn
                            b_ax = jnp.where(upd, a, b_ax)
                            tn = jnp.maximum(tn, lo)
                            tf = jnp.minimum(tf, hi)
                        enter = jnp.maximum(tn, tmin)
                    cross = (tf - 1e-5 >= enter) & in_slice & ~done \
                        & (enter < hit_t)

                    def finish(st, hit_t, hit_mat, hit_ax, bit_map=None,
                               ax_map=None):
                        # post-march: nearest-compare + axis/sign encoding
                        # + material resolve (shared by fine / hier_fine /
                        # hier3_fine; bit_map/ax_map translate a march's
                        # local (k,u,v) encoding to global axes once here)
                        t_new = enter + st["h_ft"] * (1.0 / vpu)
                        better = (st["h_bit"] >= 0) & (t_new < hit_t)
                        hit_t = jnp.where(better, t_new, hit_t)
                        if deep:
                            h_axv = st["h_ax"]
                            h_bitv = st["h_bit"]
                        elif h3p:
                            # local 12-bit (k&15 in low bits) + pair bit in
                            # st["h_hi"]; mask the -1 no-hit sentinel so
                            # downstream gathers stay in range
                            h_axv = st["h_ax"]
                            h_bitv = st["h_bit"] & 4095
                        else:
                            h_axv = (st["h_bit"] >> ax_shift) & 3
                            h_bitv = st["h_bit"] & ((1 << ax_shift) - 1)
                        if ax_map is not None:
                            h_axv = ax_map(h_axv)
                        if bit_map is not None:
                            h_bitv = bit_map(h_bitv)
                        sgn_ax = pick3(sgnx, sgny, sgnz, h_axv)
                        hit_ax = jnp.where(
                            better,
                            h_axv * 2 + jnp.where(sgn_ax > 0, 1, 0),
                            hit_ax)

                        if brick == 16 and mat16 and fetch_mat:
                            # in-brick material resolve from the pack_mat16
                            # table: brick bidx's 4096 bytes are rows
                            # [bidx*8, bidx*8+8) — 8 scalar row loads, a
                            # 3-level select on the word's row bits, one
                            # lane gather, byte extract.  No vote loop.
                            def with_mat(hm):
                                hb = h_bitv       # 0..4095 (masked by
                                wi = hb >> 2      # `better` on no-hit)
                                lane = wi & 127
                                # gather each row at the lane FIRST, then
                                # select by the destination lane's row bits
                                # (select-then-gather would apply another
                                # lane's row choice at the source position)
                                if h3p:
                                    # pair mode: rows from BOTH bricks,
                                    # per-lane select by the hit's k-high
                                    # bit (st["h_hi"])
                                    b2c = jnp.clip(bidx2, 0, NB - 1)
                                    hi_sel = st["h_hi"] > 0
                                    g = []
                                    for r in range(8):
                                        ga = jnp.take_along_axis(
                                            jnp.broadcast_to(
                                                matw_ref[bidx * 8 + r, :]
                                                [None, :], shape),
                                            lane, axis=1)
                                        gb = jnp.take_along_axis(
                                            jnp.broadcast_to(
                                                matw_ref[b2c * 8 + r, :]
                                                [None, :], shape),
                                            lane, axis=1)
                                        g.append(jnp.where(hi_sel, gb, ga))
                                else:
                                    g = [jnp.take_along_axis(
                                        jnp.broadcast_to(
                                            matw_ref[bidx * 8 + r, :]
                                            [None, :], shape),
                                        lane, axis=1)
                                        for r in range(8)]
                                sel = wi >> 7                  # row 0..7
                                l1 = [jnp.where((sel & 1) == 0, g[i],
                                                g[i + 1])
                                      for i in (0, 2, 4, 6)]
                                l2 = [jnp.where((sel & 2) == 0, l1[i],
                                                l1[i + 1]) for i in (0, 2)]
                                mword = jnp.where((sel & 4) == 0, l2[0],
                                                  l2[1])
                                mbyte = (mword >> ((hb & 3) * 8)) & 255
                                return jnp.where(better, mbyte, hm)

                            hit_mat = jax.lax.cond(
                                jnp.any(better), with_mat,
                                lambda hm: hm, hit_mat)
                        elif brick != BRICK:
                            # defer: pack the 8^3-brick address of the hit
                            # voxel for the tile-end material vote
                            MBX, MBY, _ = mat_bsize
                            hb = h_bitv
                            vx = bxc * brick + (hb & (brick - 1))
                            vy = byc * brick + ((hb >> log_b) & (brick - 1))
                            vz = bzc * brick + (hb >> (2 * log_b))
                            if deep_box:
                                # k coordinate's 2nd-brick offset
                                hh = jnp.where(st["h_hi"] > 0, 16, 0)
                                vx = vx + jnp.where(k == 0, hh, 0)
                                vy = vy + jnp.where(k == 1, hh, 0)
                                vz = vz + jnp.where(k == 2, hh, 0)
                            bidx8 = ((vz >> 3) * MBY + (vy >> 3)) * MBX \
                                + (vx >> 3)
                            bit8 = ((vz & 7) << 6) | ((vy & 7) << 3) \
                                | (vx & 7)
                            hit_mat = jnp.where(
                                better, (bidx8 << 9) | bit8, hit_mat)
                        elif fetch_mat:
                            # material fetch: once per brick, lane gather of
                            # the hit voxel's byte from the (NB, 128) table
                            def with_mat(hm):
                                row = jnp.broadcast_to(
                                    matw_ref[bidx, :][None, :], shape)
                                hb = h_bitv & 511   # in-range on no-hit
                                mword = jnp.take_along_axis(
                                    row, hb >> 2, axis=1)
                                mbyte = (mword >> ((hb & 3) * 8)) & 255
                                return jnp.where(better, mbyte, hm)

                            hit_mat = jax.lax.cond(
                                jnp.any(better), with_mat,
                                lambda hm: hm, hit_mat)
                        return (hit_t, hit_mat, hit_ax, st["stp"])

                    def hier_fine(carry4):
                        # hierarchical march (brick=16): the gathered 4^3
                        # sub-block word decides each step's granularity —
                        # skip an empty sub-block to its exit plane, or
                        # step one voxel.  Cells recompute from t (non-
                        # incremental DDA) so skip lengths are arbitrary;
                        # a 2e-3-voxel nudge along the ray lands each eval
                        # inside the next cell (the vv.cpp:680 +0.001f
                        # entry-offset idea).
                        hit_t, hit_mat, hit_ax, steps = carry4
                        occ_row = jnp.broadcast_to(
                            occw_ref[bidx, :][None, :], shape)
                        sub_row = jnp.broadcast_to(
                            wsm_ref[bidx >> 6, :][None, :], shape)
                        sub_base = (bidx & 63) * 2
                        fex = (ox + dx * enter - bx0) * vpu
                        fey = (oy + dy * enter - by0) * vpu
                        fez = (oz + dz * enter - bz0) * vpu
                        # nudge: >= ~80x the FP error of a boundary eval at
                        # coord ~16 (6e-6), small enough that sub-nudge
                        # corner grazes are rarer than the reference's own
                        # +0.001f entry-offset artifact class
                        EPS = jnp.float32(5e-4)
                        nex = dx * EPS + fex
                        ney = dy * EPS + fey
                        nez = dz * EPS + fez
                        pmx = -jnp.maximum(sgnx, 0)     # -1 if +x, else 0
                        pmy = -jnp.maximum(sgny, 0)
                        pmz = -jnp.maximum(sgnz, 0)

                        at_vol_entry = enter <= tmin + 1e-12
                        ax0 = jnp.where(at_vol_entry, entry_axis, b_ax)

                        # slim loop state: `la` packs live|ax<<1 and the
                        # hit-entry t is recomputed post-loop from h_bit
                        # (a direct voxel slab) — 3 carried arrays instead
                        # of 5, less VMEM traffic per chunk
                        st0 = dict(ft=jnp.zeros(shape, jnp.float32),
                                   la=(ax0 << 1) | cross.astype(jnp.int32),
                                   h_bit=jnp.full(shape, -1, jnp.int32),
                                   stp=steps)

                        def fine_step(st):
                            la = st["la"]
                            live_b = (la & 1) > 0
                            ft = st["ft"]
                            cxr = jnp.floor(nex + dx * ft).astype(jnp.int32)
                            cyr = jnp.floor(ney + dy * ft).astype(jnp.int32)
                            czr = jnp.floor(nez + dz * ft).astype(jnp.int32)
                            oob = ((cxr | cyr | czr) & ~15) != 0
                            live_b = live_b & ~oob
                            cx = cxr & 15
                            cy = cyr & 15
                            cz = czr & 15
                            sb = ((cz & 12) << 2) | (cy & 12) | (cx >> 2)
                            subw = jnp.take_along_axis(
                                sub_row, sub_base + (cz >> 3), axis=1)
                            sub_occ = (subw >> (sb & 31)) & 1
                            bit = (cz << 8) | (cy << 4) | cx
                            vw = jnp.take_along_axis(occ_row, bit >> 5,
                                                     axis=1)
                            # the voxel bit alone decides hits: an empty
                            # sub-block implies all-zero voxel words
                            vbit = (vw >> (bit & 31)) & 1
                            is_hit = live_b & (vbit == 1)
                            h_bit = jnp.where(
                                is_hit, bit | ((la >> 1) << ax_shift),
                                st["h_bit"])
                            live = live_b & ~is_hit
                            # step granularity per axis: an empty 4^3
                            # sub-block skips a 4-cube; an empty voxel
                            # word (the 16x2x1 box it spans) skips that
                            # box; else one voxel.  (pmx = -1 where the
                            # ray moves +ve: the +size term folds to an
                            # and, not a select.)
                            sub0 = sub_occ == 0
                            w0 = ~sub0 & (vw == 0)
                            mx = jnp.where(sub0, -4, jnp.where(w0, -16, -1))
                            my = jnp.where(sub0, -4, jnp.where(w0, -2, -1))
                            mz = jnp.where(sub0, -4, -1)
                            tgtx = (cxr & mx) + ((-mx) & pmx)
                            tgty = (cyr & my) + ((-my) & pmy)
                            tgtz = (czr & mz) + ((-mz) & pmz)
                            t_x = (tgtx.astype(jnp.float32) - fex) * rdx
                            t_y = (tgty.astype(jnp.float32) - fey) * rdy
                            t_z = (tgtz.astype(jnp.float32) - fez) * rdz
                            use_x = (t_x < t_y) & (t_x < t_z)
                            use_y = ~use_x & (t_y < t_z)
                            ax = jnp.where(use_x, 0,
                                           jnp.where(use_y, 1, 2))
                            ft2 = jnp.maximum(
                                jnp.minimum(jnp.minimum(t_x, t_y), t_z),
                                ft)
                            out = dict(ft=ft2,
                                       la=(ax << 1) | live.astype(jnp.int32),
                                       h_bit=h_bit, stp=st["stp"])
                            if track_steps:
                                out["stp"] = st["stp"] + jnp.where(
                                    live_b, 1, 0)
                            return out

                        def fine_cond(c):
                            fi, st = c
                            return (fi < fine_iters) \
                                & (jnp.sum(st["la"] & 1) > 0)

                        def fine_body(c):
                            fi, st = c
                            for _ in range(fine_unroll):
                                st = fine_step(st)
                            return (fi + fine_unroll, st)

                        _, st = jax.lax.while_loop(fine_cond, fine_body,
                                                   (jnp.int32(0), st0))
                        # hit-entry t: direct slab against the hit voxel
                        # (1 + pm = the entry-face offset per direction)
                        hb = st["h_bit"] & 4095
                        ex = ((hb & 15) + 1 + pmx - fex).astype(jnp.float32)
                        ey = (((hb >> 4) & 15) + 1 + pmy
                              - fey).astype(jnp.float32)
                        ez = ((hb >> 8) + 1 + pmz - fez).astype(jnp.float32)
                        h_ft = jnp.maximum(
                            jnp.maximum(jnp.maximum(ex * rdx, ey * rdy),
                                        ez * rdz), 0.0)
                        stf = dict(h_bit=st["h_bit"], h_ft=h_ft,
                                   stp=st["stp"])
                        return finish(stf, hit_t, hit_mat, hit_ax)

                    def hier3_fine(carry4):
                        # span-scanning march (brick=16, per-axis tables):
                        # the occw3 word for the ray's cell holds its whole
                        # 16-voxel k-run (x2 u-pair), so each step either
                        # resolves the hit inside the current (u, v) column
                        # with one float-exponent bit scan, or advances to
                        # the next u/v column boundary.  <= ~33 steps per
                        # brick visit by construction (u+v crossings), and
                        # no k-direction graze artifacts at all.
                        hit_t, hit_mat, hit_ax, steps = carry4
                        bidx3 = (sv * nu + su) * nk + s
                        occ_row = jnp.broadcast_to(
                            occw_ref[k * NB + bidx3, :][None, :], shape)
                        if sub_skip:
                            rows_s = (NB + 63) // 64
                            sub_row = jnp.broadcast_to(
                                wsm_ref[k * rows_s + (bidx3 >> 6), :]
                                [None, :], shape)
                            sub_base = (bidx3 & 63) * 2
                        bk0 = s.astype(jnp.float32) * rbpu
                        bu0 = su.astype(jnp.float32) * rbpu
                        bv0 = sv.astype(jnp.float32) * rbpu
                        fek = (ok_ + dk_ * enter - bk0) * vpu
                        feu = (ou_ + du_ * enter - bu0) * vpu
                        fev = (ov_ + dv_ * enter - bv0) * vpu
                        EPS = jnp.float32(5e-4)
                        nek = dk_ * EPS + fek
                        neu = du_ * EPS + feu
                        nev = dv_ * EPS + fev
                        kpos = ksign > 0
                        pk3 = jnp.where(kpos, -1, 0)
                        sgnu3 = jnp.where(jnp.signbit(du_), -1, 1)
                        sgnv3 = jnp.where(jnp.signbit(dv_), -1, 1)
                        pu3 = -jnp.maximum(sgnu3, 0)
                        pv3 = -jnp.maximum(sgnv3, 0)

                        at_vol_entry = enter <= tmin + 1e-12
                        ax0 = jnp.where(at_vol_entry, entry_axis, b_ax)
                        ax0k = jnp.where(ax0 == k, 0,
                                         jnp.where(ax0 == ku, 1, 2))

                        st0 = dict(ft=jnp.zeros(shape, jnp.float32),
                                   la=(ax0k << 1) | cross.astype(jnp.int32),
                                   h_bit=jnp.full(shape, -1, jnp.int32),
                                   stp=steps)
                        # per-lane loop-invariant inputs, bundled so the
                        # conv_rows path can slice them per row group
                        env0 = (occ_row, nek, neu, nev, fek, feu, fev,
                                dk_, du_, dv_, rdk, rdu, rdv, pu3, pv3,
                                sub_row if sub_skip else None)

                        def fine_step(st, env):
                            (occ_row, nek, neu, nev, fek, feu, fev,
                             dk_, du_, dv_, rdk, rdu, rdv, pu3, pv3,
                             sub_row) = env
                            la = st["la"]
                            live_b = (la & 1) > 0
                            ft = st["ft"]
                            ckr = jnp.floor(nek + dk_ * ft).astype(jnp.int32)
                            cur = jnp.floor(neu + du_ * ft).astype(jnp.int32)
                            cvr = jnp.floor(nev + dv_ * ft).astype(jnp.int32)
                            oob = ((ckr | cur | cvr) & ~15) != 0
                            live_b = live_b & ~oob
                            ck_ = ckr & 15
                            cu_ = cur & 15
                            cv_ = cvr & 15
                            bit = (cv_ << 8) | (cu_ << 4) | ck_
                            w = jnp.take_along_axis(occ_row, bit >> 5,
                                                    axis=1)
                            row16 = (w >> ((cu_ & 1) << 4)) & 0xFFFF
                            if sub_skip:
                                # 4^3 sub-block occupancy: empty blocks
                                # advance at granularity 4 on every axis
                                sb = (((cv_ & 12) << 2) | (cu_ & 12)
                                      | (ck_ >> 2))
                                subw = jnp.take_along_axis(
                                    sub_row, sub_base + (cv_ >> 3), axis=1)
                                sub0 = ((subw >> (sb & 31)) & 1) == 0
                            # bits at-or-ahead of ck in the ray's direction
                            mpos = row16 & (jnp.int32(-1) << ck_)
                            mneg = row16 & ((jnp.int32(2) << ck_) - 1)
                            m2 = jnp.where(kpos, mpos, mneg)
                            found = m2 != 0
                            # nearest candidate: lowest set bit (+k) /
                            # highest set bit (-k) via the f32 exponent
                            pickv = jnp.where(kpos, m2 & -m2, m2)
                            ckc = (jax.lax.bitcast_convert_type(
                                pickv.astype(jnp.float32), jnp.int32)
                                >> 23) - 127
                            t_cand = ((ckc + 1 + pk3).astype(jnp.float32)
                                      - fek) * rdk
                            # next u/v column boundary (u skips its pair
                            # when the whole word is empty)
                            mu = jnp.where(w == 0, -2, -1)
                            if sub_skip:
                                mu = jnp.where(sub0, -4, mu)
                                mv_ = jnp.where(sub0, -4, -1)
                                mk_ = jnp.where(sub0, -4, -16)
                                tgv = (cvr & mv_) + ((-mv_) & pv3)
                                tgk = (ckr & mk_) + ((-mk_) & pk3)
                                tk = (tgk.astype(jnp.float32) - fek) * rdk
                            else:
                                tgv = cvr + (1 & pv3)
                            tgu = (cur & mu) + ((-mu) & pu3)
                            tu = (tgu.astype(jnp.float32) - feu) * rdu
                            tv = (tgv.astype(jnp.float32) - fev) * rdv
                            t_uv = jnp.minimum(tu, tv)
                            # found is implied: an empty m2 yields
                            # ckc = -127, never a valid cell coord
                            hit_now = ckc == ck_
                            hit_ahead = found & ~hit_now & (t_cand < t_uv)
                            if sub_skip:
                                # a candidate past the empty block is only
                                # reachable if the ray stays in the g=1
                                # column — skip it now, rescan after the
                                # block jump
                                hit_ahead = hit_ahead & ~sub0
                            is_hit = live_b & (hit_now | hit_ahead)
                            bit_h = jnp.where(hit_now, bit,
                                              (cv_ << 8) | (cu_ << 4) | ckc)
                            ax_h = jnp.where(hit_now, la >> 1, 0)
                            h_bit = jnp.where(
                                is_hit, bit_h | (ax_h << ax_shift),
                                st["h_bit"])
                            live = live_b & ~is_hit
                            if sub_skip:
                                # advance: min over the (masked) 3-axis
                                # exits — k rides along (brick edge when
                                # not block-skipping: harmless, the ray
                                # dies at the k-face oob either way)
                                adv = jnp.minimum(tk, t_uv)
                                use_k2 = (tk < tu) & (tk < tv)
                                use_u2 = ~use_k2 & (tu < tv)
                                ax2 = jnp.where(use_k2, 0,
                                                jnp.where(use_u2, 1, 2))
                            else:
                                adv = t_uv
                                ax2 = jnp.where(tu < tv, 1, 2)
                            ft2 = jnp.maximum(adv, ft)
                            out = dict(ft=ft2,
                                       la=(ax2 << 1) | live.astype(jnp.int32),
                                       h_bit=h_bit, stp=st["stp"])
                            if track_steps:
                                out["stp"] = st["stp"] + jnp.where(
                                    live_b, 1, 0)
                            return out

                        def march(st0g, envg):
                            def fine_cond(c):
                                fi, st = c
                                return (fi < fine_iters) \
                                    & (jnp.sum(st["la"] & 1) > 0)

                            def fine_body(c):
                                fi, st = c
                                for _ in range(fine_unroll):
                                    st = fine_step(st, envg)
                                return (fi + fine_unroll, st)

                            # 2-step prologue: most visits resolve in 1-2
                            # span steps (p50 = 1), so the quick majority
                            # votes and exits before paying a full unroll
                            # chunk
                            stp0 = fine_step(fine_step(st0g, envg), envg)
                            _, st = jax.lax.while_loop(
                                fine_cond, fine_body, (jnp.int32(2), stp0))
                            return st

                        if conv_rows and conv_rows < shape[0]:
                            # row-group convergence: each group marches to
                            # its OWN slowest ray; groups with no crossing
                            # ray skip the visit (pass st0 through — equal
                            # by construction: a dead-lane march never sets
                            # h_bit and never increments stp)
                            def _rows(x, r0, r1):
                                if getattr(x, "ndim", 0) != 2 \
                                        or x.shape[0] != shape[0]:
                                    return x
                                return x[r0:r1]

                            parts = []
                            for r0 in range(0, shape[0], conv_rows):
                                r1 = min(r0 + conv_rows, shape[0])
                                st0g = {kk: vv[r0:r1]
                                        for kk, vv in st0.items()}
                                envg = tuple(_rows(vv, r0, r1)
                                             for vv in env0)
                                parts.append(jax.lax.cond(
                                    jnp.any((st0g["la"] & 1) > 0),
                                    lambda op: march(*op),
                                    lambda op: op[0], (st0g, envg)))
                            st = {kk: jnp.concatenate(
                                [p[kk] for p in parts], axis=0)
                                for kk in st0}
                        else:
                            st = march(st0, env0)
                        # hit-entry t: direct slab against the hit voxel
                        hb = st["h_bit"] & 4095
                        ek_ = ((hb & 15) + 1 + pk3 - fek).astype(jnp.float32)
                        eu_ = (((hb >> 4) & 15) + 1 + pu3
                               - feu).astype(jnp.float32)
                        ev_ = ((hb >> 8) + 1 + pv3 - fev).astype(jnp.float32)
                        h_ft = jnp.maximum(
                            jnp.maximum(jnp.maximum(ek_ * rdk, eu_ * rdu),
                                        ev_ * rdv), 0.0)
                        stf = dict(h_bit=st["h_bit"], h_ft=h_ft,
                                   stp=st["stp"])

                        def bit_map(hb_):
                            ck2 = hb_ & 15
                            cu2 = (hb_ >> 4) & 15
                            cv2 = hb_ >> 8
                            gx = pick3(ck2, cv2, cu2, k)
                            gy = pick3(cu2, ck2, cv2, k)
                            gz = pick3(cv2, cu2, ck2, k)
                            return (gz << 8) | (gy << 4) | gx

                        return finish(stf, hit_t, hit_mat, hit_ax,
                                      bit_map=bit_map,
                                      ax_map=lambda a: pick3(k, ku, kv, a))

                    def hier3p_fine(carry4):
                        # k-pair span scan: hier3 with a 32-voxel k-run
                        # synthesized from the brick pair's ADJACENT
                        # per-axis word rows (k is the layout's fastest
                        # brick factor, so pair rows are bidx3, bidx3+1).
                        # Halves the windows/visits; costs one extra word
                        # gather + the exact two-level bit scan per step.
                        hit_t, hit_mat, hit_ax, steps = carry4
                        bidx3 = (sv * nu + su) * nk + smin
                        row_a = jnp.broadcast_to(
                            occw_ref[k * NB + jnp.clip(bidx3, 0, NB - 1),
                                     :][None, :], shape)
                        row_b = jnp.broadcast_to(
                            occw_ref[k * NB + jnp.clip(bidx3 + 1, 0,
                                                       NB - 1), :]
                            [None, :], shape)
                        row_b = jnp.where(s2_ok, row_b, 0)
                        bk0 = smin.astype(jnp.float32) * rbpu
                        bu0 = su.astype(jnp.float32) * rbpu
                        bv0 = sv.astype(jnp.float32) * rbpu
                        fek = (ok_ + dk_ * enter - bk0) * vpu
                        feu = (ou_ + du_ * enter - bu0) * vpu
                        fev = (ov_ + dv_ * enter - bv0) * vpu
                        EPS = jnp.float32(5e-4)
                        nek = dk_ * EPS + fek
                        neu = du_ * EPS + feu
                        nev = dv_ * EPS + fev
                        kpos = ksign > 0
                        pk3 = jnp.where(kpos, -1, 0)
                        sgnu3 = jnp.where(jnp.signbit(du_), -1, 1)
                        sgnv3 = jnp.where(jnp.signbit(dv_), -1, 1)
                        pu3 = -jnp.maximum(sgnu3, 0)
                        pv3 = -jnp.maximum(sgnv3, 0)
                        mk31 = jnp.where(s2_ok, 31, 15)

                        at_vol_entry = enter <= tmin + 1e-12
                        ax0 = jnp.where(at_vol_entry, entry_axis, b_ax)
                        ax0k = jnp.where(ax0 == k, 0,
                                         jnp.where(ax0 == ku, 1, 2))

                        st0 = dict(ft=jnp.zeros(shape, jnp.float32),
                                   la=(ax0k << 1) | cross.astype(jnp.int32),
                                   h_bit=jnp.full(shape, -1, jnp.int32),
                                   h_ax=jnp.zeros(shape, jnp.int32),
                                   h_hi=jnp.zeros(shape, jnp.int32),
                                   stp=steps)

                        def fine_step(st):
                            la = st["la"]
                            live_b = (la & 1) > 0
                            ft = st["ft"]
                            ckr = jnp.floor(nek + dk_ * ft).astype(jnp.int32)
                            cur = jnp.floor(neu + du_ * ft).astype(jnp.int32)
                            cvr = jnp.floor(nev + dv_ * ft).astype(jnp.int32)
                            oob = ((ckr & ~mk31)
                                   | ((cur | cvr) & ~15)) != 0
                            live_b = live_b & ~oob
                            ck_ = ckr & 31
                            cu_ = cur & 15
                            cv_ = cvr & 15
                            lane = ((cv_ << 8) | (cu_ << 4)) >> 5
                            w_a = jnp.take_along_axis(row_a, lane, axis=1)
                            w_b = jnp.take_along_axis(row_b, lane, axis=1)
                            sh16 = (cu_ & 1) << 4
                            r16a = (w_a >> sh16) & 0xFFFF
                            r16b = (w_b >> sh16) & 0xFFFF
                            run32 = r16a | (r16b << 16)
                            # bits at-or-ahead of ck in the ray's direction
                            mpos = run32 & (jnp.int32(-1) << ck_)
                            mneg = run32 & ((jnp.int32(2) << ck_) - 1)
                            m2 = jnp.where(kpos, mpos, mneg)
                            found = m2 != 0
                            # EXACT 32-bit scans.  +k lowest set bit:
                            # m2 & -m2 is a power of two, f32-exact at all
                            # 32 positions once the sign bit is masked
                            # out of the exponent read (bit 31 -> -2^31).
                            lsbv = m2 & -m2
                            ck_lsb = ((jax.lax.bitcast_convert_type(
                                lsbv.astype(jnp.float32), jnp.int32)
                                >> 23) & 255) - 127
                            # -k highest set bit: two-level 16+16 — a raw
                            # 32-bit f32 exponent read rounds UP for
                            # near-full mantissas in [2^30, 2^31)
                            hi16 = (m2 >> 16) & 0xFFFF
                            lo16 = m2 & 0xFFFF
                            use_hi = hi16 != 0
                            v16 = jnp.where(use_hi, hi16, lo16)
                            e16 = (jax.lax.bitcast_convert_type(
                                v16.astype(jnp.float32), jnp.int32)
                                >> 23) - 127
                            ck_hsb = jnp.where(use_hi, e16 + 16, e16)
                            ckc = jnp.where(kpos, ck_lsb, ck_hsb)
                            t_cand = ((ckc + 1 + pk3).astype(jnp.float32)
                                      - fek) * rdk
                            # u-pair skip only when BOTH bricks' words are
                            # empty at this (u-pair, v)
                            w_or = w_a | w_b
                            mu = jnp.where(w_or == 0, -2, -1)
                            tgv = cvr + (1 & pv3)
                            tgu = (cur & mu) + ((-mu) & pu3)
                            tu = (tgu.astype(jnp.float32) - feu) * rdu
                            tv = (tgv.astype(jnp.float32) - fev) * rdv
                            t_uv = jnp.minimum(tu, tv)
                            hit_now = ckc == ck_
                            hit_ahead = found & ~hit_now & (t_cand < t_uv)
                            is_hit = live_b & (hit_now | hit_ahead)
                            ckh = jnp.where(hit_now, ck_, ckc)
                            bit_h = (cv_ << 8) | (cu_ << 4) | (ckh & 15)
                            ax_h = jnp.where(hit_now, la >> 1, 0)
                            h_bit = jnp.where(is_hit, bit_h, st["h_bit"])
                            h_ax = jnp.where(is_hit, ax_h, st["h_ax"])
                            h_hi = jnp.where(is_hit, ckh >> 4, st["h_hi"])
                            live = live_b & ~is_hit
                            adv = t_uv
                            ax2 = jnp.where(tu < tv, 1, 2)
                            ft2 = jnp.maximum(adv, ft)
                            out = dict(ft=ft2,
                                       la=(ax2 << 1) | live.astype(jnp.int32),
                                       h_bit=h_bit, h_ax=h_ax, h_hi=h_hi,
                                       stp=st["stp"])
                            if track_steps:
                                out["stp"] = st["stp"] + jnp.where(
                                    live_b, 1, 0)
                            return out

                        def fine_cond(c):
                            fi, st = c
                            return (fi < fine_iters) \
                                & (jnp.sum(st["la"] & 1) > 0)

                        def fine_body(c):
                            fi, st = c
                            for _ in range(fine_unroll):
                                st = fine_step(st)
                            return (fi + fine_unroll, st)

                        stp0 = fine_step(fine_step(st0))
                        _, st = jax.lax.while_loop(fine_cond, fine_body,
                                                   (jnp.int32(2), stp0))
                        # hit-entry t: direct slab against the hit voxel,
                        # k coordinate rebuilt from the low bits + pair bit
                        hb = st["h_bit"] & 4095
                        ckf = (hb & 15) | (st["h_hi"] << 4)
                        ek_ = (ckf + 1 + pk3 - fek).astype(jnp.float32)
                        eu_ = (((hb >> 4) & 15) + 1 + pu3
                               - feu).astype(jnp.float32)
                        ev_ = ((hb >> 8) + 1 + pv3 - fev).astype(jnp.float32)
                        h_ft = jnp.maximum(
                            jnp.maximum(jnp.maximum(ek_ * rdk, eu_ * rdu),
                                        ev_ * rdv), 0.0)
                        stf = dict(h_bit=st["h_bit"], h_ax=st["h_ax"],
                                   h_hi=st["h_hi"], h_ft=h_ft,
                                   stp=st["stp"])

                        def bit_map(hb_):
                            ck2 = hb_ & 15
                            cu2 = (hb_ >> 4) & 15
                            cv2 = hb_ >> 8
                            gx = pick3(ck2, cv2, cu2, k)
                            gy = pick3(cu2, ck2, cv2, k)
                            gz = pick3(cv2, cu2, ck2, k)
                            return (gz << 8) | (gy << 4) | gx

                        return finish(stf, hit_t, hit_mat, hit_ax,
                                      bit_map=bit_map,
                                      ax_map=lambda a: pick3(k, ku, kv, a))

                    def fine(carry4):
                        hit_t, hit_mat, hit_ax, steps = carry4
                        if deep:
                            # paired bricks: two word rows, per-lane select
                            # by the k coordinate's high bit
                            row_lo = jnp.broadcast_to(
                                occw_ref[jnp.clip(bidx, 0, NB - 1), :]
                                [None, :], shape)
                            row_hi = jnp.broadcast_to(
                                occw_ref[jnp.clip(bidx2, 0, NB - 1), :]
                                [None, :], shape)

                            def read_word(bit, hi_sel):
                                lane = bit >> 5
                                w0 = jnp.take_along_axis(row_lo, lane, axis=1)
                                w1 = jnp.take_along_axis(row_hi, lane, axis=1)
                                return jnp.where(hi_sel, w1, w0)
                        elif brick == 16:
                            # 16^3 brick: its 4096 occupancy bits ARE one
                            # (128,) row — single row load, lane gather
                            occ_row = jnp.broadcast_to(
                                occw_ref[bidx, :][None, :], shape)

                            def read_word(bit):
                                return jnp.take_along_axis(
                                    occ_row, bit >> 5, axis=1)
                        elif brick == 32:
                            # 32^3 brick: 1024 occupancy words in 8 rows —
                            # stage all 8, gather each at the word's lane,
                            # then a 3-level select on the word's row bits
                            occ_rows32 = [
                                jnp.broadcast_to(
                                    occw_ref[bidx * 8 + r, :][None, :],
                                    shape) for r in range(8)]

                            def read_word(bit):
                                word = bit >> 5
                                lane = word & 127
                                g = [jnp.take_along_axis(row, lane, axis=1)
                                     for row in occ_rows32]
                                sel = word >> 7
                                l1 = [jnp.where((sel & 1) == 0, g[i],
                                                g[i + 1])
                                      for i in (0, 2, 4, 6)]
                                l2 = [jnp.where((sel & 2) == 0, l1[i],
                                                l1[i + 1]) for i in (0, 2)]
                                return jnp.where((sel & 4) == 0, l2[0],
                                                 l2[1])
                        elif word_gather:
                            # brick's 512 occupancy bits: ONE row load,
                            # lane-gathered per step (8 bricks per row)
                            occ_row = jnp.broadcast_to(
                                occw_ref[bidx >> 3, :][None, :], shape)
                            woff = (bidx & 7) * 16

                            def read_word(bit):
                                return jnp.take_along_axis(
                                    occ_row, woff + (bit >> 5), axis=1)
                        else:
                            w16 = [wsm_ref[i, bidx] for i in range(16)]

                            def read_word(bit):
                                widx = bit >> 5
                                lvl = [jnp.where((widx & 1) == 0, w16[i],
                                                 w16[i + 1])
                                       for i in range(0, 16, 2)]
                                lvl = [jnp.where((widx & 2) == 0, lvl[i],
                                                 lvl[i + 1])
                                       for i in range(0, 8, 2)]
                                lvl = [jnp.where((widx & 4) == 0, lvl[i],
                                                 lvl[i + 1])
                                       for i in range(0, 4, 2)]
                                return jnp.where((widx & 8) == 0, lvl[0],
                                                 lvl[1])

                        fex = (ox + dx * enter - bx0) * vpu
                        fey = (oy + dy * enter - by0) * vpu
                        fez = (oz + dz * enter - bz0) * vpu
                        if deep:
                            hix, hiy, hiz = mx_c, my_c, mz_c
                        else:
                            hix = hiy = hiz = brick - 1
                        cx = jnp.clip(jnp.floor(fex).astype(jnp.int32), 0,
                                      hix)
                        cy = jnp.clip(jnp.floor(fey).astype(jnp.int32), 0,
                                      hiy)
                        cz = jnp.clip(jnp.floor(fez).astype(jnp.int32), 0,
                                      hiz)
                        tmx = (cx.astype(jnp.float32) - fex + stpx) * rdx
                        tmy = (cy.astype(jnp.float32) - fey + stpy) * rdy
                        tmz = (cz.astype(jnp.float32) - fez + stpz) * rdz
                        # rdx/y/z finite -> no NaN; clamp +inf overflow
                        tmx = jnp.minimum(tmx, BIG)
                        tmy = jnp.minimum(tmy, BIG)
                        tmz = jnp.minimum(tmz, BIG)

                        at_vol_entry = enter <= tmin + 1e-12
                        ax0 = jnp.where(at_vol_entry, entry_axis, b_ax)

                        st0 = dict(cx=cx, cy=cy, cz=cz, tmx=tmx, tmy=tmy,
                                   tmz=tmz, ft=jnp.zeros(shape, jnp.float32),
                                   ax=ax0, live=cross.astype(jnp.int32),
                                   h_bit=jnp.full(shape, -1, jnp.int32),
                                   h_ft=jnp.zeros(shape, jnp.float32),
                                   h_ax=jnp.zeros(shape, jnp.int32),
                                   stp=steps)
                        if deep:
                            st0["h_hi"] = jnp.zeros(shape, jnp.int32)

                        def fine_step(st):
                            # hit bookkeeping is deferred: a ray hits at most
                            # once per brick (live dies at the hit), so only
                            # (bit, ft, ax) are recorded in-loop; t/encoding/
                            # nearest-compare happen once post-loop
                            live_b = st["live"] > 0
                            if deep:
                                bit = (((((st["cz"] & 15) << 4)
                                         + (st["cy"] & 15)) << 4)
                                       + (st["cx"] & 15))
                                lk = pick3(st["cx"], st["cy"], st["cz"], k)
                                hi_sel = lk >= 16
                                word = read_word(bit, hi_sel)
                            else:
                                bit = ((st["cz"] << log_b) + st["cy"]
                                       << log_b) + st["cx"]
                                word = read_word(bit)
                            vbit = (word >> (bit & 31)) & 1
                            is_hit = live_b & (vbit == 1)
                            if deep:
                                h_bit = jnp.where(is_hit, bit, st["h_bit"])
                                h_ax = jnp.where(is_hit, st["ax"],
                                                 st["h_ax"])
                                h_hi = jnp.where(is_hit,
                                                 hi_sel.astype(jnp.int32),
                                                 st["h_hi"])
                            else:
                                # entry axis packed into the hit word: one
                                # select per step instead of two
                                h_bit = jnp.where(
                                    is_hit, bit | (st["ax"] << ax_shift),
                                    st["h_bit"])
                                h_ax = st["h_ax"]   # unused (packed above)
                            h_ft = jnp.where(is_hit, st["ft"], st["h_ft"])
                            live = live_b & (vbit == 0)

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
                            if deep:
                                # per-axis masks (k axis spans two bricks)
                                oob = (((cx2 & ~mx_c) | (cy2 & ~my_c)
                                        | (cz2 & ~mz_c)) != 0)
                            else:
                                # in-bounds iff no coord has bits past edge
                                oob = ((cx2 | cy2 | cz2) & ~(brick - 1)) != 0
                            live = live & ~oob
                            out = dict(cx=cx2, cy=cy2, cz=cz2, tmx=tmx2,
                                       tmy=tmy2, tmz=tmz2, ft=ft2,
                                       ax=ax.astype(jnp.int32),
                                       live=live.astype(jnp.int32),
                                       h_bit=h_bit, h_ft=h_ft, h_ax=h_ax,
                                       stp=st["stp"])
                            if deep:
                                out["h_hi"] = h_hi
                            if track_steps:
                                out["stp"] = st["stp"] + jnp.where(live_b, 1, 0)
                            return out

                        def fine_cond(c):
                            fi, st = c
                            return (fi < fine_iters) & (jnp.sum(st["live"]) > 0)

                        def fine_body(c):
                            # unrolled chunk: one cross-lane liveness vote
                            # per `fine_unroll` DDA steps (dead lanes step
                            # as masked no-ops)
                            fi, st = c
                            for _ in range(fine_unroll):
                                st = fine_step(st)
                            return (fi + fine_unroll, st)

                        _, st = jax.lax.while_loop(fine_cond, fine_body,
                                                   (jnp.int32(0), st0))
                        return finish(st, hit_t, hit_mat, hit_ax)

                    hit_t, hit_mat, hit_ax, steps = jax.lax.cond(
                        jnp.any(cross),
                        {"hier": hier_fine,
                         "hier3": hier3_fine,
                         "hier3p": hier3p_fine}.get(traversal, fine),
                        lambda c: c, (hit_t, hit_mat, hit_ax, steps))
                    return (hit_t, hit_mat, hit_ax, steps, done_i)

                return jax.lax.cond(
                    occ > 0, occupied, lambda c: c,
                    (hit_t, hit_mat, hit_ax, steps, done_i))

            def run_body(bi, carry2):
                # RUN traversal: one iteration handles 8 u-contiguous
                # bricks at fixed (s, v) — one slab, one fine DDA marching
                # across brick boundaries, one lane gather per step.
                # `hit_mat` carries packed hit info (bidx<<9 | bit, -1 =
                # none); materials resolve in a tile-end vote loop.
                hit_t, h_info, hit_ax, steps, done_i, resolved_i = carry2
                done = done_i > 0
                nru_rect = jnp.maximum((iu1 >> 3) - (iu0 >> 3) + 1, 1)
                vi = bi // nru_rect
                rui = bi - vi * nru_rect
                sv = jnp.where(v_fwd, iv0 + vi, iv1 - vi)
                ru = jnp.where(u_fwd, (iu0 >> 3) + rui, (iu1 >> 3) - rui)
                s = s_first
                row = basek + (s * NVk + sv) * NRUk + ru
                occ_run = occ_ref[0, row]

                def occupied(carry3):
                    hit_t, h_info, hit_ax, steps, done_i, resolved_i = carry3
                    done = done_i > 0
                    bk0 = s.astype(jnp.float32) * rbpu
                    bu0 = (ru * 8).astype(jnp.float32) * rbpu
                    bv0 = sv.astype(jnp.float32) * rbpu
                    tn = jnp.zeros(shape, jnp.float32)
                    tf = jnp.full(shape, BIG, jnp.float32)
                    b_axk = jnp.zeros(shape, jnp.int32)
                    for a, (oa, rd, b0, ext) in enumerate(
                            ((ok_, rdk, bk0, rbpu),
                             (ou_, rdu, bu0, 8 * rbpu),
                             (ov_, rdv, bv0, rbpu))):
                        # rd finite (pre-clipped) -> no NaN possible
                        t1_ = (b0 - oa) * rd
                        t2_ = (b0 + ext - oa) * rd
                        lo = jnp.minimum(t1_, t2_)
                        hi = jnp.maximum(t1_, t2_)
                        upd = lo > tn
                        b_axk = jnp.where(upd, a, b_axk)
                        tn = jnp.maximum(tn, lo)
                        tf = jnp.minimum(tf, hi)
                    enter = jnp.maximum(tn, tmin)
                    cross = (tf - 1e-5 >= enter) & in_slice & ~done \
                        & (enter < hit_t)

                    def fine(carry4):
                        hit_t, h_info, hit_ax, steps, resolved_i = carry4
                        run_row = jnp.broadcast_to(
                            occw_ref[row, :][None, :], shape)
                        fek = (ok_ + dk_ * enter - bk0) * vpu
                        feu = (ou_ + du_ * enter - bu0) * vpu
                        fev = (ov_ + dv_ * enter - bv0) * vpu
                        ck = jnp.clip(jnp.floor(fek).astype(jnp.int32), 0, 7)
                        cu = jnp.clip(jnp.floor(feu).astype(jnp.int32), 0, 63)
                        cv = jnp.clip(jnp.floor(fev).astype(jnp.int32), 0, 7)
                        tmk = (ck.astype(jnp.float32) - fek + stpk) * rdk
                        tmu = (cu.astype(jnp.float32) - feu + stpu) * rdu
                        tmv = (cv.astype(jnp.float32) - fev + stpv) * rdv
                        # rdk/u/v finite -> no NaN; clamp +inf overflow
                        tmk = jnp.minimum(tmk, BIG)
                        tmu = jnp.minimum(tmu, BIG)
                        tmv = jnp.minimum(tmv, BIG)

                        at_vol_entry = enter <= tmin + 1e-12
                        eak = jnp.where(entry_axis == k, 0,
                                        jnp.where(entry_axis == ku, 1, 2))
                        ax0 = jnp.where(at_vol_entry, eak, b_axk)

                        st0 = dict(ck=ck, cu=cu, cv=cv, tmk=tmk, tmu=tmu,
                                   tmv=tmv, ft=jnp.zeros(shape, jnp.float32),
                                   ax=ax0, live=cross.astype(jnp.int32),
                                   h_pb=jnp.full(shape, -1, jnp.int32),
                                   h_ft=jnp.zeros(shape, jnp.float32),
                                   h_ax=jnp.zeros(shape, jnp.int32),
                                   stp=steps)

                        def fine_step(st):
                            live_b = st["live"] > 0
                            cu7 = st["cu"] & 7
                            xl = pick3(st["ck"], st["cv"], cu7, k)
                            yl = pick3(cu7, st["ck"], st["cv"], k)
                            zl = pick3(st["cv"], cu7, st["ck"], k)
                            bit = zl * 64 + yl * 8 + xl
                            lane = ((st["cu"] >> 3) << 4) + (bit >> 5)
                            word = jnp.take_along_axis(run_row, lane, axis=1)
                            vbit = (word >> (bit & 31)) & 1
                            is_hit = live_b & (vbit == 1)
                            h_pb = jnp.where(
                                is_hit, ((st["cu"] >> 3) << 9) | bit,
                                st["h_pb"])
                            h_ft = jnp.where(is_hit, st["ft"], st["h_ft"])
                            h_ax = jnp.where(is_hit, st["ax"], st["h_ax"])
                            live = live_b & ~is_hit

                            use_k = (st["tmk"] < st["tmu"]) & (st["tmk"] < st["tmv"])
                            use_u = ~(st["tmk"] < st["tmu"]) & (st["tmu"] < st["tmv"])
                            ax = jnp.where(use_k, 0, jnp.where(use_u, 1, 2))
                            ck2 = st["ck"] + jnp.where(use_k, ksign, 0)
                            cu2 = st["cu"] + jnp.where(use_u, sgnu, 0)
                            use_v = ~use_k & ~use_u
                            cv2 = st["cv"] + jnp.where(use_v, sgnv, 0)
                            ft2 = jnp.where(use_k, st["tmk"],
                                            jnp.where(use_u, st["tmu"],
                                                      st["tmv"]))
                            tmk2 = st["tmk"] + jnp.where(use_k, dlk, 0.0)
                            tmu2 = st["tmu"] + jnp.where(use_u, dlu, 0.0)
                            tmv2 = st["tmv"] + jnp.where(use_v, dlv, 0.0)
                            oob = ((((ck2 | cv2) & ~7) | (cu2 & ~63)) != 0)
                            live = live & ~oob
                            out = dict(ck=ck2, cu=cu2, cv=cv2, tmk=tmk2,
                                       tmu=tmu2, tmv=tmv2, ft=ft2,
                                       ax=ax.astype(jnp.int32),
                                       live=live.astype(jnp.int32),
                                       h_pb=h_pb, h_ft=h_ft, h_ax=h_ax,
                                       stp=st["stp"])
                            if track_steps:
                                out["stp"] = st["stp"] + jnp.where(live_b, 1, 0)
                            return out

                        def fine_cond(c):
                            fi, st = c
                            return (fi < fine_iters) & (jnp.sum(st["live"]) > 0)

                        def fine_body(c):
                            fi, st = c
                            for _ in range(fine_unroll):
                                st = fine_step(st)
                            return (fi + fine_unroll, st)

                        _, st = jax.lax.while_loop(fine_cond, fine_body,
                                                   (jnp.int32(0), st0))

                        # rays still live at the cap may have an unseen hit
                        # in this run: hand them to the fallback tracer
                        resolved_i = jnp.where(st["live"] > 0, 0, resolved_i)

                        t_new = enter + st["h_ft"] * (1.0 / vpu)
                        better = (st["h_pb"] >= 0) & (t_new < hit_t)
                        hit_t = jnp.where(better, t_new, hit_t)
                        gax = pick3(k, ku, kv, st["h_ax"])
                        sgn_ax = pick3(sgnx, sgny, sgnz, gax)
                        hit_ax = jnp.where(
                            better, gax * 2 + jnp.where(sgn_ax > 0, 1, 0),
                            hit_ax)
                        su_g = ru * 8 + (jnp.maximum(st["h_pb"], 0) >> 9)
                        bxc = pick3(s, sv, su_g, k)
                        byc = pick3(su_g, s, sv, k)
                        bzc = pick3(sv, su_g, s, k)
                        bidx_v = (bzc * BY + byc) * BX + bxc
                        h_info = jnp.where(
                            better, (bidx_v << 9) | (st["h_pb"] & 511),
                            h_info)
                        return (hit_t, h_info, hit_ax, st["stp"], resolved_i)

                    hit_t, h_info, hit_ax, steps, resolved_i = jax.lax.cond(
                        jnp.any(cross), fine, lambda c: c,
                        (hit_t, h_info, hit_ax, steps, resolved_i))
                    return (hit_t, h_info, hit_ax, steps, done_i, resolved_i)

                return jax.lax.cond(
                    occ_run > 0, occupied, lambda c: c,
                    (hit_t, h_info, hit_ax, steps, done_i, resolved_i))

            def patch_body(bi, carry2):
                """One 2x2-brick patch: a single masked fine march for the
                whole patch with per-lane occupancy-row select (4 rows,
                gather-then-select) — replaces up to 4 per-brick slab
                tests + fine re-entries of the brick loop with one."""
                hit_t, hit_mat, hit_ax, steps, done_i = carry2
                done = done_i > 0
                s = s_first                      # slice_depth == 1
                s_ok = (s >= 0) & (s < nk)
                pi_u = bi % jnp.maximum(n_pu, 1)
                pi_v = bi // jnp.maximum(n_pu, 1)
                pu = jnp.where(u_fwd, pu0 + pi_u, pu1 - pi_u)
                pv = jnp.where(v_fwd, pv0 + pi_v, pv1 - pi_v)
                u_b = pu * 2                     # patch-origin cell coords
                v_b = pv * 2
                cells = []                       # ci = b_u | (b_v << 1)
                occ_any = jnp.int32(0)
                for b_v in (0, 1):
                    for b_u in (0, 1):
                        cu = u_b + b_u
                        cv = v_b + b_v
                        c_ok = s_ok & (cu >= 0) & (cu < nu) \
                            & (cv >= 0) & (cv < nv)
                        bxc_c = pick3(s, cv, cu, k)
                        byc_c = pick3(cu, s, cv, k)
                        bzc_c = pick3(cv, cu, s, k)
                        bidx_c = jnp.clip((bzc_c * BY + byc_c) * BX + bxc_c,
                                          0, NB - 1)
                        occ_c = jnp.where(c_ok, occ_ref[0, bidx_c], 0)
                        occ_any = occ_any | occ_c
                        cells.append((bidx_c, occ_c, c_ok))

                def occupied(carry3):
                    hit_t, hit_mat, hit_ax, steps, done_i = carry3
                    done = done_i > 0
                    # patch box: 2 bricks along u/v, 1 along k
                    bx0 = pick3(s, v_b, u_b, k).astype(jnp.float32) * rbpu
                    by0 = pick3(u_b, s, v_b, k).astype(jnp.float32) * rbpu
                    bz0 = pick3(v_b, u_b, s, k).astype(jnp.float32) * rbpu
                    exts = tuple(
                        jnp.where(k == a, rbpu, 2.0 * rbpu)
                        for a in range(3))
                    tn = jnp.zeros(shape, jnp.float32)
                    tf = jnp.full(shape, BIG, jnp.float32)
                    b_ax = jnp.zeros(shape, jnp.int32)
                    for a, (oa, rd, b0) in enumerate(
                            ((ox, rdx, bx0), (oy, rdy, by0),
                             (oz, rdz, bz0))):
                        t1_ = (b0 - oa) * rd
                        t2_ = (b0 + exts[a] - oa) * rd
                        lo = jnp.minimum(t1_, t2_)
                        hi = jnp.maximum(t1_, t2_)
                        upd = lo > tn
                        b_ax = jnp.where(upd, a, b_ax)
                        tn = jnp.maximum(tn, lo)
                        tf = jnp.minimum(tf, hi)
                    enter = jnp.maximum(tn, tmin)
                    cross = (tf - 1e-5 >= enter) & in_slice & ~done \
                        & (enter < hit_t)

                    def fine(carry4):
                        hit_t, hit_mat, hit_ax, steps = carry4
                        # per-cell occupancy rows (zeroed when invalid)
                        rows = [jnp.where(
                            c_ok & (occ_c > 0),
                            jnp.broadcast_to(occw_ref[bidx_c, :][None, :],
                                             shape),
                            jnp.zeros(shape, jnp.int32))
                            for (bidx_c, occ_c, c_ok) in cells]
                        # patch-local coord bounds: 31 along u/v, 15 on k
                        hix = jnp.where(k == 0, 15, 31)
                        hiy = jnp.where(k == 1, 15, 31)
                        hiz = jnp.where(k == 2, 15, 31)
                        fex = (ox + dx * enter - bx0) * vpu
                        fey = (oy + dy * enter - by0) * vpu
                        fez = (oz + dz * enter - bz0) * vpu
                        cx = jnp.clip(jnp.floor(fex).astype(jnp.int32), 0,
                                      hix)
                        cy = jnp.clip(jnp.floor(fey).astype(jnp.int32), 0,
                                      hiy)
                        cz = jnp.clip(jnp.floor(fez).astype(jnp.int32), 0,
                                      hiz)
                        tmx = (cx.astype(jnp.float32) - fex + stpx) * rdx
                        tmy = (cy.astype(jnp.float32) - fey + stpy) * rdy
                        tmz = (cz.astype(jnp.float32) - fez + stpz) * rdz
                        tmx = jnp.minimum(tmx, BIG)
                        tmy = jnp.minimum(tmy, BIG)
                        tmz = jnp.minimum(tmz, BIG)

                        at_vol_entry = enter <= tmin + 1e-12
                        ax0 = jnp.where(at_vol_entry, entry_axis, b_ax)

                        st0 = dict(cx=cx, cy=cy, cz=cz, tmx=tmx, tmy=tmy,
                                   tmz=tmz,
                                   ft=jnp.zeros(shape, jnp.float32),
                                   ax=ax0, live=cross.astype(jnp.int32),
                                   h_bit=jnp.full(shape, -1, jnp.int32),
                                   h_ft=jnp.zeros(shape, jnp.float32),
                                   h_ax=jnp.zeros(shape, jnp.int32),
                                   stp=steps)

                        def fine_step(st):
                            live_b = st["live"] > 0
                            bit = ((((st["cz"] & 15) << 4)
                                    + (st["cy"] & 15)) << 4) \
                                + (st["cx"] & 15)
                            cu_hi = pick3(st["cx"], st["cy"], st["cz"],
                                          ku) >> 4
                            cv_hi = pick3(st["cx"], st["cy"], st["cz"],
                                          kv) >> 4
                            lane = bit >> 5
                            g = [jnp.take_along_axis(r, lane, axis=1)
                                 for r in rows]
                            w_v0 = jnp.where(cu_hi == 0, g[0], g[1])
                            w_v1 = jnp.where(cu_hi == 0, g[2], g[3])
                            word = jnp.where(cv_hi == 0, w_v0, w_v1)
                            vbit = (word >> (bit & 31)) & 1
                            is_hit = live_b & (vbit == 1)
                            # patch-local packed hit coords (5 bits each)
                            hp = (st["cz"] << 10) | (st["cy"] << 5) \
                                | st["cx"]
                            h_bit = jnp.where(is_hit, hp, st["h_bit"])
                            h_ft = jnp.where(is_hit, st["ft"], st["h_ft"])
                            h_ax = jnp.where(is_hit, st["ax"], st["h_ax"])
                            live = live_b & ~is_hit

                            use_x = (st["tmx"] < st["tmy"]) \
                                & (st["tmx"] < st["tmz"])
                            use_y = ~(st["tmx"] < st["tmy"]) \
                                & (st["tmy"] < st["tmz"])
                            ax = jnp.where(use_x, 0,
                                           jnp.where(use_y, 1, 2))
                            cx2 = st["cx"] + jnp.where(use_x, sgnx, 0)
                            cy2 = st["cy"] + jnp.where(use_y, sgny, 0)
                            use_z = ~use_x & ~use_y
                            cz2 = st["cz"] + jnp.where(use_z, sgnz, 0)
                            ft2 = jnp.where(use_x, st["tmx"],
                                            jnp.where(use_y, st["tmy"],
                                                      st["tmz"]))
                            tmx2 = st["tmx"] + jnp.where(use_x, dlx, 0.0)
                            tmy2 = st["tmy"] + jnp.where(use_y, dly, 0.0)
                            tmz2 = st["tmz"] + jnp.where(use_z, dlz, 0.0)
                            oob = (((cx2 & ~hix) | (cy2 & ~hiy)
                                    | (cz2 & ~hiz)) != 0)
                            live = live & ~oob
                            out = dict(cx=cx2, cy=cy2, cz=cz2, tmx=tmx2,
                                       tmy=tmy2, tmz=tmz2, ft=ft2,
                                       ax=ax.astype(jnp.int32),
                                       live=live.astype(jnp.int32),
                                       h_bit=h_bit, h_ft=h_ft, h_ax=h_ax,
                                       stp=st["stp"])
                            if track_steps:
                                out["stp"] = st["stp"] \
                                    + jnp.where(live_b, 1, 0)
                            return out

                        def fine_cond(c):
                            fi, st = c
                            return (fi < fine_iters) \
                                & (jnp.sum(st["live"]) > 0)

                        def fine_body(c):
                            fi, st = c
                            for _ in range(fine_unroll):
                                st = fine_step(st)
                            return (fi + fine_unroll, st)

                        _, st = jax.lax.while_loop(fine_cond, fine_body,
                                                   (jnp.int32(0), st0))

                        t_new = enter + st["h_ft"] * (1.0 / vpu)
                        better = (st["h_bit"] >= 0) & (t_new < hit_t)
                        hit_t = jnp.where(better, t_new, hit_t)
                        sgn_ax = pick3(sgnx, sgny, sgnz, st["h_ax"])
                        hit_ax = jnp.where(
                            better,
                            st["h_ax"] * 2 + jnp.where(sgn_ax > 0, 1, 0),
                            hit_ax)

                        if mat16 and fetch_mat:
                            # per-cell mat16 gather-then-select; the hit's
                            # cell comes from its patch-local u/v high bits
                            def with_mat(hm):
                                hp = jnp.maximum(st["h_bit"], 0)
                                hcx = hp & 31
                                hcy = (hp >> 5) & 31
                                hcz = hp >> 10
                                hbit = ((((hcz & 15) << 4)
                                         + (hcy & 15)) << 4) + (hcx & 15)
                                hu_hi = pick3(hcx, hcy, hcz, ku) >> 4
                                hv_hi = pick3(hcx, hcy, hcz, kv) >> 4
                                wi = hbit >> 2
                                lane = wi & 127
                                sel = wi >> 7
                                mws = []
                                for (bidx_c, _occ_c, _c_ok) in cells:
                                    gm = [jnp.take_along_axis(
                                        jnp.broadcast_to(
                                            matw_ref[bidx_c * 8 + r, :]
                                            [None, :], shape),
                                        lane, axis=1) for r in range(8)]
                                    l1 = [jnp.where((sel & 1) == 0, gm[i],
                                                    gm[i + 1])
                                          for i in (0, 2, 4, 6)]
                                    l2 = [jnp.where((sel & 2) == 0, l1[i],
                                                    l1[i + 1])
                                          for i in (0, 2)]
                                    mws.append(jnp.where((sel & 4) == 0,
                                                         l2[0], l2[1]))
                                m_v0 = jnp.where(hu_hi == 0, mws[0],
                                                 mws[1])
                                m_v1 = jnp.where(hu_hi == 0, mws[2],
                                                 mws[3])
                                mword = jnp.where(hv_hi == 0, m_v0, m_v1)
                                mbyte = (mword >> ((hbit & 3) * 8)) & 255
                                return jnp.where(better, mbyte, hm)

                            hit_mat = jax.lax.cond(
                                jnp.any(better), with_mat,
                                lambda hm: hm, hit_mat)
                        return (hit_t, hit_mat, hit_ax, st["stp"])

                    hit_t, hit_mat, hit_ax, steps = jax.lax.cond(
                        jnp.any(cross), fine,
                        lambda c: c, (hit_t, hit_mat, hit_ax, steps))
                    return (hit_t, hit_mat, hit_ax, steps, done_i)

                return jax.lax.cond(
                    occ_any > 0, occupied, lambda c: c,
                    (hit_t, hit_mat, hit_ax, steps, done_i))

            if traversal == "run":
                n_ru = jnp.where(any_in, (iu1 >> 3) - (iu0 >> 3) + 1, 0)
                total = n_v * n_ru
                overflow = total > max_bricks_per_tile
                resolved_i = jnp.where(in_slice & overflow, 0, resolved_i)
                n_runs = jnp.minimum(total, max_bricks_per_tile)
                carry2 = jax.lax.fori_loop(
                    0, n_runs, run_body,
                    (hit_t, hit_mat, hit_ax, steps, done_i, resolved_i))
                hit_t, hit_mat, hit_ax, steps, done_i, resolved_i = carry2
            elif traversal == "patch":
                total = n_pu * n_pv
                overflow = total > max_bricks_per_tile
                resolved_i = jnp.where(in_slice & overflow, 0, resolved_i)
                n_patches = jnp.minimum(total, max_bricks_per_tile)
                carry2 = jax.lax.fori_loop(
                    0, n_patches, patch_body,
                    (hit_t, hit_mat, hit_ax, steps, done_i))
                hit_t, hit_mat, hit_ax, steps, done_i = carry2
            else:
                total = n_u * n_v
                overflow = total > max_bricks_per_tile
                resolved_i = jnp.where(in_slice & overflow, 0, resolved_i)
                n_bricks = jnp.minimum(total, max_bricks_per_tile)
                carry2 = jax.lax.fori_loop(
                    0, n_bricks * (1 if deep_box else slice_depth),
                    brick_body,
                    (hit_t, hit_mat, hit_ax, steps, done_i))
                hit_t, hit_mat, hit_ax, steps, done_i = carry2
            fin = (hit_t < BIG) | (active0 & (t1 >= tmax - 1e-7))
            done_i = jnp.where(fin, 1, done_i)
            return (hit_t, hit_mat, hit_ax, steps, done_i, resolved_i)

        init_done = (~active0).astype(jnp.int32)

        n_windows = (nk + slice_depth - 1) // slice_depth

        def outer_cond(c):
            si, carry = c
            return (si < n_windows) & (jnp.sum(1 - carry[4]) > 0)

        def outer_body(c):
            si, carry = c
            return (si + 1, slice_body(si, carry))

        _, (hit_t, hit_mat, hit_ax, steps, done_i, resolved_i) = (
            jax.lax.while_loop(
                outer_cond, outer_body,
                (jnp.int32(0),
                 (hit_t, hit_mat, hit_ax, steps, init_done,
                  resolved.astype(jnp.int32)))))

        if vote_mats:
            # tile-end material vote loop: coherent tiles hit only a few
            # distinct bricks; fetch each once (row load + lane gather —
            # with matw in HBM, one 512-byte DMA per distinct brick)
            h_info = hit_mat
            pending0 = ((hit_t < BIG) & (h_info >= 0)).astype(jnp.int32)

            def mat_cond(c):
                it, pending_i, hm = c
                return (it < mat_rounds) & (jnp.sum(pending_i) > 0)

            def mat_body(c):
                it, pending_i, hm = c
                p = pending_i > 0
                bsel = jnp.min(jnp.where(p, h_info >> 9, jnp.int32(1 << 30)))
                sel = p & ((h_info >> 9) == bsel)
                if matw_space == "hbm":
                    dma = pltpu.make_async_copy(
                        matw_ref.at[pl.ds(bsel, 1)], mat_scratch, mat_sem)
                    dma.start()
                    dma.wait()
                    mrow = jnp.broadcast_to(mat_scratch[0, :][None, :], shape)
                elif matw_space == "compact":
                    # giant sparse scenes: matw holds only OCCUPIED bricks;
                    # the wsm slot carries the brick->slot remap (SMEM)
                    slot = wsm_ref[0, bsel]
                    mrow = jnp.broadcast_to(matw_ref[slot, :][None, :],
                                            shape)
                else:
                    mrow = jnp.broadcast_to(matw_ref[bsel, :][None, :], shape)
                hb = h_info & 511
                mword = jnp.take_along_axis(mrow, hb >> 2, axis=1)
                mbyte = (mword >> ((hb & 3) * 8)) & 255
                hm = jnp.where(sel, mbyte, hm)
                return (it + 1, (p & ~sel).astype(jnp.int32), hm)

            _, pending_end, hit_mat = jax.lax.while_loop(
                mat_cond, mat_body,
                (jnp.int32(0), pending0, jnp.zeros(shape, jnp.int32)))
            # vote-budget overflow: hand unresolved lanes to the fallback
            # instead of silently shading them with palette entry 0
            resolved_i = jnp.where(pending_end > 0, 0, resolved_i)
        elif defer_mat:
            # deferred mode but materials unused (trace-only consumer):
            # don't leak packed hit info through the aux mat byte
            hit_mat = jnp.zeros(shape, jnp.int32)

        # ---- shade: palette albedo via lane gathers ------------------------
        hit = (hit_t < BIG) & (resolved_i > 0)
        if shading == "trace":
            # trace-only: consumers read t + aux; no shade stage
            aux = (hit_mat | (hit_ax << AUX_AX_SHIFT)
                   | (resolved_i << AUX_RESOLVED_SHIFT)
                   | (jnp.minimum(steps, 0x7ffff) << AUX_STEPS_SHIFT))
            rgba_ref[:] = jnp.zeros(shape, jnp.int32)
            t_ref[:] = jnp.where(hit, hit_t, BIG)
            aux_ref[:] = aux
            return
        pidx = hit_mat & 127
        hi_half = hit_mat >= 128
        alb = []
        for c in range(3):
            lo = jnp.take_along_axis(
                jnp.broadcast_to(pal_ref[2 * c, :][None, :], shape), pidx,
                axis=1)
            hi = jnp.take_along_axis(
                jnp.broadcast_to(pal_ref[2 * c + 1, :][None, :], shape), pidx,
                axis=1)
            alb.append(jnp.where(hi_half, hi, lo))

        if shading == "lambert":
            # world normal axis component vs sun — N = -step on hit axis
            axis_k = hit_ax >> 1
            sgn = jnp.where((hit_ax & 1) == 1, -1.0, 1.0)  # -step sign
            # world rows of R for the hit axis (cam_ref[12:21] = rot)
            nxw = pick3(cam_ref[12], cam_ref[13], cam_ref[14], axis_k)
            nyw = pick3(cam_ref[15], cam_ref[16], cam_ref[17], axis_k)
            nzw = pick3(cam_ref[18], cam_ref[19], cam_ref[20], axis_k)
            ndl = (nxw * cam_ref[21] + nyw * cam_ref[22]
                   + nzw * cam_ref[23]) * sgn
            irr = jnp.maximum(ndl, 0.0) * cam_ref[25] + ambient
            alb = [a * irr for a in alb]

        # ---- sky for misses -------------------------------------------------
        if sky_mode == "analytic":
            # transcendental-heavy: skip entirely for tiles the volume
            # fully covers (interior tiles of a close-up scene)
            def _sky(_):
                # world-space dir: columns of R (cam_ref[12:21] row-major R)
                dwx = cam_ref[12] * dx + cam_ref[13] * dy + cam_ref[14] * dz
                dwy = cam_ref[15] * dx + cam_ref[16] * dy + cam_ref[17] * dz
                dwz = cam_ref[18] * dx + cam_ref[19] * dy + cam_ref[20] * dz
                return _analytic_sky((dwx, dwy, dwz),
                                     (cam_ref[21], cam_ref[22], cam_ref[23]))

            sky = jax.lax.cond(
                jnp.all(hit), lambda _: [jnp.zeros(shape, jnp.float32)] * 3,
                _sky, 0)
        elif sky_mode == "constant":
            sky = [jnp.full(shape, 0.0, jnp.float32) + cam_ref[26 + c]
                   for c in range(3)]
        else:
            sky = [jnp.zeros(shape, jnp.float32)] * 3

        rgb = [jnp.where(hit, a, s) for a, s in zip(alb, sky)]
        if shading == "raw":
            # un-tonemapped albedo8 for multi-pass pipelines (relighting
            # happens outside; palette entries are 8-bit so this is exact)
            rgb8 = [jnp.clip(v * 255.0 + 0.5, 0.0, 255.0).astype(jnp.int32)
                    for v in rgb]
        else:
            rgb8 = [jnp.clip(_aces(v) * 255.0 + 0.5, 0.0,
                             255.0).astype(jnp.int32) for v in rgb]
        rgba = rgb8[0] | (rgb8[1] << 8) | (rgb8[2] << 16) | jnp.int32(-(1 << 24))

        aux = (hit_mat | (hit_ax << AUX_AX_SHIFT)
               | (resolved_i << AUX_RESOLVED_SHIFT)
               | (jnp.minimum(steps, 0x7ffff) << AUX_STEPS_SHIFT))
        rgba_ref[:] = rgba
        t_ref[:] = jnp.where(hit, hit_t, BIG)
        aux_ref[:] = aux

    return kernel


def camera_params(cam_local, rot, sun_dir, sun_scale, sky_const, width,
                  height):
    """Pack camera + shading scalars for SMEM.

    cam_local: (pos_l, tl_l, tr_l, bl_l) in volume-local space.
    rot: (3,3) local->world. Layout: [0:3] pos, [3:6] tl, [6:9] ddx,
    [9:12] ddy, [12:21] rot row-major, [21:24] sun dir, [24] unused,
    [25] sun scale, [26:29] constant sky color.
    """
    pos_l, tl_l, tr_l, bl_l = cam_local
    ddx = (tr_l - tl_l) / width
    ddy = (bl_l - tl_l) / height
    return jnp.concatenate([
        pos_l, tl_l, ddx, ddy, jnp.reshape(rot, (9,)),
        jnp.asarray(sun_dir, jnp.float32), jnp.zeros((1,), jnp.float32),
        jnp.asarray([sun_scale], jnp.float32),
        jnp.asarray(sky_const, jnp.float32).reshape(3),
    ]).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("bsize", "vpu", "width", "height", "tile_rows",
                     "tile_w", "max_bricks_per_tile", "fine_iters",
                     "sky_mode", "shading", "ambient", "word_gather",
                     "fetch_mat", "fine_unroll", "track_steps",
                     "interpret", "slice_depth", "traversal", "mat_rounds",
                     "brick", "mat_bsize", "matw_space", "mat16",
                     "footprint", "sub_skip", "conv_rows"))
def render_mega_tiles(cam16, occ, occw, wsm, matw, pal, *, bsize, vpu, width,
                      height, tile_rows=8, tile_w=32,
                      max_bricks_per_tile=64, fine_iters=24,
                      sky_mode="analytic", shading="flat", ambient=0.2,
                      word_gather=True, fetch_mat=True, fine_unroll=1,
                      track_steps=True, interpret=False, slice_depth=1,
                      traversal="brick", mat_rounds=128, brick=BRICK,
                      mat_bsize=None, matw_space="vmem", mat16=False,
                      footprint="corners", sub_skip=False, conv_rows=0):
    """Fused frame in square-tile order. Returns (rgba i32, t f32, aux i32)
    each shaped (n_tiles*tile_rows, 128).

    brick=16: pass the 16^3 tables from `pack_mega16` as (occ, occw) with
    `bsize` = 16-brick dims, keep the 8^3 `matw` and set `mat_bsize` to the
    8-brick dims.  mat16=True: `matw` is instead the (NB16*8, 128)
    `pack_mat16` table and materials resolve in-brick (no vote loop) —
    fastest when the table fits VMEM."""
    tile_h = tile_rows * LANES // tile_w
    assert width % tile_w == 0 and height % tile_h == 0, \
        f"{width}x{height} not divisible by {tile_w}x{tile_h} tiles"
    nx, ny = width // tile_w, height // tile_h
    n_tiles = nx * ny

    kernel = _make_mega_kernel(
        bsize, vpu, tile_rows=tile_rows, tile_w=tile_w, nx_tiles=nx,
        max_bricks_per_tile=max_bricks_per_tile, fine_iters=fine_iters,
        sky_mode=sky_mode, shading=shading, ambient=ambient,
        word_gather=word_gather, fetch_mat=fetch_mat,
        fine_unroll=fine_unroll, track_steps=track_steps,
        slice_depth=slice_depth, traversal=traversal, mat_rounds=mat_rounds,
        brick=brick, mat_bsize=mat_bsize, matw_space=matw_space,
        mat16=mat16, footprint=footprint, sub_skip=sub_skip,
        conv_rows=conv_rows)

    out_block = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    fixed = lambda i: (0, 0)
    if matw_space == "hbm":
        matw_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [pltpu.VMEM((1, 128), jnp.int32),
                   pltpu.SemaphoreType.DMA]
    else:
        matw_spec = pl.BlockSpec(matw.shape, fixed, memory_space=pltpu.VMEM)
        scratch = []
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # cam
            pl.BlockSpec(occ.shape, fixed, memory_space=pltpu.SMEM),
            pl.BlockSpec(occw.shape, fixed, memory_space=pltpu.VMEM),
            # the wsm slot doubles as the pack_sub4 table (VMEM, lane-
            # gathered) for the hierarchical march
            pl.BlockSpec(wsm.shape, fixed,
                         memory_space=(pltpu.VMEM
                                       if traversal == "hier" or sub_skip
                                       else pltpu.SMEM)),
            matw_spec,
            pl.BlockSpec((8, 128), fixed, memory_space=pltpu.VMEM),  # pal
        ],
        out_specs=[out_block] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * tile_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles * tile_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * tile_rows, LANES), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(cam16, occ, occw, wsm, matw, pal)
    return outs


# ---------------------------------------------------------------------------
# Host-side wrapper: whole-frame rendering on a single volume
# ---------------------------------------------------------------------------

def untile(x, height, width, tile_h, tile_w):
    """Tile-major (H*W, ...) -> image row-major (H*W, ...)."""
    rest = x.shape[1:]
    x = x.reshape(height // tile_h, width // tile_w, tile_h, tile_w, *rest)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(height * width, *rest)


class MegaVolume:
    """Host bundle for the megakernel: packed tables + transform + palette."""

    def __init__(self, volume):
        self.volume = volume
        self.tables = pack_mega(volume.grid, volume.vpu)
        self.occ16, self.occw16, self.bsize16 = pack_mega16(volume.grid)
        self.matw16 = pack_mat16(volume.grid)
        self.sub4 = pack_sub4(volume.grid)
        self.occw3 = None          # per-axis tables packed on first use
        self.sub4x = None          # per-axis sub4 tables packed on first use
        self.occ32 = None          # 32^3 tables packed on first use
        self.pal = pack_palette(volume.palette)
        self.rot = jnp.asarray(volume.rot, jnp.float32)
        self.pos = jnp.asarray(volume.pos, jnp.float32)
        self.pivot = jnp.asarray(volume.pivot, jnp.float32)

    def _ensure32(self):
        if self.occ32 is None:
            self.occ32, self.occw32, self.bsize32 = pack_mega32(
                self.volume.grid)

    def refresh(self):
        """Re-pack after dynamic edits (set_voxel analog, vv.cpp:377-432)."""
        self.tables = pack_mega(self.volume.grid, self.volume.vpu)
        self.occ16, self.occw16, self.bsize16 = pack_mega16(self.volume.grid)
        self.matw16 = pack_mat16(self.volume.grid)
        self.sub4 = pack_sub4(self.volume.grid)
        if self.occw3 is not None:
            self.occw3 = pack_mega16_axes(self.volume.grid)
        if getattr(self, "sub4x", None) is not None:
            self.sub4x = pack_sub4_axes(self.volume.grid)
        if self.occ32 is not None:
            self.occ32, self.occw32, self.bsize32 = pack_mega32(
                self.volume.grid)
        self._compact = None
        self.pal = pack_palette(self.volume.palette)
        self.pos = jnp.asarray(self.volume.pos, jnp.float32)
        self.rot = jnp.asarray(self.volume.rot, jnp.float32)

    def brick16_kw(self):
        """kwargs for render_mega_tiles in 16^3 super-brick mode."""
        return dict(bsize=self.bsize16, brick=16,
                    mat_bsize=self.tables.bsize, vpu=self.tables.vpu)

    def ensure_axes(self):
        """Pack (and cache) the per-axis occw3 table for hier3."""
        if self.occw3 is None:
            self.occw3 = pack_mega16_axes(self.volume.grid)
        return self.occw3

    def ensure_sub_axes(self):
        """Pack (and cache) the per-axis sub4 table for hier3 sub_skip."""
        if getattr(self, "sub4x", None) is None:
            self.sub4x = pack_sub4_axes(self.volume.grid)
        return self.sub4x

    def brick32_kw(self):
        """kwargs for render_mega_tiles in 32^3 super-brick mode
        (pass `self.occ32, self.occw32` as the occ/occw tables)."""
        self._ensure32()
        return dict(bsize=self.bsize32, brick=32,
                    mat_bsize=self.tables.bsize, vpu=self.tables.vpu)

    def mat16_fits_vmem(self, budget_bytes=4 * 2**20):
        return self.matw16.size * 4 <= budget_bytes

    def compact_matw(self):
        """(matw_c, remap) for matw_space='compact' (cached)."""
        if getattr(self, "_compact", None) is None:
            self._compact = pack_compact_matw(self.tables)
        return self._compact

    def set_voxel(self, x: int, y: int, z: int, val: int):
        """O(1) single-voxel edit: host grid + all packed device tables
        (the fast-path analog of vv.cpp:377-432 — no full repack)."""
        self.volume.set_voxel(x, y, z, val)
        self.tables = set_voxel_tables(self.tables, x, y, z, val)
        self.occ16, self.occw16 = set_voxel_tables16(
            self.occ16, self.occw16, self.bsize16, x, y, z, val)
        self.matw16 = set_voxel_mat16(self.matw16, self.bsize16, x, y, z,
                                      val)
        self.sub4 = set_voxel_sub4(self.sub4, self.occw16, self.bsize16,
                                   x, y, z, val)
        if self.occw3 is not None:
            self.occw3 = set_voxel_occw3(self.occw3, self.bsize16,
                                         x, y, z, val)
        if getattr(self, "sub4x", None) is not None:
            self.sub4x = set_voxel_sub4_axes(self.sub4x, self.occw16,
                                             self.bsize16, x, y, z, val)
        if self.occ32 is not None:
            self.occ32, self.occw32 = set_voxel_tables32(
                self.occ32, self.occw32, self.bsize32, x, y, z, val)
        self._compact = None      # lazily re-packed on next compact use


def mega_camera(mv: MegaVolume, camera, sun_dir, width, height,
                sun_scale=1.0, sky_const=(0.0, 0.0, 0.0)):
    """World camera -> packed SMEM params in the volume's local frame."""
    from voxel_tracer_tpu.ops.composite import _mat3_t_apply

    def to_local_pt(p):
        return _mat3_t_apply(mv.rot, jnp.asarray(p, jnp.float32) - mv.pos) \
            + mv.pivot

    cam_local = (to_local_pt(camera.pos), to_local_pt(camera.tl),
                 to_local_pt(camera.tr), to_local_pt(camera.bl))
    return camera_params(cam_local, mv.rot, sun_dir, sun_scale, sky_const,
                         width, height)


@functools.partial(
    jax.jit,
    static_argnames=("bsize", "vpu", "width", "height", "tile_rows",
                     "tile_w", "sky_mode", "shading", "ambient",
                     "max_bricks_per_tile", "fine_iters", "word_gather",
                     "fetch_mat", "fine_unroll", "track_steps", "interpret"))
def _render_mega_frame(cam_p, occ, occw, wsm, matw, pal, *, bsize, vpu,
                       width, height, tile_rows, tile_w, sky_mode, shading,
                       ambient, max_bricks_per_tile, fine_iters,
                       word_gather, fetch_mat, fine_unroll, track_steps,
                       interpret):
    rgba, t, aux = render_mega_tiles(
        cam_p, occ, occw, wsm, matw, pal, bsize=bsize, vpu=vpu, width=width,
        height=height, tile_rows=tile_rows, tile_w=tile_w,
        sky_mode=sky_mode, shading=shading, ambient=ambient,
        max_bricks_per_tile=max_bricks_per_tile, fine_iters=fine_iters,
        word_gather=word_gather, fetch_mat=fetch_mat,
        fine_unroll=fine_unroll, track_steps=track_steps,
        interpret=interpret)
    tile_h = tile_rows * LANES // tile_w
    n = width * height
    rgba = untile(rgba.reshape(n), height, width, tile_h, tile_w)
    t = untile(t.reshape(n), height, width, tile_h, tile_w)
    aux = untile(aux.reshape(n), height, width, tile_h, tile_w)
    img = jnp.stack([(rgba >> s) & 255 for s in (0, 8, 16)],
                    axis=-1).astype(jnp.uint8)
    return dict(
        image=img.reshape(height, width, 3),
        depth=t.reshape(height, width),
        mat=(aux & 255).reshape(height, width),
        steps=((aux >> AUX_STEPS_SHIFT) & 0x7ffff).reshape(height, width),
        resolved=((aux >> AUX_RESOLVED_SHIFT) & 1).reshape(height, width),
    )


def render_mega(mv: MegaVolume, camera, width, height, *, sun_dir=None,
                sun_scale=1.0, sky_mode="analytic", shading="flat",
                ambient=0.2, tile_rows=8, tile_w=32,
                max_bricks_per_tile=64, fine_iters=24,
                sky_const=(0.0, 0.0, 0.0), word_gather=True,
                fetch_mat=True, fine_unroll=1, track_steps=True,
                interpret=False):
    """Fully fused flat/lambert frame (RGBA8 image + depth/mat/steps AOVs)."""
    from voxel_tracer_tpu.models.scene import SUN_DIR

    sd = jnp.asarray(SUN_DIR if sun_dir is None else sun_dir, jnp.float32)
    cam_p = mega_camera(mv, camera, sd, width, height, sun_scale, sky_const)
    tb = mv.tables
    tile_h = tile_rows * LANES // tile_w
    wp = -(-width // tile_w) * tile_w    # pad to tile grid, crop after
    hp = -(-height // tile_h) * tile_h
    if (wp, hp) != (width, height):
        out = _render_mega_frame(
            cam_p, tb.occ, tb.occw, tb.wsm, tb.matw, mv.pal, bsize=tb.bsize,
            vpu=tb.vpu, width=wp, height=hp, tile_rows=tile_rows,
            tile_w=tile_w, sky_mode=sky_mode, shading=shading,
            ambient=ambient, max_bricks_per_tile=max_bricks_per_tile,
            fine_iters=fine_iters, word_gather=word_gather,
            fetch_mat=fetch_mat, fine_unroll=fine_unroll,
            track_steps=track_steps, interpret=interpret)
        return {kk: vv[:height, :width] for kk, vv in out.items()}
    return _render_mega_frame(
        cam_p, tb.occ, tb.occw, tb.wsm, tb.matw, mv.pal, bsize=tb.bsize,
        vpu=tb.vpu, width=width, height=height, tile_rows=tile_rows,
        tile_w=tile_w, sky_mode=sky_mode, shading=shading, ambient=ambient,
        max_bricks_per_tile=max_bricks_per_tile, fine_iters=fine_iters,
        word_gather=word_gather, fetch_mat=fetch_mat,
        fine_unroll=fine_unroll, track_steps=track_steps,
        interpret=interpret)


# ---------------------------------------------------------------------------
# Ray-list tracing (shadow rays, bounce wavefronts) + fast lit pipeline
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("bsize", "vpu", "tile_rows", "max_bricks_per_tile",
                     "fine_iters", "fetch_mat", "fine_unroll",
                     "track_steps", "word_gather", "interpret", "brick",
                     "mat_bsize", "matw_space", "traversal", "slice_depth"))
def trace_rays(o_l, d_l, occ, occw, wsm, matw, *, bsize, vpu, tile_rows=8,
               max_bricks_per_tile=64, fine_iters=24, fetch_mat=False,
               fine_unroll=4, track_steps=False, word_gather=True,
               interpret=False, brick=BRICK, mat_bsize=None,
               matw_space="vmem", traversal="brick", slice_depth=1):
    """Trace N local-space rays through the fast kernel (ray_source='refs').

    The ray-list twin of `render_mega_tiles` — for shadow rays and bounce
    wavefronts whose origins are scattered (no shared pinhole).  N must be
    a multiple of tile_rows*128 (pad outside, see `pad_rays`).  Returns a
    dict of (N,) arrays: t (BIG = miss), mat (0 unless fetch_mat), ax
    (axis*2 + step-sign>0), steps, resolved.
    """
    n = o_l.shape[0]
    tile = tile_rows * LANES
    assert n % tile == 0, f"{n} rays not a multiple of {tile}"
    n_tiles = n // tile
    comps = [o_l[:, i].reshape(n_tiles * tile_rows, LANES) for i in range(3)]
    comps += [d_l[:, i].reshape(n_tiles * tile_rows, LANES) for i in range(3)]

    kernel = _make_mega_kernel(
        bsize, vpu, tile_rows=tile_rows, tile_w=128, nx_tiles=n_tiles,
        max_bricks_per_tile=max_bricks_per_tile, fine_iters=fine_iters,
        sky_mode="none", shading="trace", ambient=0.0,
        word_gather=word_gather, fetch_mat=fetch_mat,
        fine_unroll=fine_unroll, track_steps=track_steps,
        ray_source="refs", brick=brick, mat_bsize=mat_bsize,
        matw_space=matw_space, traversal=traversal,
        slice_depth=slice_depth)

    cam = jnp.zeros((29,), jnp.float32)
    pal = jnp.zeros((8, 128), jnp.float32)
    block = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    fixed = lambda i: (0, 0)
    if matw_space == "hbm":
        matw_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [pltpu.VMEM((1, 128), jnp.int32),
                   pltpu.SemaphoreType.DMA]
    else:
        matw_spec = pl.BlockSpec(matw.shape, fixed, memory_space=pltpu.VMEM)
        scratch = []
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *([block] * 6),
            pl.BlockSpec(occ.shape, fixed, memory_space=pltpu.SMEM),
            pl.BlockSpec(occw.shape, fixed, memory_space=pltpu.VMEM),
            # 'hier' lane-gathers the pack_sub4 table through wsm: VMEM
            # (mirrors render_mega_tiles' conditional spec)
            pl.BlockSpec(wsm.shape, fixed,
                         memory_space=(pltpu.VMEM if traversal == "hier"
                                       else pltpu.SMEM)),
            matw_spec,
            pl.BlockSpec((8, 128), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=[block] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * tile_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles * tile_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * tile_rows, LANES), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(cam, *comps, occ, occw, wsm, matw, pal)
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


@functools.partial(
    jax.jit,
    static_argnames=("bsize", "vpu", "width", "height", "tile_rows",
                     "tile_w", "ambient", "fine_unroll", "interpret",
                     "shadow_tile_rows", "track_steps", "real_width",
                     "real_height", "brick", "mat_bsize", "matw_space",
                     "fine_iters", "mat16", "traversal", "accumulate",
                     "slice_depth", "shadow_slice_depth", "shadow_block"))
def _render_lambert_mega(cam_p, rot, pos, pivot, sun_dir, sun_light, occ,
                         occw, wsm, matw, pal, camera, *, bsize, vpu, width,
                         height, tile_rows, tile_w, ambient, fine_unroll,
                         interpret, shadow_tile_rows, track_steps,
                         real_width=None, real_height=None, brick=BRICK,
                         mat_bsize=None, matw_space="vmem", fine_iters=24,
                         mat16=False, traversal="brick", accumulate=False,
                         prev_accu=None, prev_planes=None,
                         depth_delta=0.0, slice_depth=1,
                         shadow_slice_depth=1, shadow_block=True):
    from voxel_tracer_tpu.models.camera import primary_rays
    from voxel_tracer_tpu.ops.composite import _mat3_t_apply, _to_local

    rw = real_width or width      # frustum mapping uses REAL dims; padded
    rh = real_height or height    # pixels extrapolate outside it

    # pass 1: fused primary rays -> raw albedo8 + depth + mat/axis
    rgba, t, aux = render_mega_tiles(
        cam_p, occ, occw, wsm, matw, pal, bsize=bsize, vpu=vpu,
        width=width, height=height, tile_rows=tile_rows, tile_w=tile_w,
        sky_mode="none", shading="raw", fine_unroll=fine_unroll,
        track_steps=track_steps, interpret=interpret, brick=brick,
        mat_bsize=mat_bsize, matw_space=matw_space, fine_iters=fine_iters,
        mat16=mat16, traversal=traversal, slice_depth=slice_depth)
    tile_h = tile_rows * LANES // tile_w
    n = width * height
    t = untile(t.reshape(n), height, width, tile_h, tile_w)
    aux = untile(aux.reshape(n), height, width, tile_h, tile_w)
    rgba = untile(rgba.reshape(n), height, width, tile_h, tile_w)

    hit = t < BIG
    alb = jnp.stack([(rgba >> s) & 255 for s in (0, 8, 16)],
                    axis=-1).astype(jnp.float32) / 255.0
    ax = (aux >> AUX_AX_SHIFT) & 7
    axis_k = ax >> 1
    sgn = jnp.where((ax & 1) == 1, -1.0, 1.0)     # normal = -step sign
    n_local = jax.nn.one_hot(axis_k, 3, dtype=jnp.float32) * sgn[:, None]
    normal = n_local @ rot.T                      # local -> world rows

    # primary dirs (world) — elementwise, no gathers
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32),
                          indexing="ij")
    origins, dirs = primary_rays(camera, xs, ys, rw, rh)
    origins = origins.reshape(-1, 3)
    dirs = dirs.reshape(-1, 3)

    # pass 2: shadow rays toward the sun from offset hit points.
    # Back-facing surfaces (N.L <= 0) are dark regardless of occlusion —
    # park their rays with the miss rays so the kernel slab-rejects them
    incidence = jnp.sum(normal * sun_dir, axis=-1)
    need_shadow = hit & (incidence > 0.0)
    p_w = origins + dirs * jnp.minimum(t, BIG)[:, None] + normal * 1e-4
    p_w = jnp.where(need_shadow[:, None], p_w, 1e6)
    sdirs = jnp.broadcast_to(sun_dir, p_w.shape)
    o_s, d_s = _to_local(rot, pos, pivot, p_w, sdirs)
    # Square-block shadow tiling: the flat list is raster-major, so a
    # 16k-ray tile is a 1920-px-wide strip whose hit points span the
    # whole scene — the per-slice footprint rects blow up.  Reordering
    # so each kernel tile is a SQUARE pixel block (pure reshape, no
    # gathers) keeps each tile's shadow origins spatially tight, the
    # ray-list rebirth of the camera pass's square tiling.
    sb = None
    if shadow_block:
        area = shadow_tile_rows * LANES
        th = int(np.sqrt(area))
        while th > 1 and (height % th or width % (area // th)):
            th //= 2
        tw = area // th
        if th > 1 and height % th == 0 and width % tw == 0:
            sb = (th, tw)
            from voxel_tracer_tpu.ops.pallas.diffint import (
                tile_raster, untile_raster)
            o_s = tile_raster(o_s, height, width, th, tw)
            d_s = tile_raster(d_s, height, width, th, tw)
    # miss rays trace from far outside the volume: instant slab reject
    pad = (-n) % (shadow_tile_rows * LANES)
    if pad:
        o_s = jnp.concatenate(
            [o_s, jnp.full((pad, 3), 1e6, jnp.float32)], axis=0)
        d_s = jnp.concatenate(
            [d_s, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
                           (pad, 1))], axis=0)
    # hier3p is a window-pair mode: at shadow_slice_depth=1 the shadow
    # list falls back to plain hier3 on the same per-axis tables
    sh_trav = ("hier3" if traversal == "hier3p" and shadow_slice_depth == 1
               else traversal)
    sh = trace_rays(o_s, d_s, occ, occw, wsm,
                    jnp.zeros((1, 128), jnp.int32),   # no materials needed
                    bsize=bsize, vpu=vpu, tile_rows=shadow_tile_rows,
                    fine_unroll=fine_unroll, fine_iters=fine_iters,
                    interpret=interpret, brick=brick, mat_bsize=mat_bsize,
                    traversal=sh_trav, slice_depth=shadow_slice_depth)
    sh_t, sh_res, sh_steps = sh["t"], sh["resolved"], sh["steps"]
    if sb is not None:
        from voxel_tracer_tpu.ops.pallas.diffint import untile_raster
        sh_t = untile_raster(sh_t[:n], height, width, sb[0], sb[1])
        sh_res = untile_raster(sh_res[:n], height, width, sb[0], sb[1])
        sh_steps = untile_raster(sh_steps[:n], height, width, sb[0], sb[1])
    occluded = (sh_t[:n] < BIG) & sh_res[:n]
    # unresolved shadow rays (sun fighting the tile axis) fall back to lit

    lit = need_shadow & ~occluded
    irr = jnp.where(lit[:, None], sun_light * incidence[:, None], 0.0) \
        + ambient

    out = {}
    if accumulate:
        # temporal reprojection of the irradiance term on the kernel
        # path (renderer.cpp:273-329 runs this on the hot path): hit
        # points come straight from the kernel's t output
        from voxel_tracer_tpu.ops.reproject import reproject_accumulate
        hit_points = origins + dirs * jnp.minimum(t, BIG)[:, None]
        irr, new_accu = reproject_accumulate(
            irr, jnp.where(hit, t, BIG), hit_points, prev_accu,
            prev_planes, width, height, depth_delta=depth_delta,
            reproject_mask=hit)
        out["accu"] = new_accu

    sun_n = sun_dir / jnp.linalg.norm(sun_dir)
    sky = jnp.stack(_analytic_sky(
        tuple(dirs[:, i] for i in range(3)), tuple(sun_n)), axis=-1)
    color = jnp.where(hit[:, None], alb * irr, sky)
    img = jnp.clip(_aces(color) * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    steps = (aux >> AUX_STEPS_SHIFT) & 0x7ffff
    out.update(
        image=img.reshape(height, width, 3),
        albedo=alb.reshape(height, width, 3),
        irradiance=irr.reshape(height, width, 3),
        depth=jnp.where(hit, t, BIG).reshape(height, width),
        normal=normal.reshape(height, width, 3),
        steps=(steps + sh_steps[:n]).reshape(height, width),
        material=(aux & 255).reshape(height, width),
    )
    return out


def render_lambert_mega(mv: MegaVolume, camera, width, height, *,
                        sun_dir=None, sun_light=None, ambient=0.2,
                        tile_rows=8, tile_w=32, fine_unroll=4,
                        interpret=False, shadow_tile_rows=8,
                        track_steps=True, use_brick16=False,
                        use_hier3=False, use_hier3p=False,
                        use_brick32=False,
                        slice_depth=1, shadow_slice_depth=1,
                        shadow_block=True,
                        prev_accu=None, prev_planes=None,
                        depth_delta=0.0):
    """Sun + shadow-ray lambert frame: fused primary pass (raw albedo) +
    ray-list shadow pass + gather-free XLA shading/tonemap.

    The fast analog of renderer_fast.render_lambert_fast (sun_light,
    shadow rays: materials.cpp:226-244 semantics, minus sphere lights).

    use_brick16: 16^3 super-brick traversal.  When the material table
    outgrows VMEM (giant merged scenes, e.g. the 512-crate profiling grid)
    it automatically stays in HBM with per-brick DMA in the material vote.

    prev_accu (H, W, 4) + prev_planes (4, 4): temporal reprojection on
    the kernel path — blends 95% irradiance history with depth rejection
    and returns the new accumulator as out["accu"] (pass
    ``camera.planes`` of THIS frame as next frame's prev_planes).
    Requires width/height to be tile multiples (the accu grid is unpadded).
    """
    from voxel_tracer_tpu.models.scene import SUN_DIR, SUN_LIGHT

    sd = jnp.asarray(SUN_DIR if sun_dir is None else sun_dir, jnp.float32)
    sl = jnp.asarray(SUN_LIGHT if sun_light is None else sun_light,
                     jnp.float32)
    cam_p = mega_camera(mv, camera, sd, width, height)
    tb = mv.tables
    tile_h = tile_rows * LANES // tile_w
    wp = -(-width // tile_w) * tile_w    # pad to tile grid, crop after
    hp = -(-height // tile_h) * tile_h
    dummy_wsm = jnp.zeros((1, 1), jnp.int32)
    if use_brick32:
        # 32^3 super-bricks: half the slice windows of brick16 on big
        # merged grids; materials via the 8^3 vote (compact when the
        # full table exceeds VMEM)
        mv._ensure32()
        kw32 = {k: v for k, v in mv.brick32_kw().items() if k != "vpu"}
        kw = dict(occ=mv.occ32, occw=mv.occw32, wsm=dummy_wsm,
                  fine_iters=96, **kw32)
        if mv.mat16_fits_vmem():
            kw.update(matw=tb.matw)
        else:
            matw_c, remap = mv.compact_matw()
            kw.update(matw=matw_c, wsm=remap, matw_space="compact")
    elif use_brick16 or use_hier3 or use_hier3p:
        kw = dict(occ=mv.occ16, occw=mv.occw16, wsm=dummy_wsm,
                  bsize=mv.bsize16, brick=16, mat_bsize=tb.bsize,
                  fine_iters=48)
        if use_hier3:
            # span-scanning march: per-axis occupancy word tables
            kw.update(occw=mv.ensure_axes(), traversal="hier3")
        if use_hier3p:
            # k-pair span scan: two-slice fused windows on the same
            # per-axis tables
            kw.update(occw=mv.ensure_axes(), traversal="hier3p")
            slice_depth = 2
        if mv.mat16_fits_vmem():
            # in-brick material resolve from the pack_mat16 table
            kw.update(matw=mv.matw16, mat16=True)
        else:
            # giant sparse scene: occupied-brick material subset in VMEM
            # + brick->slot remap through the wsm input ('hbm' DMA mode
            # is blocked by a Mosaic compile hang on this toolchain)
            matw_c, remap = mv.compact_matw()
            kw.update(matw=matw_c, wsm=remap, matw_space="compact")
    else:
        kw = dict(occ=tb.occ, occw=tb.occw, wsm=dummy_wsm, bsize=tb.bsize,
                  matw=tb.matw)
    accumulate = prev_accu is not None
    assert not (accumulate and (wp, hp) != (width, height)), \
        "accumulate requires tile-multiple width/height"
    out = _render_lambert_mega(
        cam_p, mv.rot, mv.pos, mv.pivot, sd, sl, pal=mv.pal,
        camera=camera, vpu=tb.vpu, width=wp,
        height=hp, tile_rows=tile_rows, tile_w=tile_w, ambient=ambient,
        fine_unroll=fine_unroll, interpret=interpret,
        shadow_tile_rows=shadow_tile_rows, track_steps=track_steps,
        real_width=width, real_height=height, accumulate=accumulate,
        prev_accu=prev_accu, prev_planes=prev_planes,
        depth_delta=jnp.float32(depth_delta), slice_depth=slice_depth,
        shadow_slice_depth=shadow_slice_depth, shadow_block=shadow_block,
        **kw)
    if (wp, hp) != (width, height):
        out = {kk: vv[:height, :width] for kk, vv in out.items()}
    return out
