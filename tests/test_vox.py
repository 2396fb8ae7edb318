"""MagicaVoxel loader tests against the real reference assets."""

import os

import numpy as np
import pytest

from voxel_tracer_tpu.models.vox import load_vox, parse_vox, _default_palette

ASSETS = "/root/reference/assets/vox"


def _has_assets():
    return os.path.isdir(ASSETS)


@pytest.mark.skipif(not _has_assets(), reason="reference assets not mounted")
class TestRealAssets:
    def test_crate16(self):
        m = load_vox(f"{ASSETS}/crate-16.vox")
        assert m.grid.ndim == 3
        assert (m.grid != 0).sum() > 0
        assert m.palette.shape == (256, 4)
        # crate-16 is a 32^3-ish crate model
        assert max(m.grid.shape) <= 64

    def test_glass_box(self):
        m = load_vox(f"{ASSETS}/testing/glass-box.vox")
        ids = np.unique(m.grid)
        assert 0 in ids and len(ids) > 1

    def test_enemy_drone(self):
        m = load_vox(f"{ASSETS}/enemy-drone.vox")
        assert (m.grid != 0).sum() > 10

    def test_palette_rgba(self):
        m = load_vox(f"{ASSETS}/crate-16.vox")
        # palette index 0 is transparent/empty
        assert tuple(m.palette[0]) == (0, 0, 0, 0)
        pf = m.palette_f32
        assert pf.shape == (256, 3)
        assert pf.max() <= 1.0

    def test_axis_remap_upright(self):
        """Reference remap puts vox Z (up) on our Y axis (vv.cpp:30)."""
        m = load_vox(f"{ASSETS}/enemy-drone.vox")
        gz, gy, gx = m.grid.shape
        assert (gx, gy, gz) != (0, 0, 0)


def test_synthetic_roundtrip():
    """Build a minimal .vox in memory and parse it."""
    import struct

    sx, sy, sz = 3, 4, 5
    voxels = [(0, 0, 0, 1), (2, 3, 4, 7), (1, 1, 1, 42)]
    size = struct.pack("<iii", sx, sy, sz)
    xyzi = struct.pack("<i", len(voxels)) + b"".join(
        struct.pack("<BBBB", *v) for v in voxels)

    def chunk(cid, content, children=b""):
        return cid + struct.pack("<ii", len(content), len(children)) + content + children

    body = chunk(b"SIZE", size) + chunk(b"XYZI", xyzi)
    data = b"VOX " + struct.pack("<i", 150) + chunk(b"MAIN", b"", body)

    models = parse_vox(data)
    assert len(models) == 1
    g = models[0].grid
    # our grid (Z, Y, X) = (sx, sz, sy)
    assert g.shape == (sx, sz, sy)
    # vox (vx,vy,vz) -> grid[vx, vz, sy-1-vy]
    assert g[0, 0, sy - 1 - 0] == 1
    assert g[2, 4, sy - 1 - 3] == 7
    assert g[1, 1, sy - 1 - 1] == 42


def test_default_palette_shape():
    pal = _default_palette()
    assert pal.shape == (256, 4)
    assert tuple(pal[0]) == (0, 0, 0, 0)
    assert tuple(pal[1]) == (255, 255, 255, 255)
