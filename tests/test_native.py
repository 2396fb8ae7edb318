"""Native C/C++ components: fast .vox parser and C++ oracle parity."""

import glob
import os

import numpy as np
import pytest

from voxel_tracer_tpu.models.vox import parse_vox, _native_module
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.ops import oracle, oracle_native

ASSETS = sorted(glob.glob("/root/reference/assets/vox/*.vox"))[:4]


@pytest.mark.skipif(_native_module() is None,
                    reason="native parser not built (native/build.sh)")
class TestNativeVoxParser:
    @pytest.mark.parametrize("path", ASSETS or ["missing"])
    def test_matches_python_parser(self, path):
        if not os.path.exists(path):
            pytest.skip("no reference assets")
        raw = open(path, "rb").read()
        a = parse_vox(raw, use_native=True)
        b = parse_vox(raw, use_native=False)
        assert len(a) == len(b)
        for ma, mb in zip(a, b):
            np.testing.assert_array_equal(ma.grid, mb.grid)
            np.testing.assert_array_equal(ma.palette, mb.palette)


@pytest.mark.skipif(not oracle_native.available(),
                    reason="liboracle.so not built (native/build.sh)")
class TestNativeOracle:
    def test_matches_python_oracle(self):
        vol = VoxelVolume.noise_filled((24, 24, 24))
        rng = np.random.RandomState(11)
        n = 200
        o_l = (rng.rand(n, 3) * 2.4 - 1.2
               + np.asarray(vol.pivot)).astype(np.float32)
        d = rng.randn(n, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        res = oracle_native.trace(vol.grid, vol.brick_occ, vol.vpu, o_l, d)
        ov = oracle.OracleVolume(grid=vol.grid, vpu=vol.vpu)
        bad = 0
        for i in range(n):
            h = oracle.intersect_volume(
                ov, o_l[i] - np.asarray(vol.pivot), d[i])
            if h.no_hit != (res["t"][i] >= 1e29):
                bad += 1
                continue
            if h.no_hit:
                continue
            if (not np.isclose(res["t"][i], h.depth, atol=2e-3)
                    or res["mat"][i] != h.material):
                bad += 1
        assert bad == 0
