"""Utils: framebuffer/PNG roundtrip, AOV display, timer, checkpoint."""

import os

import numpy as np

from voxel_tracer_tpu.utils.aov import DISPLAY_MODES, display
from voxel_tracer_tpu.utils.checkpoint import (CheckpointManager, load_camera,
                                               save_camera)
from voxel_tracer_tpu.utils.framebuffer import Surface, read_png, write_png
from voxel_tracer_tpu.utils.timer import EmaFps, Timer


class TestFramebuffer:
    def test_png_roundtrip(self, tmp_path):
        img = (np.random.RandomState(0).rand(20, 30, 3) * 255).astype(np.uint8)
        p = str(tmp_path / "t.png")
        write_png(p, img)
        back = read_png(p)
        np.testing.assert_array_equal(img, back[:, :, :3])

    def test_surface_ops(self, tmp_path):
        s = Surface(64, 32)
        s.clear((10, 20, 30))
        assert (s.pixels[0, 0] == [10, 20, 30]).all()
        s.line(0, 0, 63, 31, (255, 0, 0))
        assert (s.pixels[0, 0] == [255, 0, 0]).all()
        s.bar(5, 5, 8, 8, (0, 255, 0))
        assert (s.pixels[6, 6] == [0, 255, 0]).all()
        s.print("SCORE: 42", 2, 20)
        s.save_png(str(tmp_path / "s.png"))
        assert os.path.exists(str(tmp_path / "s.png"))

    def test_from_float(self):
        s = Surface(4, 4).from_float(np.ones((4, 4, 3)) * 0.5)
        assert abs(int(s.pixels[0, 0, 0]) - 128) <= 1


class TestAov:
    def _aovs(self):
        h, w = 8, 8
        n = np.random.randn(h, w, 3).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        return dict(
            image=np.random.rand(h, w, 3).astype(np.float32),
            albedo=np.random.rand(h, w, 3).astype(np.float32),
            irradiance=np.random.rand(h, w, 3).astype(np.float32),
            normal=n,
            depth=np.where(np.random.rand(h, w) > 0.5, 2.0, 1e30).astype(np.float32),
            steps=np.random.randint(0, 200, (h, w)),
            material=np.random.randint(0, 255, (h, w)),
        )

    def test_all_modes(self):
        aovs = self._aovs()
        for mode in DISPLAY_MODES:
            img = display(aovs, mode)
            assert img.shape == (8, 8, 3)
            assert np.isfinite(img).all()
            assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-6


class TestTimer:
    def test_timer_and_fps(self):
        t = Timer()
        assert t.elapsed() >= 0.0
        f = EmaFps()
        f.update(1 / 60)
        f.update(1 / 30)
        assert 25 < f.fps < 65


class TestCheckpoint:
    def test_camera_roundtrip(self, tmp_path):
        from voxel_tracer_tpu.models.camera import Camera

        cam = Camera.create((1, 2, 3), (0, 0, 0), 1.0)
        p = str(tmp_path / "camera.npz")
        save_camera(p, cam)
        cam2 = load_camera(p, 1.0)
        np.testing.assert_allclose(np.asarray(cam2.pos), [1, 2, 3])
        assert load_camera(str(tmp_path / "missing.npz")) is None

    def test_manager_save_restore_gc(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
        assert mgr.restore() is None
        for step in (10, 20, 30):
            mgr.save(step, {"w": np.full((3,), step)})
        step, state = mgr.restore()
        assert step == 30
        np.testing.assert_array_equal(state["w"], [30, 30, 30])
        # GC keeps only 2
        assert len(mgr._all_steps()) == 2
        # restore specific
        step, state = mgr.restore(20)
        assert step == 20
