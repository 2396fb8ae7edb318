"""Post-processing: denoise filters + debug-draw overlay."""

import numpy as np

import jax.numpy as jnp

from voxel_tracer_tpu.models.camera import Camera
from voxel_tracer_tpu.ops.denoise import box_blur, gaussian_blur, \
    gaussian_kernel_1d
from voxel_tracer_tpu.utils.debug_draw import DebugOverlay


class TestDenoise:
    def test_box_blur_constant_preserved(self):
        img = np.full((16, 24, 3), 0.37, np.float32)
        out = np.asarray(box_blur(img, radius=1, passes=2))
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_box_blur_matches_numpy_reference(self, rng):
        img = rng.rand(12, 20, 3).astype(np.float32)
        out = np.asarray(box_blur(img, radius=1, passes=1))
        # scalar reference: 3x3 mean with edge replication
        pad = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
        ref = np.zeros_like(img)
        for dy in range(3):
            for dx in range(3):
                ref += pad[dy:dy + 12, dx:dx + 20]
        ref /= 9.0
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_box_blur_two_passes_smooths_more(self, rng):
        img = (rng.rand(16, 16, 3) > 0.5).astype(np.float32)
        v1 = np.asarray(box_blur(img, passes=1)).var()
        v2 = np.asarray(box_blur(img, passes=2)).var()
        assert v2 < v1 < img.var()

    def test_fxaa_smooths_diagonal_edge(self, rng=np.random.RandomState(3)):
        """An aliased diagonal step edge loses contrast at the stairs;
        flat regions pass through untouched (template.cpp:199-320
        threshold semantics)."""
        from voxel_tracer_tpu.ops.denoise import fxaa

        h = w = 32
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        img = np.where((yy > xx)[..., None], 1.0, 0.0).astype(np.float32)
        img = np.repeat(img, 3, axis=-1)
        out = np.asarray(fxaa(jnp.asarray(img)))
        # staircase pixels get blended toward the cross average
        edge_band = np.abs(yy - xx) <= 1
        assert np.abs(out - img)[edge_band].max() > 0.05
        # far-from-edge pixels unchanged
        flat = np.abs(yy - xx) > 3
        np.testing.assert_allclose(out[flat], img[flat], atol=1e-6)
        # output stays in gamut
        assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6

    def test_fxaa_flat_image_identity(self):
        from voxel_tracer_tpu.ops.denoise import fxaa

        img = jnp.full((16, 16, 3), 0.4, jnp.float32)
        np.testing.assert_allclose(np.asarray(fxaa(img)),
                                   np.asarray(img), atol=1e-7)

    def test_gaussian_kernel_normalized(self):
        k = gaussian_kernel_1d(1.5)
        assert abs(k.sum() - 1.0) < 1e-6
        assert k.argmax() == len(k) // 2

    def test_gaussian_blur_reduces_noise(self, rng):
        img = rng.rand(32, 32, 3).astype(np.float32)
        out = np.asarray(gaussian_blur(img, sigma=1.0))
        assert out.shape == img.shape
        assert out.var() < img.var()


class TestDebugOverlay:
    def _cam(self):
        return Camera.create((0.0, 0.0, -3.0), (0.0, 0.0, 0.0), 1.0)

    def test_line_in_view_draws_pixels(self):
        ov = DebugOverlay(64, 64)
        ov.draw_line(self._cam(), (-0.5, 0.0, 0.0), (0.5, 0.0, 0.0))
        assert ov.surface.pixels.any()

    def test_line_behind_camera_draws_nothing(self):
        ov = DebugOverlay(64, 64)
        ov.draw_line(self._cam(), (0.0, 0.0, -5.0), (0.2, 0.0, -6.0))
        assert not ov.surface.pixels.any()

    def test_center_point_projects_to_center(self):
        ov = DebugOverlay(64, 64)
        xy, ok = ov._project(self._cam(), np.array([[0.0, 0.0, 0.0]]))
        assert ok[0]
        assert abs(xy[0, 0] - 32.0) < 1.5 and abs(xy[0, 1] - 32.0) < 1.5

    def test_aabb_and_obb_draw(self):
        ov = DebugOverlay(64, 64)
        ov.draw_aabb(self._cam(), (-0.5, -0.5, -0.5), (0.5, 0.5, 0.5))
        n_aabb = int(ov.surface.pixels.any(axis=-1).sum())
        assert n_aabb > 20
        ov.clear()
        assert not ov.surface.pixels.any()
        ov.draw_obb(self._cam(), np.eye(3), (0.0, 0.0, 0.0),
                    (0.5, 0.5, 0.5), (1.0, 1.0, 1.0))
        n_obb = int(ov.surface.pixels.any(axis=-1).sum())
        # identity OBB with centered pivot == the same AABB
        assert abs(n_obb - n_aabb) <= 2

    def test_composite_overlays_only_drawn_pixels(self):
        ov = DebugOverlay(32, 32)
        ov.draw_normal(self._cam(), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                       scale=0.5)
        frame = np.full((32, 32, 3), 7, np.uint8)
        out = ov.composite(frame)
        drawn = ov.surface.pixels.any(axis=-1)
        assert (out[~drawn] == 7).all()
        assert (out[drawn] != 7).any()
