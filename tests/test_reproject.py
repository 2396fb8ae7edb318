"""Temporal reprojection: op parity vs a NumPy port of insert_accu
(renderer.cpp:273-329) + end-to-end accumulation behavior."""

import numpy as np
import jax.numpy as jnp

from voxel_tracer_tpu.models.camera import Camera
from voxel_tracer_tpu.models.scene import Scene
from voxel_tracer_tpu.models.skydome import SkyDome
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.ops.math3d import BIG_F32
from voxel_tracer_tpu.ops.reproject import reproject_accumulate
from voxel_tracer_tpu.renderer import Renderer, RenderConfig


def _np_project(planes, p):
    """Pyramid::project (pyramid.cpp:52-66)."""
    p4 = np.concatenate([p, [1.0]]).astype(np.float32)
    d = planes @ p4
    u = d[0] / (d[0] + d[1])
    v = d[2] / (d[2] + d[3])
    return np.array([u, v], np.float32)


def _np_insert_accu(c, d, hit_point, prev_frame, prev_planes, w, h,
                    depth_delta=0.0):
    """Scalar port of Renderer::insert_accu (renderer.cpp:273-329).
    prev_frame: (H, W, 4).  Returns blended rgb."""
    acc_color = np.array([c[0], c[1], c[2], d], np.float32)
    confidence = np.float32(0.95)
    uv = _np_project(prev_planes, hit_point)
    max_u = 1.0 - 2.0 / w
    max_v = 1.0 - 2.0 / h
    if uv[0] > 0 and uv[0] < max_u and uv[1] > 0 and uv[1] < max_v:
        win = np.array([w, h], np.float32)
        center = uv * win + 0.5
        tl_p = uv * win
        tr_p = uv * win + np.array([1, 0])
        bl_p = uv * win + np.array([0, 1])
        br_p = uv * win + np.array([1, 1])
        center_p = np.floor(center + 0.5)
        tl_w = abs((tl_p[0] - center_p[0]) * (tl_p[1] - center_p[1]))
        tr_w = abs((tr_p[0] - center_p[0]) * (tr_p[1] - center_p[1]))
        bl_w = abs((bl_p[0] - center_p[0]) * (bl_p[1] - center_p[1]))
        br_w = 1.0 - (tl_w + tr_w + bl_w)

        def s(p):
            return prev_frame[int(p[1]), int(p[0])]

        sample = (s(tl_p) * tl_w + s(tr_p) * tr_w
                  + s(bl_p) * bl_w + s(br_p) * br_w)
        depth_prev = prev_frame[int(center[1]), int(center[0])][3]
        depth_diff = abs(depth_prev - (d + depth_delta))
        if depth_diff < 0.1:
            confidence = max(confidence - depth_diff * 3.0, 0.0)
            acc_color = np.array(
                [sample[0], sample[1], sample[2], depth_prev], np.float32)
    color = (np.asarray(c) * (1.0 - confidence)
             + acc_color[:3] * confidence)
    return color


class TestOpParity:
    def test_matches_numpy_port(self, rng):
        w = h = 16
        cam = Camera.create((0.0, 0.5, -3.0), (0.0, 0.0, 0.0), 1.0)
        planes = np.asarray(cam.planes)
        # random world points roughly inside the frustum
        n = w * h
        pts = np.stack([
            rng.uniform(-0.8, 0.8, n),
            rng.uniform(-0.6, 0.9, n),
            rng.uniform(-1.0, 1.0, n),
        ], axis=1).astype(np.float32)
        depth = np.linalg.norm(
            pts - np.array([0.0, 0.5, -3.0]), axis=1).astype(np.float32)
        irr = rng.uniform(0, 2, (n, 3)).astype(np.float32)
        prev = rng.uniform(0, 2, (h, w, 4)).astype(np.float32)
        # make some prev depths match so both branches are exercised
        prev[..., 3] = rng.choice(
            [2.0, 3.0, 3.5, 9.0], size=(h, w)).astype(np.float32)
        blended, accu = reproject_accumulate(
            jnp.asarray(irr), jnp.asarray(depth), jnp.asarray(pts),
            jnp.asarray(prev), jnp.asarray(planes), w, h)
        blended = np.asarray(blended)
        for i in range(0, n, 7):
            ref = _np_insert_accu(irr[i], depth[i], pts[i], prev, planes, w, h)
            np.testing.assert_allclose(blended[i], ref, atol=2e-4,
                                       err_msg=f"pixel {i}")
        # the new accumulator stores (blended rgb, current depth)
        accu = np.asarray(accu).reshape(n, 4)
        np.testing.assert_allclose(accu[:, :3], blended, atol=1e-6)
        np.testing.assert_allclose(accu[:, 3], depth, atol=1e-6)

    def test_depth_rejection(self):
        """History with mismatched depth is rejected -> blended == current."""
        w = h = 8
        cam = Camera.create((0.0, 0.0, -3.0), (0.0, 0.0, 0.0), 1.0)
        n = w * h
        irr = jnp.ones((n, 3)) * 2.0
        depth = jnp.full((n,), 3.0)
        pts = jnp.zeros((n, 3))
        prev = jnp.concatenate(
            [jnp.full((h, w, 3), 9.0), jnp.full((h, w, 1), 99.0)], axis=-1)
        blended, _ = reproject_accumulate(
            irr, depth, pts, prev, cam.planes, w, h)
        np.testing.assert_allclose(np.asarray(blended), 2.0, atol=1e-5)


def _noisy_scene():
    g = np.zeros((16, 16, 16), np.uint8)
    g[:8, :, :] = 20                        # diffuse floor slab
    g[10:13, 6:10, 6:10] = 3                # small glass block above it
    pal = np.ones((256, 3), np.float32)
    pal[20] = (0.8, 0.8, 0.8)
    vol = VoxelVolume(g, pal, vpu=20.0)
    return Scene(volumes=[vol], skydome=SkyDome.constant((0.6, 0.7, 0.9)))


class TestAccumulation:
    def test_static_camera_noise_damped(self):
        """With a static camera, the 95% history blend damps the
        frame-over-frame noise of stochastic shadows by ~20x (each new
        frame only contributes 5%, renderer.cpp:279,325-327)."""
        scene = _noisy_scene().data()

        def deltas(accumulate):
            cfg = RenderConfig(width=16, height=16, shading="full",
                               accumulate=accumulate, max_bounces=2,
                               glass_reflections=2, tonemapper="none")
            r = Renderer(cfg)
            cam = r.camera((0.0, 0.9, -1.8), (0.0, 0.1, 0.0))
            prev, ds = None, []
            for f in range(5):
                irr = np.asarray(r.render(scene, cam, frame=f)["irradiance"])
                if prev is not None:
                    ds.append(np.abs(irr - prev).mean())
                prev = irr
            return np.mean(ds)

        d_off = deltas(False)
        d_on = deltas(True)
        assert d_on < 0.3 * d_off, (d_on, d_off)

    def test_accumulate_flag_respected(self):
        """accumulate=False renders identically across calls (no state)."""
        cfg = RenderConfig(width=8, height=8, shading="flat",
                           accumulate=False)
        r = Renderer(cfg)
        scene = _noisy_scene().data()
        cam = r.camera((0.0, 0.9, -1.8), (0.0, 0.1, 0.0))
        a = np.asarray(r.render(scene, cam, frame=0)["image"])
        b = np.asarray(r.render(scene, cam, frame=0)["image"])
        np.testing.assert_array_equal(a, b)

    def test_camera_jump_rejects_history(self):
        """A large camera move invalidates history (UV out of bounds or
        depth mismatch) -> the new frame is not contaminated."""
        cfg = RenderConfig(width=16, height=16, shading="flat",
                           accumulate=True, tonemapper="none")
        r = Renderer(cfg)
        scene = _noisy_scene().data()
        cam_a = r.camera((0.0, 0.9, -1.8), (0.0, 0.1, 0.0))
        r.render(scene, cam_a, frame=0)
        r.render(scene, cam_a, frame=1)
        cam_b = r.camera((1.8, 0.9, 0.0), (0.0, 0.1, 0.0))  # 90 deg orbit
        out_b = r.render(scene, cam_b, frame=2)
        r2 = Renderer(cfg)
        fresh = r2.render(scene, cam_b, frame=2)
        # flat shading irradiance == 1 everywhere; with rejection working,
        # the accumulated render equals a fresh render
        np.testing.assert_allclose(
            np.asarray(out_b["image"]), np.asarray(fresh["image"]),
            atol=1e-4)
