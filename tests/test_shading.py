"""Shading sweep: closed-form / oracle checks for every light + material
term (sun shadow, ambient pdf, sphere-light inverse square + AoE, Fresnel,
refraction, mirror multi-bounce throughput).

References: materials.cpp:226-298, sphere-light.cpp:8-37."""

import numpy as np
import jax.numpy as jnp

from voxel_tracer_tpu.models.scene import Scene
from voxel_tracer_tpu.models.skydome import SkyDome
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.ops import shading
from voxel_tracer_tpu.renderer import Renderer, RenderConfig

FOURPI = 4.0 * np.pi


def _cfgish(max_candidates=4, ambient=0.2):
    class C:
        pass
    c = C()
    c.max_candidates = max_candidates
    c.ambient = ambient
    return c


def _np_fresnel(n1, n2, n, incident):
    """Scalar port of fresnel_reflect_prob (materials.cpp:271-289)."""
    r0 = ((n1 - n2) / (n1 + n2)) ** 2
    cos_x = -np.dot(n, incident)
    if n1 > n2:
        nd = n1 / n2
        sin_t2 = nd * nd * (1.0 - cos_x * cos_x)
        if sin_t2 > 1.0:
            return 1.0
        cos_x = np.sqrt(1.0 - sin_t2)
    x = 1.0 - cos_x
    ret = r0 + (1.0 - r0) * x ** 5
    return 0.01 + 0.99 * ret


class TestFresnelRefract:
    def test_fresnel_closed_form(self, rng):
        for _ in range(50):
            n1, n2 = rng.choice([1.0, 1.5]), rng.choice([1.0, 1.5])
            n = rng.randn(3); n /= np.linalg.norm(n)
            i = rng.randn(3); i /= np.linalg.norm(i)
            if np.dot(n, i) > 0:
                i = -i   # incident against the normal
            got = float(shading.fresnel_reflect_prob(
                n1, n2, jnp.asarray(n[None]), jnp.asarray(i[None]))[0])
            want = _np_fresnel(n1, n2, n, i)
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_refract_snell(self, rng):
        """Refracted direction obeys Snell's law; TIR returns zero."""
        n = np.array([0.0, 1.0, 0.0], np.float32)
        for theta_deg in [0.0, 20.0, 45.0, 70.0]:
            th = np.radians(theta_deg)
            i = np.array([np.sin(th), -np.cos(th), 0.0], np.float32)
            out = np.asarray(shading.refract(
                jnp.asarray(n[None]), jnp.asarray(i[None]), 1.0 / 1.5))[0]
            sin_out = abs(out[0])
            np.testing.assert_allclose(sin_out, np.sin(th) / 1.5, atol=1e-5)
            assert out[1] < 0.0   # continues into the surface
        # TIR: glass -> air at 60 deg > critical angle 41.8 deg
        th = np.radians(60.0)
        i = np.array([np.sin(th), -np.cos(th), 0.0], np.float32)
        out = np.asarray(shading.refract(
            jnp.asarray(n[None]), jnp.asarray(i[None]), 1.5))[0]
        np.testing.assert_allclose(out, 0.0, atol=1e-7)


class TestSunLight:
    def _scene_with_blocker(self):
        # a solid slab centered along the sun direction from the origin
        g = np.full((8, 8, 8), 20, np.uint8)
        sun = np.array([-0.619501, 0.465931, -0.631765], np.float32)
        sun /= np.linalg.norm(sun)
        vol = VoxelVolume(g, pos=tuple(sun * 1.5), vpu=20.0)
        return Scene(volumes=[vol],
                     skydome=SkyDome.constant((0, 0, 0))).data(), sun

    def test_shadow_and_incidence(self):
        scene, sun = self._scene_with_blocker()
        cfg = _cfgish()
        n_up = sun[None, :].repeat(2, 0).astype(np.float32)
        # point 0: origin (sun blocked by the slab); point 1: far to the side
        p = np.array([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]], np.float32)
        out = np.asarray(shading.sun_light(
            scene, jnp.asarray(p), jnp.asarray(n_up), None,
            cfg.max_candidates))
        np.testing.assert_allclose(out[0], 0.0, atol=1e-7)  # occluded
        expect = np.asarray(scene.sun_light) * 1.0           # incidence = 1
        np.testing.assert_allclose(out[1], expect, atol=1e-5)

    def test_facing_away_is_dark(self):
        scene, sun = self._scene_with_blocker()
        p = np.array([[5.0, 0.0, 0.0]], np.float32)
        n = -sun[None, :]
        out = np.asarray(shading.sun_light(
            scene, jnp.asarray(p), jnp.asarray(n.astype(np.float32)), None, 4))
        np.testing.assert_allclose(out, 0.0, atol=1e-7)


class TestAmbient:
    def test_pdf_weighting_open_sky(self):
        """No geometry: ambient = clamp(sky * 0.25 / (cos/pi)) for the
        cosine-weighted sample (materials.cpp:249-269)."""
        sky_c = np.array([0.3, 0.5, 0.7], np.float32)
        scene = Scene(skydome=SkyDome.constant(sky_c)).data()
        n = np.array([[0.0, 1.0, 0.0]], np.float32)
        p = np.zeros((1, 3), np.float32)
        for r1 in [0.0, 0.5, 0.75]:
            r2 = np.array([[r1, 0.3]], np.float32)
            out = np.asarray(shading.ambient_light(
                scene, jnp.asarray(p), jnp.asarray(n), jnp.asarray(r2), 4))[0]
            cos_t = np.sqrt(1.0 - r1)   # theta = arccos(sqrt(1 - r1))
            expect = np.minimum(sky_c * 0.25 * np.pi / cos_t, 8.0)
            np.testing.assert_allclose(out, expect, rtol=1e-4)

    def test_occlusion_within_one_unit(self):
        """A ceiling 0.5 units above blocks the ambient ray (MAX_DIST=1)."""
        g = np.full((4, 4, 64), 20, np.uint8)     # thin wide ceiling
        vol = VoxelVolume(g, pos=(0.0, 0.6, 0.0), vpu=20.0)
        scene = Scene(volumes=[vol],
                      skydome=SkyDome.constant((1, 1, 1))).data()
        n = np.array([[0.0, 1.0, 0.0]], np.float32)
        p = np.zeros((1, 3), np.float32)
        r2 = np.zeros((1, 2), np.float32)          # sample straight up
        out = np.asarray(shading.ambient_light(
            scene, jnp.asarray(p), jnp.asarray(n), jnp.asarray(r2), 4))[0]
        np.testing.assert_allclose(out, 0.0, atol=1e-7)


class TestSphereLights:
    def _scene(self, power=100.0, radius=0.1):
        s = Scene(skydome=SkyDome.constant((0, 0, 0)))
        s.add_light((0.0, 2.0, 0.0), radius, (1.0, 0.8, 0.6), power)
        return s.data()

    def test_inverse_square_and_pdf(self):
        """Center sample (noise = 0.5): contribution =
        color * power/(4 pi d^2) * incidence * 4 pi * 2r
        (sphere-light.cpp:8-37)."""
        scene = self._scene(power=100.0, radius=0.1)
        n = np.array([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
        p = np.array([[0.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
        s3 = np.full((2, 3), 0.5, np.float32)      # sample at light center
        out = np.asarray(shading.sphere_lights(
            scene, jnp.asarray(p), jnp.asarray(n), jnp.asarray(s3), 4))
        color = np.array([1.0, 0.8, 0.6], np.float32)
        for i, d2 in enumerate([4.0, 1.0]):
            expect = color * (100.0 / (FOURPI * d2)) * 1.0 * (FOURPI * 0.2)
            np.testing.assert_allclose(out[i], expect, rtol=1e-4,
                                       err_msg=f"dist^2={d2}")

    def test_aoe_cutoff(self):
        """Beyond sqrt(power/4pi) the light contributes exactly zero."""
        scene = self._scene(power=10.0)            # aoe_sqr = 0.796
        p = np.array([[0.0, 0.0, 0.0]], np.float32)   # dist^2 = 4 > aoe
        n = np.array([[0.0, 1.0, 0.0]], np.float32)
        s3 = np.full((1, 3), 0.5, np.float32)
        out = np.asarray(shading.sphere_lights(
            scene, jnp.asarray(p), jnp.asarray(n), jnp.asarray(s3), 4))
        np.testing.assert_allclose(out, 0.0, atol=1e-7)

    def test_facing_away(self):
        scene = self._scene()
        p = np.array([[0.0, 0.0, 0.0]], np.float32)
        n = np.array([[0.0, -1.0, 0.0]], np.float32)
        s3 = np.full((1, 3), 0.5, np.float32)
        out = np.asarray(shading.sphere_lights(
            scene, jnp.asarray(p), jnp.asarray(n), jnp.asarray(s3), 4))
        np.testing.assert_allclose(out, 0.0, atol=1e-7)


class TestMirror:
    MIRROR = 10  # row 1 (ids 9..16)

    def test_two_bounce_throughput(self):
        """Camera -> tinted mirror floor -> tinted mirror wall -> sky:
        final color = floor_albedo * wall_albedo * sky (each absorption
        applied exactly once, materials.cpp:95-114)."""
        floor_g = np.full((80, 4, 80), self.MIRROR, np.uint8)
        floor_p = np.ones((256, 3), np.float32)
        floor_p[self.MIRROR] = (0.8, 0.5, 0.5)
        floor = VoxelVolume(floor_g, floor_p, pos=(0.0, -0.1, 2.0), vpu=20.0)
        wall_g = np.full((4, 80, 80), self.MIRROR, np.uint8)
        wall_p = np.ones((256, 3), np.float32)
        wall_p[self.MIRROR] = (0.5, 0.8, 0.5)
        wall = VoxelVolume(wall_g, wall_p, pos=(0.0, 1.5, 2.1), vpu=20.0)
        sky_c = np.array([0.9, 1.0, 0.8], np.float32)
        scene = Scene(volumes=[floor, wall], skydome=SkyDome.constant(sky_c))
        cfg = RenderConfig(width=16, height=16, shading="full",
                           tonemapper="none", max_bounces=4,
                           glass_reflections=1)
        r = Renderer(cfg)
        cam = r.camera((0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
        out = r.render(scene.data(), cam, frame=0)
        center = np.asarray(out["image"])[8, 8]
        expect = np.array([0.8, 0.5, 0.5]) * np.array([0.5, 0.8, 0.5]) * sky_c
        np.testing.assert_allclose(center, expect, atol=1e-3)

    def test_single_bounce(self):
        floor_g = np.full((80, 4, 80), self.MIRROR, np.uint8)
        floor_p = np.ones((256, 3), np.float32)
        floor_p[self.MIRROR] = (0.6, 0.7, 0.8)
        floor = VoxelVolume(floor_g, floor_p, pos=(0.0, -0.1, 2.0), vpu=20.0)
        scene = Scene(volumes=[floor], skydome=SkyDome.constant((1, 1, 1)))
        cfg = RenderConfig(width=16, height=16, shading="full",
                           tonemapper="none", max_bounces=3,
                           glass_reflections=1)
        r = Renderer(cfg)
        cam = r.camera((0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
        out = r.render(scene.data(), cam, frame=0)
        center = np.asarray(out["image"])[8, 8]
        np.testing.assert_allclose(center, [0.6, 0.7, 0.8], atol=1e-3)
