"""Analytic sphere/capsule primitives (ops/prims.py) and scene composition.

Reference semantics: sphere.cpp:7-34 (quadratic solve, normal-as-color
albedo hack), capsule.cpp:13-54 (IQ analytic capsule), materials.cpp:30
(laser material 0xFF renders unlit/emissive).
"""

import numpy as np

import jax.numpy as jnp

from voxel_tracer_tpu.models.camera import Camera
from voxel_tracer_tpu.models.scene import Scene
from voxel_tracer_tpu.models.skydome import SkyDome
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.ops import composite, prims
from voxel_tracer_tpu.renderer import Renderer, RenderConfig


def test_sphere_analytic_depth():
    pd = prims.build_prims(spheres=[((0, 0, 2), 0.5, 17, (1, 0, 0))])
    o = jnp.asarray([[0.0, 0, 0], [0, 0, 0], [2, 0, 0]], jnp.float32)
    d = jnp.asarray([[0.0, 0, 1], [0, 1, 0], [0, 0, 1]], jnp.float32)
    t, mat, n, alb = prims.intersect_spheres(pd, o, d)
    t = np.asarray(t)
    assert np.isclose(t[0], 1.5, atol=1e-6)          # head-on: dist - r
    assert t[1] > 1e29 and t[2] > 1e29               # misses
    assert np.allclose(np.asarray(n)[0], [0, 0, -1], atol=1e-6)
    assert int(np.asarray(mat)[0]) == 17


def test_sphere_normal_as_color_hack():
    pd = prims.build_prims(spheres=[((0, 0, 2), 0.5, 17, None)])
    o = jnp.zeros((1, 3), jnp.float32)
    d = jnp.asarray([[0.0, 0, 1]], jnp.float32)
    _, _, n, alb = prims.intersect_spheres(pd, o, d)
    np.testing.assert_allclose(np.asarray(alb)[0],
                               np.asarray(n)[0] * 0.5 + 0.5, atol=1e-6)


def test_capsule_body_and_caps():
    # capsule along x from (-1,0,3) to (1,0,3), r=0.25
    pd = prims.build_prims(capsules=[((-1, 0, 3), (1, 0, 3), 0.25,
                                      0xFF, (50, 0, 0))])
    o = jnp.asarray([[0.0, 0, 0], [-2.0, 0, 3], [0, 2, 0]], jnp.float32)
    d = jnp.asarray([[0.0, 0, 1], [1.0, 0, 0], [0, 0, 1]], jnp.float32)
    t, mat, n, alb = prims.intersect_capsules(pd, o, d)
    t = np.asarray(t)
    assert np.isclose(t[0], 2.75, atol=1e-5)         # body: 3 - r
    assert np.isclose(t[1], 0.75, atol=1e-5)         # end cap: 1 - r
    assert t[2] > 1e29
    assert np.allclose(np.asarray(n)[0], [0, 0, -1], atol=1e-5)
    assert np.allclose(np.asarray(n)[1], [-1, 0, 0], atol=1e-5)


def test_laser_capsule_renders_emissive():
    grid = np.zeros((16, 16, 16), np.uint8)
    grid[2:14, 0:2, 2:14] = 30                        # floor slab
    vol = VoxelVolume(grid, pos=(0, 0, 0), vpu=20.0)
    scene = Scene(volumes=[vol], skydome=SkyDome.black())
    scene.set_laser([np.array([-0.3, 0.25, 0.0], np.float32),
                     np.array([0.3, 0.25, 0.0], np.float32)], radius=0.05)
    cam = Camera.create((0.0, 0.3, -1.2), (0, 0.2, 0), 2.0)
    r = Renderer(RenderConfig(width=64, height=32, shading="full"))
    out = {k: np.asarray(v) for k, v in r.render(scene.data(), cam).items()}
    laser_px = out["material"] == 0xFF
    assert laser_px.sum() > 10, "laser beam not visible"
    # emissive red: tonemapped red channel saturates, green/blue stay low
    img = out["image"][laser_px]
    assert (img[:, 0] > 0.9).all()
    assert (img[:, 1] < 0.3).all()


def test_prims_participate_in_occlusion():
    grid = np.zeros((8, 8, 8), np.uint8)
    vol = VoxelVolume(grid, pos=(0, 0, 0), vpu=20.0)   # empty volume
    scene = Scene(volumes=[vol])
    scene.add_sphere((0, 0, 1.0), 0.3, mat=17, albedo=(1, 1, 1))
    sd = scene.data()
    o = jnp.zeros((2, 3), jnp.float32)
    d = jnp.asarray([[0.0, 0, 1], [0, 1, 0]], jnp.float32)
    occ, _ = composite.is_occluded(sd, o, d, jnp.asarray([10.0, 10.0]))
    occ = np.asarray(occ)
    assert occ[0] and not occ[1]
