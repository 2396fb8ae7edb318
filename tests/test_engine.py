"""Engine layer: pool, GJK, SAT, physics world, curves."""

import numpy as np

from voxel_tracer_tpu.engine.gjk import (BoxSupport, SphereSupport,
                                         gjk_intersect)
from voxel_tracer_tpu.engine.physics import (BoxCollider, PhyObject, PhyWorld,
                                             PlaneCollider, SphereCollider)
from voxel_tracer_tpu.engine.physics import test_collision as check_collision
from voxel_tracer_tpu.engine.pool import Pool
from voxel_tracer_tpu.engine.sat import box_box_sat
from voxel_tracer_tpu.ops import curves


class TestPool:
    def test_add_remove_iterate(self):
        p = Pool(4)
        h1 = p.add("a")
        h2 = p.add("b")
        assert len(p) == 2
        assert sorted(p) == ["a", "b"]
        p.remove(h1)
        assert len(p) == 1
        assert p.get(h1) is None
        assert p.get(h2) == "b"
        p.add("c")
        p.add("d")
        p.add("e")
        assert len(p) == 4
        try:
            p.add("f")
            assert False, "should be full"
        except RuntimeError:
            pass


class TestGjk:
    def test_spheres(self):
        a = SphereSupport((0, 0, 0), 1.0)
        b = SphereSupport((1.5, 0, 0), 1.0)
        c = SphereSupport((3.0, 0, 0), 1.0)
        assert gjk_intersect(a, b)
        assert not gjk_intersect(a, c)

    def test_box_sphere(self):
        box = BoxSupport((0, 0, 0), np.eye(3), (1, 1, 1))
        assert gjk_intersect(box, SphereSupport((1.5, 0, 0), 0.6))
        assert not gjk_intersect(box, SphereSupport((3.0, 3.0, 0), 0.5))

    def test_rotated_boxes(self):
        c, s = np.cos(0.78), np.sin(0.78)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        a = BoxSupport((0, 0, 0), np.eye(3), (1, 1, 1))
        # rotated corner reaches sqrt(2) ~ 1.414, so 2.3 overlaps, 2.6 not
        b = BoxSupport((2.3, 0, 0), rot, (1, 1, 1))
        assert gjk_intersect(a, b)
        c2 = BoxSupport((2.6, 0, 0), rot, (1, 1, 1))
        assert not gjk_intersect(a, c2)


class TestSat:
    def test_overlap_and_separation(self):
        eye = np.eye(3)
        assert box_box_sat(np.zeros(3), eye, np.ones(3),
                           np.array([1.5, 0, 0]), eye, np.ones(3))
        assert not box_box_sat(np.zeros(3), eye, np.ones(3),
                               np.array([2.5, 0, 0]), eye, np.ones(3))


class TestPhysics:
    def test_gravity_fall_and_floor(self):
        world = PhyWorld()
        floor = PhyObject(pos=np.array([0.0, 0.0, 0.0]), is_static=True,
                          collider=PlaneCollider())
        ball = PhyObject(pos=np.array([0.0, 5.0, 0.0]),
                         collider=SphereCollider(0.5))
        world.add_object(floor)
        world.add_object(ball)
        for _ in range(300):
            world.step(1 / 60)
        # ball must have fallen and stopped at/under the floor contact
        assert ball.pos[1] < 5.0
        assert np.linalg.norm(ball.vel) < 1.0

    def test_dispatch_type_swap(self):
        s = PhyObject(pos=np.zeros(3), collider=SphereCollider(1.0))
        b = PhyObject(pos=np.array([1.2, 0, 0]), collider=BoxCollider())
        # (Box, Sphere) registered; (Sphere, Box) must dispatch via swap
        assert check_collision(s, b)
        assert check_collision(b, s)


class TestCurves:
    def test_morton3_roundtrip(self):
        rng = np.random.RandomState(0)
        x = rng.randint(0, 1024, 100).astype(np.uint32)
        y = rng.randint(0, 1024, 100).astype(np.uint32)
        z = rng.randint(0, 1024, 100).astype(np.uint32)
        code = curves.morton3_encode(x, y, z)
        x2, y2, z2 = curves.morton3_decode(code)
        np.testing.assert_array_equal(x, x2)
        np.testing.assert_array_equal(y, y2)
        np.testing.assert_array_equal(z, z2)

    def test_morton2_roundtrip(self):
        x = np.arange(256, dtype=np.uint32)
        y = (x * 7 + 3) % 256
        code = curves.morton2_encode(x, y)
        x2, y2 = curves.morton2_decode(code)
        np.testing.assert_array_equal(x, x2)
        np.testing.assert_array_equal(y, y2)

    def test_hilbert_table_is_permutation(self):
        lut = curves.hilbert3_table(1)
        assert sorted(lut.ravel().tolist()) == list(range(8))
        lut3 = curves.hilbert3_table(3)  # 8^3 table like hilbert.h:4
        assert lut3.shape == (8, 8, 8)
        assert sorted(lut3.ravel().tolist()) == list(range(512))
        # adjacency: consecutive indices are neighbors (distance 1)
        pos = np.zeros((512, 3), np.int32)
        for z in range(8):
            for y in range(8):
                for x in range(8):
                    pos[lut3[z, y, x]] = (x, y, z)
        d = np.abs(np.diff(pos, axis=0)).sum(axis=1)
        assert (d == 1).all()
