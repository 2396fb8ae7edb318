"""Dynamic multi-object kernel traversal (ops/pallas/multi.py): N
oriented volumes traced per-volume on the hier3 megakernel vs the XLA
composite wavefront — including a volume with a NON-identity rotation
(the reference's rotating drones, enemy.cpp:10-43, obb.cpp:128-134),
which the single-volume kernel pipelines cannot represent."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxel_tracer_tpu.models.camera import Camera, rays_for_image
from voxel_tracer_tpu.models.scene import Scene
from voxel_tracer_tpu.models.skydome import SkyDome
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.ops.math3d import BIG_F32
from voxel_tracer_tpu.ops.pallas import mega
from voxel_tracer_tpu.ops.pallas.multi import (
    MultiMegaIntersector, render_whitted_multi)
from voxel_tracer_tpu.ops.pallas.whitted import MegaIntersector
from voxel_tracer_tpu.renderer import RenderConfig, render_rays

W, H = 64, 48


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def _dyn_scene(angle=0.35):
    """Diffuse floor volume + a small ROTATED cube volume above it."""
    pal = np.random.RandomState(3).rand(256, 3).astype(np.float32) * 0.8 + 0.1

    floor = np.zeros((8, 8, 32), np.uint8)     # (z, y, x)
    floor[:, 0:2, :] = 30
    vol_floor = VoxelVolume(floor, palette=pal, pos=(0.0, 0.0, 0.0),
                            vpu=20.0)

    cube = np.zeros((12, 12, 12), np.uint8)
    cube[2:10, 2:10, 2:10] = 40
    cube[4:8, 4:8, 4:8] = 12                   # mirror core (row 1)
    vol_cube = VoxelVolume(cube, palette=pal, pos=(0.8, 0.45, 0.2),
                           vpu=20.0, rot=_rot_y(angle))

    scene = Scene(volumes=[vol_floor, vol_cube],
                  skydome=SkyDome.procedural(32, 16))
    scene.add_light((0.5, 1.2, -0.6), 0.08, (1.0, 0.9, 0.8), 6.0)
    return [vol_floor, vol_cube], scene


def _mk_multi(vols, compact):
    return MultiMegaIntersector(
        [MegaIntersector(mega.MegaVolume(v), tile_rows=8, fine_iters=96,
                         shadow_rounds=4, interpret=True) for v in vols],
        compact_fracs=(1 / 4,) if compact else None)


@pytest.mark.parametrize("compact", [False, True])
def test_multi_rotated_volume_parity(compact):
    vols, scene = _dyn_scene()
    sd = scene.data()
    cam = Camera.create((1.0, 0.8, -1.2), (0.6, 0.3, 0.2), W / H)
    o, d = rays_for_image(cam, W, H)
    config = RenderConfig(width=W, height=H, shading="full",
                          max_bounces=2, glass_reflections=1)

    ref = render_rays(sd, o, d, jnp.int32(5), config=config)
    multi = _mk_multi(vols, compact)
    out = render_whitted_multi(multi, sd, cam, W, H, 5, config=config)

    # deterministic AOVs tight: the rotated volume must land where the
    # wavefront puts it
    ref_d = np.asarray(ref["depth"]).ravel()
    out_d = np.asarray(out["depth"]).ravel()
    hit_both = (ref_d < 1e29) & (out_d < 1e29)
    assert (ref_d < 1e29).mean() > 0.2, "camera missed the scene"
    agree = ((ref_d < 1e29) == (out_d < 1e29)).mean()
    assert agree > 0.99, f"hit-mask agreement {agree:.3f}"
    np.testing.assert_allclose(out_d[hit_both], ref_d[hit_both],
                               rtol=1e-3, atol=2e-3)

    ref_c = np.asarray(ref["color"]).reshape(-1, 3)
    out_c = np.asarray(out["color"]).reshape(-1, 3)
    rel = (np.abs(ref_c - out_c).max(-1)
           / np.maximum(1.0, np.abs(ref_c).max(-1)))
    mism = int((rel > 0.05).sum())
    assert mism <= 40, f"{mism} color mismatches of {len(rel)}"
    assert float(rel.mean()) < 0.01


def test_with_transforms_moves_volume_in_jit():
    """Per-frame rotation/position as TRACED args: one compile, two
    different transforms, two different images."""
    vols, scene = _dyn_scene(angle=0.0)
    sd = scene.data()
    cam = Camera.create((1.0, 0.8, -1.2), (0.6, 0.3, 0.2), W / H)
    config = RenderConfig(width=W, height=H, shading="lambert")
    multi = _mk_multi(vols, compact=False)
    o, d = rays_for_image(cam, W, H)

    traces = []

    @jax.jit
    def frame(rot, pos):
        traces.append(1)
        isect = multi.with_transforms([None, (rot, pos)])
        hit = isect.intersect_scene(sd, o, d)
        return hit.t, hit.obj

    t0, obj0 = frame(jnp.asarray(_rot_y(0.0)),
                     jnp.asarray([0.8, 0.45, 0.2], jnp.float32))
    t1, obj1 = frame(jnp.asarray(_rot_y(0.9)),
                     jnp.asarray([0.85, 0.5, 0.25], jnp.float32))
    assert len(traces) == 1, "transform update retraced/recompiled"
    assert (np.asarray(obj0) == 1).sum() > 10, "cube not visible"
    moved = (np.asarray(t0 < BIG_F32) != np.asarray(t1 < BIG_F32)) | (
        np.abs(np.asarray(t0) - np.asarray(t1)) > 1e-4)
    assert moved.sum() > 10, "volume did not move"

    # and the rotated kernel hit matches the wavefront at the new pose
    vols[1].set_rotation(_rot_y(0.9))
    vols[1].set_position(np.array([0.85, 0.5, 0.25], np.float32))
    sd2 = scene.data()
    from voxel_tracer_tpu.ops import composite
    ref = composite.intersect_scene(sd2, o, d)
    ref_hit = np.asarray(ref.t) < 1e29
    out_hit = np.asarray(t1) < 1e29
    assert (ref_hit == out_hit).mean() > 0.995
    both = ref_hit & out_hit
    np.testing.assert_allclose(np.asarray(t1)[both],
                               np.asarray(ref.t)[both], rtol=1e-3,
                               atol=2e-3)
