"""Kernel-backed full-material pipeline (ops/pallas/whitted.py) vs the
XLA wavefront renderer — same shading math by construction (shared
shade_full), so the comparison isolates the kernel traversal backend:
full-table nearest hit, inverted-table medium march, two-trace scan
rays, and the re-trace stochastic shadow rounds.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from voxel_tracer_tpu.models.camera import Camera, rays_for_image
from voxel_tracer_tpu.models.scene import Scene
from voxel_tracer_tpu.models.skydome import SkyDome
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.ops.pallas import mega
from voxel_tracer_tpu.ops.pallas.whitted import (
    MegaIntersector, render_whitted_mega)
from voxel_tracer_tpu.renderer import RenderConfig, render_rays

W, H = 64, 48


def _material_scene():
    """One 32^3 volume with every material row in view: diffuse floor,
    hollow glass box (row 0) with a diffuse pillar inside, mirror slab
    (row 1), plus a sphere light (the glass-box + drones scene shrunk to
    interpret-mode size)."""
    n = 32
    g = np.zeros((n, n, n), np.uint8)
    g[:, 0:3, :] = 30                      # diffuse floor (z, y, x); y up
    # hollow glass box, wall 2 voxels, occupying x [4,16), z [10,24)
    gb = (slice(10, 24), slice(3, 17), slice(4, 16))
    g[gb] = 3
    g[12:22, 5:15, 6:14] = 0               # hollow it out
    g[14:20, 3:11, 8:12] = 40              # diffuse pillar inside the glass
    g[:, 3:20, 26:28] = 12                 # mirror slab (row 1) at +x side
    pal = np.random.RandomState(7).rand(256, 3).astype(np.float32) * 0.8 + 0.1
    vol = VoxelVolume(g, palette=pal, pos=(0.0, 0.0, 0.0), vpu=20.0)
    scene = Scene(volumes=[vol], skydome=SkyDome.procedural(32, 16))
    scene.add_light((0.5, 1.2, -0.6), 0.08, (1.0, 0.9, 0.8), 6.0)
    return vol, scene


@pytest.fixture(scope="module")
def setup():
    vol, scene = _material_scene()
    sd = scene.data()
    cam = Camera.create((1.1, 0.9, -1.5), (0.0, 0.3, 0.0), W / H)
    config = RenderConfig(width=W, height=H, shading="full",
                          max_bounces=3, glass_reflections=2)
    mv = mega.MegaVolume(vol)
    isect = MegaIntersector(mv, tile_rows=8, fine_iters=96,
                            shadow_rounds=4, interpret=True)
    return sd, cam, config, isect


def test_full_material_parity(setup):
    sd, cam, config, isect = setup
    o, d = rays_for_image(cam, W, H)
    ref = render_rays(sd, o, d, jnp.int32(7), config=config)
    out = render_whitted_mega(isect, sd, cam, W, H, jnp.int32(7),
                              config=config)

    ref_c = np.asarray(ref["color"]).reshape(-1, 3)
    out_c = np.asarray(out["color"]).reshape(-1, 3)
    diff = np.abs(ref_c - out_c).max(axis=-1)
    scale = np.maximum(1.0, np.abs(ref_c).max(axis=-1))
    rel = diff / scale
    mism = int((rel > 0.05).sum())
    # pinned budget: 110 mismatched pixels observed on this scene/camera.
    # The stochastic shadow rolls key `hash_shadow` on the hit CELL, so a
    # one-ulp t difference between the kernel and the DDA flips a binary
    # shadow term — these are sampling flips (averaged away by temporal
    # accumulation), not shading errors; the deterministic AOV checks
    # below stay tight.  Regression beyond the observed flips must fail.
    assert mism <= 130, f"{mism} color mismatches of {ref_c.shape[0]}"
    assert float(rel.mean()) < 0.015, f"mean rel err {rel.mean():.4f}"

    # depth parity on primary hits
    rt = np.asarray(ref["depth"]).reshape(-1)
    ot = np.asarray(out["depth"]).reshape(-1)
    both = (rt < 1e30) & (ot < 1e30)
    hit_mism = int((rt < 1e30).sum() != (ot < 1e30).sum())
    assert np.abs(rt[both] - ot[both]).max() < 5e-3
    assert abs(int((rt < 1e30).sum()) - int((ot < 1e30).sum())) <= 4, \
        "primary hit masks diverge"
    # the scene must actually exercise every material row
    mats = np.asarray(ref["material"]).reshape(-1)
    rows = set(np.floor((mats[mats > 0] - 1) / 8).astype(int))
    assert {0, 1} <= rows, f"glass+mirror not both visible: {rows}"


def test_whitted_accumulate_reduces_variance(setup):
    """Reprojection on the kernel path (renderer.cpp:273-329): a static
    camera accumulating stochastic-shadow irradiance over frames must be
    steadier frame-to-frame than the raw single-frame output."""
    from voxel_tracer_tpu.ops.math3d import BIG_F32
    from voxel_tracer_tpu.renderer import RenderConfig

    sd, cam, config, isect = setup
    acc_cfg = RenderConfig(width=W, height=H, shading="full",
                           max_bounces=3, glass_reflections=2,
                           accumulate=True)
    accu = jnp.concatenate(
        [jnp.zeros((H, W, 3), jnp.float32),
         jnp.full((H, W, 1), BIG_F32, jnp.float32)], axis=-1)
    raw, acc = [], []
    for f in range(5):
        out = render_whitted_mega(isect, sd, cam, W, H, jnp.int32(f),
                                  config=acc_cfg, prev_accu=accu,
                                  prev_planes=cam.planes)
        accu = out["accu"]
        acc.append(np.asarray(out["irradiance"]))
        raw_out = render_whitted_mega(isect, sd, cam, W, H, jnp.int32(f),
                                      config=config)
        raw.append(np.asarray(raw_out["irradiance"]))
    # frame-to-frame fluctuation of the last two frames
    d_acc = np.abs(acc[-1] - acc[-2]).mean()
    d_raw = np.abs(raw[-1] - raw[-2]).mean()
    assert d_acc < d_raw * 0.5, (d_acc, d_raw)


def test_whitted_renderer_state_machine(setup):
    """WhittedMegaRenderer carries accu/prev_planes across frames and
    wraps the frame counter (the kernel-backed Renderer sibling)."""
    from voxel_tracer_tpu.ops.pallas.whitted import WhittedMegaRenderer
    from voxel_tracer_tpu.renderer import RenderConfig

    sd, cam, _config, isect = setup
    cfg = RenderConfig(width=W, height=H, shading="full", max_bounces=3,
                       glass_reflections=2, accumulate=True)
    r = WhittedMegaRenderer(isect, sd, cfg)
    out1 = r.render(cam)
    assert "accu" in out1 and r.frame == 1
    out2 = r.render(cam)
    assert np.isfinite(np.asarray(out2["image"])).all()
    # history carried: second frame's accu differs from the first
    assert not np.array_equal(np.asarray(out1["accu"]),
                              np.asarray(out2["accu"]))
    r.reset_history()
    assert r._accu is None


def test_lambert_mega_accumulate_fixed_point():
    """Deterministic lambert frames are identical, so blending 95%
    history must be a fixed point: accumulated irradiance == raw
    irradiance on reprojected pixels (wiring check for the fast path)."""
    from voxel_tracer_tpu.models.volume import VoxelVolume
    from voxel_tracer_tpu.ops.math3d import BIG_F32

    n = 16
    g = np.zeros((n, n, n), np.uint8)
    g[4:12, 4:12, 4:12] = 30
    vol = VoxelVolume(g, pos=(0, 0, 0), vpu=20.0)
    mv = mega.MegaVolume(vol)
    w, h = 64, 32
    cam = Camera.create((1.2, 0.9, -1.4), (0, 0, 0), w / h)
    base = mega.render_lambert_mega(mv, cam, w, h, interpret=True)
    accu = jnp.concatenate(
        [jnp.zeros((h, w, 3), jnp.float32),
         jnp.full((h, w, 1), BIG_F32, jnp.float32)], axis=-1)
    out = None
    for _ in range(3):
        out = mega.render_lambert_mega(
            mv, cam, w, h, interpret=True, prev_accu=accu,
            prev_planes=cam.planes)
        accu = out["accu"]
    hit = np.asarray(base["depth"]) < 1e30
    np.testing.assert_allclose(
        np.asarray(out["irradiance"])[hit], np.asarray(
            base["irradiance"])[hit], rtol=1e-4, atol=1e-4)
    assert "accu" in out


def test_glass_sees_pillar_through_wall(setup):
    """The diffuse pillar inside the glass box must be visible through
    the wall on the kernel path (medium march + scan continuation)."""
    sd, cam, config, isect = setup
    out = render_whitted_mega(isect, sd, cam, W, H, jnp.int32(7),
                              config=config)
    mats = np.asarray(out["material"]).reshape(-1)
    assert (mats == 3).sum() > 20          # glass front faces hit
    # color on glass pixels differs from pure sky (transmitted content)
    img = np.asarray(out["color"]).reshape(-1, 3)
    glass_px = img[mats == 3]
    assert glass_px.std() > 0.01
