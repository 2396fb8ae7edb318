"""SkyDome sampling: spherical mapping + bilinear filtering semantics."""

import numpy as np

import jax.numpy as jnp

from voxel_tracer_tpu.models.skydome import SkyDome, sample_sky


def _dir_for_uv(u_float, v_float, w, h):
    """Direction whose sample_sky pixel coords are exactly (u_float,
    v_float): u_float = atan2(z, x)/2pi * w - 0.5, v_float =
    acos(y)/pi * h - 0.5."""
    phi = (u_float + 0.5) / w * 2.0 * np.pi
    theta = (v_float + 0.5) / h * np.pi
    y = np.cos(theta)
    s = np.sin(theta)
    return np.array([s * np.cos(phi), y, s * np.sin(phi)], np.float32)


def test_texel_center_exact():
    w, h = 16, 8
    rng = np.random.RandomState(0)
    px = rng.rand(h, w, 3).astype(np.float32)
    sky = SkyDome(px).data()
    for (ut, vt) in [(3, 2), (8, 5), (1, 1), (14, 6)]:
        d = _dir_for_uv(float(ut), float(vt), w, h)
        out = np.asarray(sample_sky(sky, jnp.asarray(d[None])))[0]
        np.testing.assert_allclose(out, px[vt, ut], rtol=1e-3, atol=1e-4)


def test_bilinear_midpoint_averages():
    w, h = 16, 8
    rng = np.random.RandomState(1)
    px = rng.rand(h, w, 3).astype(np.float32)
    sky = SkyDome(px).data()
    # halfway between texels (3, 2) and (4, 2) along u
    d = _dir_for_uv(3.5, 2.0, w, h)
    out = np.asarray(sample_sky(sky, jnp.asarray(d[None])))[0]
    np.testing.assert_allclose(out, 0.5 * (px[2, 3] + px[2, 4]),
                               rtol=1e-3, atol=1e-4)


def test_longitude_wraps_continuously():
    """Sampling just left/right of the phi seam must not jump more than
    one-texel interpolation allows (the wrap fetch, not a clamp)."""
    w, h = 32, 16
    rng = np.random.RandomState(2)
    px = rng.rand(h, w, 3).astype(np.float32)
    sky = SkyDome(px).data()
    eps = 1e-4
    d1 = np.array([np.cos(-np.pi + eps), 0.0,
                   np.sin(-np.pi + eps)], np.float32)
    d2 = np.array([np.cos(np.pi - eps), 0.0,
                   np.sin(np.pi - eps)], np.float32)
    o1 = np.asarray(sample_sky(sky, jnp.asarray(d1[None])))[0]
    o2 = np.asarray(sample_sky(sky, jnp.asarray(d2[None])))[0]
    np.testing.assert_allclose(o1, o2, atol=2e-2)
