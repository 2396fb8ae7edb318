"""Parity + gradient tests for the Pallas differentiable-integration
kernels (ops/pallas/diffint.py) against the XLA reference path
(ops/diff.py render_density) in interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxel_tracer_tpu.ops import diff
from voxel_tracer_tpu.ops.pallas import diffint


def _fan_rays(n_side, mixed_signs=True):
    """Coherent fan from one origin toward a grid of targets: contains all
    four (du, dv) sign quadrants when mixed_signs (exercises the quadrant
    passes)."""
    span = (0.2, 1.4) if mixed_signs else (0.9, 1.4)
    yy, zz = np.meshgrid(np.linspace(*span, n_side),
                         np.linspace(*span, n_side))
    tgt = np.stack([np.full(yy.size, 1.6), yy.ravel(), zz.ravel()], -1)
    o = np.tile(np.array([-0.9, 0.8, 0.8]), (tgt.shape[0], 1))
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


@pytest.fixture(scope="module")
def field():
    rng = np.random.default_rng(0)
    G = 16
    sigma = jnp.asarray(rng.uniform(0, 8.0, (G, G, G)), jnp.float32)
    albedo = jnp.asarray(rng.uniform(0, 1, (G, G, G, 3)), jnp.float32)
    return sigma, albedo


def test_pack_roundtrip(field):
    sigma, _ = field
    rows = diffint.pack_rows(sigma)
    back = diffint.unpack_rows(rows, sigma.shape)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(sigma))


def test_forward_parity_mixed_quadrants(field):
    sigma, albedo = field
    o, d = _fan_rays(32)
    ref = diff.render_density(sigma, albedo, o, d, 10.0, 192)
    out = diffint.render_density_mega(sigma, albedo, o, d, 10.0, 8, 0.0,
                                      True)
    fl = np.asarray(out["flags"])
    assert fl.mean() < 0.02, "k-fighters should be rare for a one-sided fan"
    ok = fl == 0
    for k in ("color", "trans", "depth"):
        a, b = np.asarray(ref[k]), np.asarray(out[k])
        assert np.abs(a - b)[ok].max() < 5e-5, k


def test_forward_misses_keep_background(field):
    sigma, albedo = field
    # rays that miss the volume entirely: color 0, trans 1
    o = jnp.asarray([[3.0, 3.0, 3.0], [-1.0, -1.0, -1.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0]], jnp.float32)
    out = diffint.render_density_mega(sigma, albedo, o, d, 10.0, 8, 0.0,
                                      True)
    np.testing.assert_allclose(np.asarray(out["color"]), 0.0)
    np.testing.assert_allclose(np.asarray(out["trans"]), 1.0)


def test_gradient_parity(field):
    sigma, albedo = field
    o, d = _fan_rays(16)
    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.uniform(0, 1, (o.shape[0], 3)), jnp.float32)

    def loss_ref(s, a):
        out = diff.render_density(s, a, o, d, 10.0, 192)
        return (jnp.mean((out["color"] - target) ** 2)
                + 0.1 * jnp.mean(out["trans"])
                + 0.01 * jnp.mean(out["depth"]))

    def loss_ker(s, a):
        out = diffint.render_density_mega(s, a, o, d, 10.0, 8, 0.0, True)
        return (jnp.mean((out["color"] - target) ** 2)
                + 0.1 * jnp.mean(out["trans"])
                + 0.01 * jnp.mean(out["depth"]))

    gr = jax.grad(loss_ref, argnums=(0, 1))(sigma, albedo)
    gk = jax.grad(loss_ker, argnums=(0, 1))(sigma, albedo)
    for a, b in zip(gr, gk):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max()
        assert np.abs(a - b).max() < 5e-3 * scale


def test_finite_difference(field):
    """Central-difference check on the kernel's own forward at the
    highest-|grad| sigma voxel (where FD has signal)."""
    sigma, albedo = field
    o, d = _fan_rays(8)

    def loss(s):
        out = diffint.render_density_mega(s, albedo, o, d, 10.0, 8, 0.0,
                                          True)
        return jnp.sum(out["color"])

    g = np.asarray(jax.grad(loss)(sigma))
    idx = np.unravel_index(np.abs(g).argmax(), g.shape)
    eps = 1e-2
    lp = loss(sigma.at[idx].add(eps))
    lm = loss(sigma.at[idx].add(-eps))
    fd = (float(lp) - float(lm)) / (2 * eps)
    assert abs(fd - g[idx]) < 0.05 * max(abs(fd), abs(g[idx]), 1e-6)


def test_tile_raster_roundtrip():
    x = jnp.arange(64 * 128 * 3, dtype=jnp.float32).reshape(64 * 128, 3)
    t = diffint.tile_raster(x, 64, 128)
    back = diffint.untile_raster(t, 64, 128)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_t_eps_early_termination(field):
    """t_eps > 0 must not change results beyond the transmittance floor."""
    sigma, albedo = field
    o, d = _fan_rays(8)
    a = diffint.render_density_mega(sigma, albedo, o, d, 10.0, 8, 0.0, True)
    b = diffint.render_density_mega(sigma, albedo, o, d, 10.0, 8, 1e-3,
                                    True)
    ca, cb = np.asarray(a["color"]), np.asarray(b["color"])
    assert np.abs(ca - cb).max() < 2e-3


def test_slab_sequencer_parity(field):
    """render_density_slabs == render_density_mega (2 z-slabs, 16^3)."""
    sigma, albedo = field
    o, d = _fan_rays(16)
    a = diffint.render_density_mega(sigma, albedo, o, d, 10.0, 8, 0.0,
                                    True)
    b = diffint.render_density_slabs(sigma, albedo, o, d, 10.0, 2, 8,
                                     0.0, True)
    ok = (np.asarray(a["flags"]) == 0) & (np.asarray(b["flags"]) == 0)
    for k in ("color", "trans", "depth"):
        xa, xb = np.asarray(a[k]), np.asarray(b[k])
        assert np.abs(xa - xb)[ok].max() < 5e-5, k


def test_slab_sequencer_grads(field):
    sigma, albedo = field
    o, d = _fan_rays(12)
    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.uniform(0, 1, (o.shape[0], 3)), jnp.float32)

    def loss(fn, *fargs):
        def f(s, a):
            out = fn(s, a, o, d, 10.0, *fargs)
            return jnp.mean((out["color"] - target) ** 2)
        return f

    gm = jax.grad(loss(diffint.render_density_mega, 8, 0.0, True),
                  argnums=(0, 1))(sigma, albedo)
    gs = jax.grad(loss(diffint.render_density_slabs, 2, 8, 0.0, True),
                  argnums=(0, 1))(sigma, albedo)
    for a, b in zip(gm, gs):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() < 5e-3 * max(np.abs(a).max(), 1e-9)


def test_empty_brick_skip_exact_on_sparse_scene():
    """The occupancy gate (occ_words) skips bricks with sigma == 0
    everywhere; contributions AND gradients through such bricks are
    identically zero, so results must match the XLA reference exactly
    on a sparse field."""
    import jax
    import jax.numpy as jnp
    from voxel_tracer_tpu.ops import diff
    from voxel_tracer_tpu.ops.pallas import diffint

    G = 32
    rng = np.random.RandomState(11)
    zz, yy, xx = np.meshgrid(*[np.linspace(0, 1, G)] * 3, indexing="ij")
    r2 = (xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2
    blob = 30.0 * np.exp(-r2 * 60.0)
    sigma = jnp.asarray(np.where(blob > 0.05,
                                 rng.rand(G, G, G) * blob * 0.3,
                                 0.0).astype(np.float32))
    albedo = jnp.asarray(rng.rand(G, G, G, 3).astype(np.float32))
    occ = np.asarray(diffint.occ_words(diffint.pack_rows(sigma)))
    nb = (G // 8) ** 3
    bits = ((occ[:, None] >> np.arange(32)[None, :]) & 1).ravel()[:nb]
    assert 0 < bits.sum() < nb, "scene must have empty AND occupied bricks"

    n = 2048
    # coherent +z bundle (the k-fighter class needs a re-trace and is
    # out of scope here — the skip is what's under test)
    o = np.stack([rng.rand(n), rng.rand(n),
                  np.full(n, -0.5)], 1).astype(np.float32)
    d = np.array([0.1, 0.05, 1.0], np.float32) \
        + rng.randn(n, 3).astype(np.float32) * 0.08
    d[:, 2] = np.abs(d[:, 2]) + 0.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_l, d_l = jnp.asarray(o), jnp.asarray(d)

    ref = diff.render_density(sigma, albedo, o_l, d_l, float(G), 256)
    out = diffint.render_density_mega(sigma, albedo, o_l, d_l, float(G),
                                      8, 0.0, True)
    ok = np.asarray(out["flags"]) == 0
    assert ok.mean() > 0.9
    np.testing.assert_allclose(np.asarray(out["color"])[ok],
                               np.asarray(ref["color"])[ok],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["trans"])[ok],
                               np.asarray(ref["trans"])[ok],
                               rtol=2e-4, atol=2e-5)

    tgt = jnp.asarray(rng.rand(n, 3).astype(np.float32))

    def loss_k(sg, al):
        o_ = diffint.render_density_mega(sg, al, o_l, d_l, float(G), 8,
                                         0.0, True)
        m = jnp.asarray(ok)[:, None]
        return jnp.mean(jnp.where(m, (o_["color"] - tgt) ** 2, 0.0))

    def loss_r(sg, al):
        o_ = diff.render_density(sg, al, o_l, d_l, float(G), 256)
        m = jnp.asarray(ok)[:, None]
        return jnp.mean(jnp.where(m, (o_["color"] - tgt) ** 2, 0.0))

    gk = jax.grad(loss_k, argnums=(0, 1))(sigma, albedo)
    gr = jax.grad(loss_r, argnums=(0, 1))(sigma, albedo)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               rtol=5e-3, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]),
                               rtol=5e-3, atol=5e-5)
    # gradients into empty bricks are exactly zero on both paths
    empty_mask = np.asarray(sigma) == 0.0
    assert np.abs(np.asarray(gk[0])[empty_mask]).max() == 0.0
