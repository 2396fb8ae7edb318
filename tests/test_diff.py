"""Differentiable rendering: custom-VJP replay vs finite differences and
vs JAX autodiff through the scan (BASELINE.json config 2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxel_tracer_tpu.ops import diff


def _setup(n_grid=8, n_rays=32, seed=0):
    rng = np.random.RandomState(seed)
    sigma = jnp.asarray(rng.rand(n_grid, n_grid, n_grid).astype(np.float32) * 4.0)
    albedo = jnp.asarray(rng.rand(n_grid, n_grid, n_grid, 3).astype(np.float32))
    vpu = 8.0  # volume spans [0,1]^3
    o = rng.rand(n_rays, 3).astype(np.float32) * 0.2 - np.array([0.4, 0.0, 0.6])
    d = rng.randn(n_rays, 3).astype(np.float32) + np.array([1.0, 0.2, 1.5])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return sigma, albedo, jnp.asarray(o), jnp.asarray(d), vpu


def test_forward_bounded():
    sigma, albedo, o, d, vpu = _setup()
    out = diff.render_density(sigma, albedo, o, d, vpu, 64)
    c, t = np.asarray(out["color"]), np.asarray(out["trans"])
    assert np.isfinite(c).all() and np.isfinite(t).all()
    assert (t >= 0).all() and (t <= 1.0 + 1e-6).all()
    assert (c >= -1e-6).all()


def test_transmittance_matches_integral():
    """A single fully-dense column: T = exp(-sigma * pathlen)."""
    n = 8
    sigma = jnp.full((n, n, n), 2.0, jnp.float32)
    albedo = jnp.ones((n, n, n, 3), jnp.float32)
    vpu = float(n)  # unit cube
    o = jnp.array([[0.5, 0.5, -1.0]], jnp.float32)
    d = jnp.array([[0.0, 0.0, 1.0]], jnp.float32)
    out = diff.render_density(sigma, albedo, o, d, vpu, 64)
    np.testing.assert_allclose(
        np.asarray(out["trans"])[0], np.exp(-2.0 * 1.0), rtol=1e-4)


@pytest.mark.parametrize("wrt", ["sigma", "albedo"])
def test_grad_matches_finite_difference(wrt):
    sigma, albedo, o, d, vpu = _setup(n_grid=6, n_rays=16, seed=3)
    key_pix = np.random.RandomState(1)

    def loss(sig, alb):
        out = diff.render_density(sig, alb, o, d, vpu, 48)
        return jnp.sum(out["color"] ** 2) + jnp.sum(out["trans"])

    g_sig, g_alb = jax.grad(loss, argnums=(0, 1))(sigma, albedo)
    g = np.asarray(g_sig if wrt == "sigma" else g_alb)

    base = float(loss(sigma, albedo))
    eps = 1e-2
    # probe the highest-|grad| entries + a few random ones
    flat = np.abs(g).reshape(-1)
    idxs = list(np.argsort(flat)[-5:]) + list(
        key_pix.randint(0, flat.size, 3))
    arr = np.asarray(sigma if wrt == "sigma" else albedo)
    checked = 0
    for fi in idxs:
        if flat[fi] < 1e-4:
            continue
        pert = arr.copy().reshape(-1)
        pert[fi] += eps
        pert = jnp.asarray(pert.reshape(arr.shape))
        if wrt == "sigma":
            hi = float(loss(pert, albedo))
        else:
            hi = float(loss(sigma, pert))
        fd = (hi - base) / eps
        an = g.reshape(-1)[fi]
        assert np.isclose(fd, an, rtol=0.08, atol=1e-3), (
            f"{wrt}[{fi}]: fd={fd} vs analytic={an}")
        checked += 1
    assert checked >= 3


def test_grad_matches_autodiff_through_scan():
    """The replay VJP must equal plain autodiff through the forward scan."""
    sigma, albedo, o, d, vpu = _setup(n_grid=6, n_rays=24, seed=7)

    def loss_custom(sig, alb):
        out = diff.render_density(sig, alb, o, d, vpu, 48)
        return jnp.sum(out["color"] * jnp.array([0.2, 0.5, 0.3])) + 0.7 * jnp.sum(out["trans"]) + 0.1 * jnp.sum(out["depth"])

    def loss_plain(sig, alb):
        c, t, dep = diff._render_fwd_only(sig, alb, o, d, vpu, 48)
        return jnp.sum(c * jnp.array([0.2, 0.5, 0.3])) + 0.7 * jnp.sum(t) + 0.1 * jnp.sum(dep)

    gc = jax.grad(loss_custom, argnums=(0, 1))(sigma, albedo)
    gp = jax.grad(loss_plain, argnums=(0, 1))(sigma, albedo)
    np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(gp[0]),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(gp[1]),
                               rtol=2e-3, atol=2e-5)
