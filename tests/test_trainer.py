"""Inverse rendering converges on the 8-device virtual mesh (config 5
scaled down): sharded train step + grad psum + checkpoint resume."""

import numpy as np
import jax
import jax.numpy as jnp

from voxel_tracer_tpu.models.camera import Camera, rays_for_image
from voxel_tracer_tpu.ops import diff
from voxel_tracer_tpu.trainer import TrainConfig, Trainer


def _target_views(grid_n=12, n_views=6, img=24, vpu=12.0):
    z, y, x = np.meshgrid(*[np.arange(grid_n)] * 3, indexing="ij")
    c = (grid_n - 1) / 2
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    sigma = jnp.asarray(np.where(r < grid_n * 0.33, 10.0, 0.0), jnp.float32)
    albedo = jnp.asarray(
        np.stack([x / grid_n, y / grid_n, z / grid_n], -1), jnp.float32)
    pivot = np.full(3, grid_n / (2 * vpu), np.float32)
    O, D, C = [], [], []
    for vi in range(n_views):
        a = 2 * np.pi * vi / n_views
        cam = Camera.create(
            (1.5 * np.cos(a), 0.4, 1.5 * np.sin(a)), (0, 0, 0), 1.0)
        o, d = rays_for_image(cam, img, img)
        out = diff.render_density(sigma, albedo, o + pivot, d, vpu, 40)
        O.append(np.asarray(o) + pivot)
        D.append(np.asarray(d))
        C.append(np.asarray(out["color"]))
    return (np.concatenate(O), np.concatenate(D), np.concatenate(C))


def test_training_reduces_loss_on_mesh(tmp_path):
    assert len(jax.devices()) == 8, "conftest should give 8 virtual devices"
    o, d, c = _target_views()
    cfg = TrainConfig(grid_size=(12, 12, 12), vpu=12.0, lr=0.25, steps=40,
                      rays_per_batch=1024, march_steps=40,
                      checkpoint_dir=str(tmp_path / "ck"),
                      checkpoint_every=20)
    tr = Trainer(cfg)
    losses = []
    tr.fit(o, d, c, log_every=10, log_fn=lambda s: losses.append(s))
    assert tr.step == 40

    # loss must drop substantially vs the flat init
    first = float(losses[0].split("loss ")[1])
    last = float(losses[-1].split("loss ")[1])
    assert last < first * 0.5, f"{first} -> {last}"

    # checkpoint resume restores step + params
    tr2 = Trainer(cfg)
    assert tr2.maybe_restore()
    assert tr2.step == 40
    np.testing.assert_allclose(np.asarray(tr2.params["sigma"]),
                               np.asarray(tr.params["sigma"]), rtol=1e-6)


def test_sharded_step_matches_single_device():
    """pmean-sharded gradients == single-device gradients (same batch)."""
    import optax
    from voxel_tracer_tpu.parallel.mesh import make_ray_mesh
    from voxel_tracer_tpu.parallel.sharding import make_train_step

    o, d, c = _target_views(grid_n=8, n_views=2, img=16, vpu=8.0)
    n = 512
    o, d, c = (jnp.asarray(a[:n], jnp.float32) for a in (o, d, c))

    params = {"sigma": jnp.full((8, 8, 8), 0.3, jnp.float32),
              "albedo": jnp.full((8, 8, 8, 3), 0.5, jnp.float32)}
    opt = optax.sgd(0.1)

    step8 = make_train_step(make_ray_mesh(8), opt, 8.0, 32)
    step1 = make_train_step(make_ray_mesh(1), opt, 8.0, 32)

    p8, _, l8 = step8(params, opt.init(params), o, d, c)
    p1, _, l1 = step1(params, opt.init(params), o, d, c)
    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p8["sigma"]),
                               np.asarray(p1["sigma"]), rtol=1e-4, atol=1e-7)
