"""Inverse rendering: optimize a density/albedo grid from posed images.

BASELINE.json config 5: "inverse rendering: optimize 128^3 density+albedo
grid from 32 posed target images (full backward path under jit + multi-host
sharding)".  The training step is ray-sharded over the device mesh with
gradient psum over ICI (parallel/sharding.py); checkpoint/resume via
utils/checkpoint.py.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from voxel_tracer_tpu.models.camera import Camera, rays_for_image
from voxel_tracer_tpu.ops import diff
from voxel_tracer_tpu.parallel import mesh as pmesh
from voxel_tracer_tpu.parallel.sharding import make_train_step
from voxel_tracer_tpu.utils.checkpoint import CheckpointManager


@dataclasses.dataclass
class TrainConfig:
    grid_size: tuple = (64, 64, 64)        # (Z, Y, X)
    vpu: float = 64.0                      # grid spans [0, ~1]^3
    lr: float = 0.15
    steps: int = 200
    rays_per_batch: int = 8192
    march_steps: int = 192
    sigma_init: float = 0.1
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 100
    metrics_path: Optional[str] = None     # JSONL metrics stream
    # 'xla': mesh-sharded wavefront march (multi-chip path).
    # 'pallas': single-chip fused Pallas integrate kernels
    # (ops/pallas/diffint.py) — batches must be tile-coherent, so fit()
    # samples contiguous 1024-ray tiles; grids beyond the VMEM budget
    # (~64^3 with albedo) automatically use the z-slab sequencer.
    backend: str = "xla"
    n_slabs: int = 0                       # 0 = auto (pallas backend)


def init_params(cfg: TrainConfig):
    z, y, x = cfg.grid_size
    return {
        "sigma": jnp.full((z, y, x), cfg.sigma_init, jnp.float32),
        "albedo": jnp.full((z, y, x, 3), 0.5, jnp.float32),
    }


def make_dataset(views, width: int, height: int, vpu: float, grid_size,
                 tile_order: bool = False):
    """Posed images -> flat arrays of (local-space origins, dirs, pixels).

    views: list of (Camera, image (H,W,3)).  Rays are pre-transformed into
    the grid's local frame (identity rotation, grid centered at origin).
    tile_order: reorder each view into 32x32-pixel tile-major order (the
    coherent layout the Pallas backend's batch sampler expects).
    """
    gz, gy, gx = grid_size
    pivot = np.array([gx, gy, gz], np.float32) / (2.0 * vpu)
    all_o, all_d, all_c = [], [], []
    for cam, img in views:
        o, d = rays_for_image(cam, width, height)
        o = np.asarray(o) + pivot             # world->local: translate only
        d = np.asarray(d)
        c = np.asarray(img).reshape(-1, 3)
        if tile_order:
            from voxel_tracer_tpu.ops.pallas import diffint
            o = np.asarray(diffint.tile_raster(jnp.asarray(o), height,
                                               width))
            d = np.asarray(diffint.tile_raster(jnp.asarray(d), height,
                                               width))
            c = np.asarray(diffint.tile_raster(jnp.asarray(c), height,
                                               width))
        all_o.append(o)
        all_d.append(d)
        all_c.append(c)
    return (np.concatenate(all_o), np.concatenate(all_d),
            np.concatenate(all_c))


class Trainer:
    def __init__(self, cfg: TrainConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else pmesh.make_ray_mesh()
        self.optimizer = optax.adam(cfg.lr)
        if cfg.backend == "pallas":
            self.step_fn = self._make_pallas_step()
        else:
            self.step_fn = make_train_step(
                self.mesh, self.optimizer, cfg.vpu, cfg.march_steps)
        self.params = init_params(cfg)
        self.opt_state = self.optimizer.init(self.params)
        self.step = 0
        self.ckpt = (CheckpointManager(cfg.checkpoint_dir)
                     if cfg.checkpoint_dir else None)
        from voxel_tracer_tpu.utils.logging import MetricsLogger
        self.metrics = MetricsLogger(cfg.metrics_path) \
            if cfg.metrics_path else None

    def _make_pallas_step(self):
        from voxel_tracer_tpu.ops.pallas import diffint
        cfg = self.cfg
        gz, gy, gx = cfg.grid_size
        voxels = gz * gy * gx
        # VMEM budget: 4 f32 tables + 4 gradient tables must fit ~16 MB
        n_slabs = cfg.n_slabs
        if n_slabs == 0:
            n_slabs = 1
            while voxels // n_slabs > 64 ** 3:
                n_slabs *= 2

        def loss(params, o, d, c):
            if n_slabs > 1:
                out = diffint.render_density_slabs(
                    params["sigma"], params["albedo"], o, d,
                    float(cfg.vpu), n_slabs, 8, 1e-4, False)
            else:
                out = diffint.render_density_mega(
                    params["sigma"], params["albedo"], o, d,
                    float(cfg.vpu), 8, 1e-4, False)
            return jnp.mean((out["color"] - c) ** 2)

        opt = self.optimizer

        @jax.jit
        def step(params, opt_state, o, d, c):
            l, g = jax.value_and_grad(loss)(params, o, d, c)
            up, opt_state = opt.update(g, opt_state, params)
            return optax.apply_updates(params, up), opt_state, l

        return step

    def maybe_restore(self) -> bool:
        if self.ckpt is None:
            return False
        restored = self.ckpt.restore()
        if restored is None:
            return False
        self.step, state = restored
        self.params = jax.tree.map(jnp.asarray, state["params"])
        self.opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
        return True

    def fit(self, origins, dirs, targets, log_every: int = 50,
            log_fn: Callable = print):
        """Run cfg.steps optimization steps over a ray dataset."""
        cfg = self.cfg
        n_dev = self.mesh.devices.size
        batch = pmesh.pad_to_multiple(cfg.rays_per_batch, n_dev)
        n = origins.shape[0]
        rng = np.random.RandomState(0)
        losses = []
        tile = 1024
        n_tiles = max(n // tile, 1)
        while self.step < cfg.steps:
            if cfg.backend == "pallas":
                # contiguous 1024-ray tiles keep kernel tiles coherent
                # (dataset rays should be in tile_raster order per view)
                starts = rng.randint(0, n_tiles, batch // tile) * tile
                idx = (starts[:, None] + np.arange(tile)[None, :]).ravel()
            else:
                idx = rng.randint(0, n, batch)
            o = jnp.asarray(origins[idx], jnp.float32)
            d = jnp.asarray(dirs[idx], jnp.float32)
            c = jnp.asarray(targets[idx], jnp.float32)
            self.params, self.opt_state, loss = self.step_fn(
                self.params, self.opt_state, o, d, c)
            self.step += 1
            if self.step % log_every == 0:
                losses.append(float(loss))
                log_fn(f"step {self.step}: loss {float(loss):.6f}")
                if self.metrics is not None:
                    self.metrics.log(step=self.step, loss=float(loss),
                                     rays=batch)
            if (self.ckpt is not None
                    and self.step % cfg.checkpoint_every == 0):
                self.ckpt.save(self.step, {
                    "params": self.params, "opt_state": self.opt_state})
        return losses

    def render(self, camera: Camera, width: int, height: int, background=None):
        gz, gy, gx = self.cfg.grid_size
        pivot = jnp.array([gx, gy, gz], jnp.float32) / (2.0 * self.cfg.vpu)
        o, d = rays_for_image(camera, width, height)
        out = diff.render_density(
            self.params["sigma"], self.params["albedo"],
            o + pivot, d, self.cfg.vpu, self.cfg.march_steps)
        color = out["color"]
        if background is not None:
            color = color + out["trans"][:, None] * jnp.asarray(background)
        return np.asarray(color).reshape(height, width, 3)
