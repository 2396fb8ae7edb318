"""Device mesh construction.

Axis convention (SURVEY.md §2.4 mapping table):
- "rays": the data-parallel axis — rays/pixels sharded per chip (the analog
  of the reference's OpenMP scanline fan-out, renderer.cpp:199-223).
Voxel grids are replicated over "rays" (small scenes); for giant grids the
brick-sharded mode adds a second "grid" axis (parallel/grid_shard.py:
brick-aligned z-slabs + one all_gather nearest-hit reduction).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAYS = "rays"


def make_ray_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over all (or the first n) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (RAYS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(RAYS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, devices: int) -> int:
    """Rays must divide evenly across the mesh; pad count to a multiple."""
    return ((n + devices - 1) // devices) * devices
