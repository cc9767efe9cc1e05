"""Mesh construction helpers.

Axis conventions used across the framework:
  'data'    — batch sharding for DP training (gradient pmean over ICI)
  'spatial' — tile-row sharding for multi-chip tiled inference (ppermute halos)

On the single-chip dev box the same code runs with a trivial 1-device mesh;
tests use 8 fake CPU devices (tests/conftest.py) so the collectives are real.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D mesh over the first n_devices devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"want {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def make_mesh_2d(
    n_data: int, n_spatial: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """('data', 'spatial') mesh: DP x spatial tile sharding."""
    devs = list(devices) if devices is not None else jax.devices()
    need = n_data * n_spatial
    if need > len(devs):
        raise ValueError(f"want {need} devices, have {len(devs)}")
    arr = np.asarray(devs[:need]).reshape(n_data, n_spatial)
    return Mesh(arr, ("data", "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch pytree on the mesh, leading axis sharded."""
    sh = batch_sharded(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
