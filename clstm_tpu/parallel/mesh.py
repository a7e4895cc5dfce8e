"""Device mesh construction and batch sharding helpers."""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first n devices (default: all). For CLSTM-scale
    models a single data axis is the right shape — v5e-8 is a 1-D ring for
    our purposes; gradient psum rides ICI."""
    n = n_devices or jax.device_count()
    return jax.make_mesh((n,), (axis,))


def shard_batch(batch: dict, mesh: Mesh, axis: str = DATA_AXIS) -> dict:
    """Place a host batch dict onto the mesh, sharded along the batch dim.
    Rows must divide evenly by the mesh size (use data.pad_batch_rows)."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()
            if k != "texts"}


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
