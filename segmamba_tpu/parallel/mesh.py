"""Mesh construction and sharding rules.

Today's model parallelism story (matching the reference's DP-only training,
SURVEY.md §2.6) is a 1-D ``("data",)`` mesh; the helpers are written against
named axes so a second ("model"/"seq") axis can be added without touching
call sites.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None,
              axis_names: tuple[str, ...] = ("data",),
              shape: tuple[int, ...] | None = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices (all by default).

    By default all devices land on the first axis. Pass ``shape`` (same
    length as ``axis_names``, product = device count) for true 2-D meshes,
    e.g. ``make_mesh(8, ("data", "seq"), shape=(2, 4))`` for DP x SP.
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with the leading dim split over 'data'."""
    s = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
