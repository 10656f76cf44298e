"""Device-mesh construction and batch-axis sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def data_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1D mesh over the snapshot/parameter axis.

    The workload is embarrassingly parallel over parameter points; a 1D
    ``("data",)`` mesh rides ICI for the few collectives (error stats, greedy
    argmax).  Multi-host extends this mesh over DCN transparently.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad the batch axis so it divides the mesh size; returns (padded, n_valid)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, rem)
    return np.pad(np.asarray(x), pad_width, mode="edge"), n


def shard_batch(x, mesh: Mesh):
    """Place an array with its leading axis sharded over the mesh.

    Pads with edge replicas if the batch does not divide the device count
    (returns the padded device array and the original length).
    """
    padded, n = pad_to_multiple(np.asarray(x), mesh.devices.size, axis=0)
    return jax.device_put(padded, batch_sharding(mesh)), n
