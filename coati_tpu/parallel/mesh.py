"""Device-mesh helpers.

The TPU-native replacement for the reference's NCCL process-group
topology (coati/training/train_coati.py:71-76): a 1-D `data` mesh over
all addressable devices (ICI within a slice, DCN across slices via
jax.distributed). Parameters are replicated; batches are sharded on the
leading axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    """Device-put every array in the batch sharded along its leading dim.

    Single-device meshes take a plain device_put: some runtimes (the
    tunneled single-chip dev environment) execute programs with
    NamedSharding-committed inputs ~100x slower; with one device the
    sharding carries no information anyway."""
    if mesh.devices.size == 1:
        dev = mesh.devices.reshape(-1)[0]
        return {
            k: jax.device_put(v, dev) for k, v in batch.items() if hasattr(v, "shape")
        }
    sharding = batch_sharding(mesh, axis)
    return {
        k: jax.device_put(v, sharding)
        for k, v in batch.items()
        if hasattr(v, "shape")
    }


def commit_to_template(mesh: Mesh, restored, template):
    """Re-place a checkpoint-restored pytree onto the mesh using the
    shardings of a freshly-built `template` (e.g. optimizer.init output).
    Leaves without a usable sharding (host arrays, scalars whose template
    carries an arbitrary single-device placement) replicate."""
    replicated_sharding = replicated(mesh)

    def place(r, t):
        sharding = getattr(t, "sharding", None)
        if sharding is None or getattr(t, "ndim", 0) == 0:
            sharding = replicated_sharding
        return jax.device_put(r, sharding)

    return jax.tree_util.tree_map(place, restored, template)


def replicate_params(mesh: Mesh, params):
    if mesh.devices.size == 1:
        dev = mesh.devices.reshape(-1)[0]
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), params)
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), params)
