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


def make_hybrid_mesh(
    axis_names: Sequence[str],
    ici_shape: Sequence[int],
    dcn_shape: Sequence[int],
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Multi-slice / multi-host mesh with explicit DCN vs ICI placement
    (SURVEY §5.8: DP across DCN for multi-slice pods).

    `ici_shape` and `dcn_shape` are per-axis factors (elementwise product
    = total axis size). Put data-parallel replication factors in
    `dcn_shape` — that traffic crosses the slow inter-slice network only
    for gradient reduction — and model/pipe/seq factors in `ici_shape`
    so tensor collectives ride intra-slice ICI. Wraps
    jax.experimental.mesh_utils.create_hybrid_device_mesh; granules are
    TPU slices when devices carry a slice_index (real multi-slice pods)
    and host processes otherwise (multi-process CPU/dev rigs). A
    single-granule device set falls back to create_device_mesh with the
    combined shape.

    Example (2 slices x 4 chips, dp over DCN, tp over ICI):
        make_hybrid_mesh(("data", "model"), ici_shape=(1, 4),
                         dcn_shape=(2, 1))
    """
    from jax.experimental import mesh_utils

    if devices is None:
        devices = jax.devices()
    assert len(axis_names) == len(ici_shape) == len(dcn_shape), (
        axis_names, ici_shape, dcn_shape,
    )
    has_slice = getattr(devices[0], "slice_index", None) is not None
    granules = {
        (d.slice_index if has_slice else d.process_index) for d in devices
    }
    if len(granules) == 1:
        total = [i * d for i, d in zip(ici_shape, dcn_shape)]
        return Mesh(
            mesh_utils.create_device_mesh(total, devices=list(devices)),
            tuple(axis_names),
        )
    dev_mesh = mesh_utils.create_hybrid_device_mesh(
        tuple(ici_shape),
        tuple(dcn_shape),
        devices=list(devices),
        process_is_granule=not has_slice,
    )
    return Mesh(dev_mesh, tuple(axis_names))


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
