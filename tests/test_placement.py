"""Parameter-placement policy tests (parallel/placement.py) — the one
dispatch both trainers share, so COATI1 and COATI2 cannot drift."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coati_tpu.parallel.mesh import make_mesh
from coati_tpu.parallel.placement import resolve_placement
from coati_tpu.parallel.tp import make_tp_mesh


def test_fsdp_requires_pjit():
    with pytest.raises(ValueError, match="fsdp"):
        resolve_placement(make_mesh(8), "fsdp", "shard_map")


def test_tp_requires_pjit():
    mesh = make_tp_mesh(8, model_parallel=2)
    with pytest.raises(ValueError, match="tensor parallelism"):
        resolve_placement(mesh, "auto", "shard_map")


def test_unknown_mode_rejected():
    with pytest.raises(ValueError, match="param_sharding"):
        resolve_placement(make_mesh(8), "zero_infinity", "pjit")


def test_fsdp_placement_shards_and_commit_restores_sharding():
    mesh = make_mesh(8)
    place, commit = resolve_placement(mesh, "fsdp", "pjit")
    params = {"w": jnp.ones((64, 32)), "scalar": jnp.zeros(())}
    placed = place(mesh, params)
    assert placed["w"].addressable_shards[0].data.size * 8 == placed["w"].size
    # commit a host-restored copy back onto the template's shardings
    restored = commit(
        mesh, jax.tree_util.tree_map(np.asarray, jax.device_get(placed)), placed
    )
    assert (
        restored["w"].addressable_shards[0].data.size * 8 == restored["w"].size
    )
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(placed["w"]))


def test_coati2_trainer_exposes_param_sharding():
    from coati_tpu.training.train_coati2 import Coati2TrainConfig

    cfg = Coati2TrainConfig(param_sharding="fsdp")
    assert cfg.param_sharding == "fsdp"
    assert "param_sharding" in cfg.as_dict()


def test_replicated_forces_replication_on_tp_mesh():
    """param_sharding='replicated' must fully replicate even when the
    mesh has a >1 model axis (it is NOT an alias for 'auto')."""
    mesh = make_tp_mesh(8, model_parallel=2)
    place, commit = resolve_placement(mesh, "replicated", "pjit")
    params = {"w": jnp.ones((64, 32))}
    placed = place(mesh, params)
    # every shard holds the full array
    assert placed["w"].addressable_shards[0].data.shape == (64, 32)
    restored = commit(mesh, jax.device_get(placed), placed)
    assert restored["w"].addressable_shards[0].data.shape == (64, 32)

