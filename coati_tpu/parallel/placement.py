"""Parameter-placement policy shared by the trainers.

One place that maps (TrainConfig.param_sharding, parallel_mode, mesh)
to the placement functions, so the COATI1 and COATI2 trainers cannot
drift: "auto" replicates on DP meshes and applies Megatron TP specs
when the mesh has a >1 `model` axis (parallel/tp.py); "replicated"
forces full replication even on a TP mesh; "fsdp" shards params + Adam
moments over the data axis (parallel/fsdp.py). Both non-replicated
layouts require the pjit step formulation (GSPMD inserts the
collectives)."""

from __future__ import annotations

from jax.sharding import Mesh


def resolve_placement(mesh: Mesh, param_sharding: str, parallel_mode: str):
    """-> (place_params(mesh, params), commit_opt(mesh, restored,
    template)). Raises ValueError for unsupported mode combinations."""
    if param_sharding == "fsdp":
        if parallel_mode != "pjit":
            raise ValueError("fsdp requires parallel_mode='pjit'")
        from coati_tpu.parallel.fsdp import shard_params_fsdp
        from coati_tpu.parallel.mesh import commit_to_template

        return shard_params_fsdp, commit_to_template

    if param_sharding == "replicated":
        # full replication even on a mesh that has a >1 model axis
        from coati_tpu.parallel.mesh import replicate_params

        def commit_replicated(mesh, restored, template):
            return replicate_params(mesh, restored)

        return replicate_params, commit_replicated

    if param_sharding != "auto":
        raise ValueError(f"unknown param_sharding {param_sharding!r}")
    if (
        parallel_mode != "pjit"
        and "model" in mesh.axis_names
        and mesh.shape["model"] > 1
    ):
        raise ValueError("tensor parallelism requires parallel_mode='pjit'")
    from coati_tpu.parallel.tp import commit_opt_state, shard_params

    return shard_params, commit_opt_state
