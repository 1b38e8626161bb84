"""Multi-node worker: one process of a 2-process jax.distributed run.

Launched by tests/test_multinode.py as
    python multinode_worker.py <process_id> <num_processes> <port> <mode> <out>

Each process provisions 4 virtual CPU devices, joins the coordinator
(the jax.distributed path of examples/train_grande.py --multihost,
matching the reference's torch.distributed init, train_coati.py:62-76),
builds the SAME deterministic tiny model/batch as the single-process
8-device run, executes ONE make_train_step step over the global
(2 processes x 4 devices) mesh, and writes the resulting metrics.
"""

import json
import os
import sys


def main():
    pid, nproc, port, mode, out_path = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
        sys.argv[5],
    )
    local_devices = int(sys.argv[6]) if len(sys.argv) > 6 else 4
    # "flat": 1-D data mesh over all devices (the original 2x4 rig).
    # "hybrid": (data, model) mesh via make_hybrid_mesh — data factored
    # across processes (the DCN granule), model=2 within each process
    # (the ICI granule): the multi-slice dp-over-DCN / tp-over-ICI recipe.
    topology = sys.argv[7] if len(sys.argv) > 7 else "flat"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.device_count() == local_devices * nproc
    assert jax.local_device_count() == local_devices

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multinode_common import CFG, TOK, make_optimizer_and_step, synthetic_batch

    if topology == "hybrid":
        from coati_tpu.parallel.mesh import make_hybrid_mesh

        tp = 2
        assert local_devices % tp == 0, (local_devices, tp)
        mesh = make_hybrid_mesh(
            ("data", "model"),
            ici_shape=(local_devices // tp, tp),
            dcn_shape=(nproc, 1),
        )
    else:
        mesh = Mesh(np.array(jax.devices()), ("data",))
    optimizer, step = make_optimizer_and_step(mesh, mode)

    # deterministic init on every process; materialized as GLOBAL arrays
    # (replicated) through one SPMD jit so multi-process placement is
    # consistent
    from coati_tpu.models.coati import init_coati

    repl = NamedSharding(mesh, P())

    def init_all():
        params = init_coati(jax.random.PRNGKey(0), CFG)
        return params, optimizer.init(params)

    params, opt_state = jax.jit(init_all, out_shardings=(repl, repl))()
    if topology == "hybrid":
        # tensor-parallel weight shardings over the intra-process
        # (ICI-granule) model axis
        from coati_tpu.parallel.tp import param_specs

        specs = param_specs(params, mesh.shape["model"])
        param_sh = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s),
            specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        params = jax.jit(lambda p: p, out_shardings=param_sh)(params)

    batch_np = synthetic_batch()
    data_sh = NamedSharding(mesh, P("data"))
    batch = {
        k: jax.make_array_from_callback(
            v.shape, data_sh, lambda idx, v=v: v[idx]
        )
        for k, v in batch_np.items()
    }
    rng = jax.device_put(jax.random.PRNGKey(42), repl)

    params, opt_state, metrics = step(params, opt_state, rng, batch)
    result = {
        k: float(np.asarray(v.addressable_shards[0].data))
        for k, v in metrics.items()
    }
    result["process_id"] = pid
    result["global_devices"] = jax.device_count()
    with open(f"{out_path}.{pid}", "w") as f:
        json.dump(result, f)
    print(f"worker {pid} done: {result}", flush=True)


if __name__ == "__main__":
    main()
