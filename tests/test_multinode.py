"""Multi-node (2-process) training-step equivalence.

Runtime evidence for the multi-node path (examples/train_grande.py
--multihost → jax.distributed.initialize; the reference's only
distribution mechanism is torch.distributed init_process_group,
train_coati.py:62-76): two OS processes with 4 virtual CPU devices each
join a coordinator, form the global 8-device mesh, run ONE
make_train_step step on a deterministic batch, and must produce exactly
the metrics of the single-process 8-device run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from .multinode_common import make_optimizer_and_step, synthetic_batch
from coati_tpu.models.coati import init_coati
from .multinode_common import CFG


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _reference_metrics(mode):
    """Single-process run over the 8 virtual devices of this pytest
    process (conftest provisions them)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    optimizer, step = make_optimizer_and_step(mesh, mode)
    repl = NamedSharding(mesh, P())

    def init_all():
        params = init_coati(jax.random.PRNGKey(0), CFG)
        return params, optimizer.init(params)

    params, opt_state = jax.jit(init_all, out_shardings=(repl, repl))()
    data_sh = NamedSharding(mesh, P("data"))
    batch = {
        k: jax.device_put(v, data_sh) for k, v in synthetic_batch().items()
    }
    rng = jax.device_put(jax.random.PRNGKey(42), repl)
    _, _, metrics = step(params, opt_state, rng, batch)
    return {k: float(v) for k, v in metrics.items()}


def _run_workers(mode, tmp_path, nproc, local_devices, topology):
    """Launch nproc worker processes x local_devices virtual CPU devices
    and return their metric dicts."""
    port = _free_port()
    out = str(tmp_path / "metrics")
    worker = os.path.join(os.path.dirname(__file__), "multinode_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [
                sys.executable, worker, str(pid), str(nproc), str(port),
                mode, out, str(local_devices), topology,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(nproc)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = []
    for pid in range(nproc):
        with open(f"{out}.{pid}") as f:
            results.append(json.load(f))
    assert all(r["global_devices"] == nproc * local_devices for r in results)
    # every process sees identical (pmean'd / replicated) metrics
    for key in ("loss", "ar_loss", "clip_loss"):
        for r in results[1:]:
            assert np.isclose(results[0][key], r[key], atol=1e-6), key
    return results


@pytest.mark.parametrize("mode", ["pjit", "shard_map"])
def test_two_process_step_matches_single_process(mode, tmp_path):
    results = _run_workers(mode, tmp_path, nproc=2, local_devices=4,
                           topology="flat")
    want = _reference_metrics(mode)
    for key in ("loss", "ar_loss", "clip_loss"):
        assert np.isclose(results[0][key], want[key], rtol=1e-5, atol=1e-5), (
            key,
            results[0][key],
            want[key],
        )


def test_four_process_hybrid_dcn_ici_step_matches_single_process(tmp_path):
    """4 processes x 2 virtual devices on a make_hybrid_mesh (data
    factored across the process/DCN granule, model=2 within each process
    over 'ICI') with tensor-parallel weight shardings reproduce the
    single-process dp x tp step — the multi-slice recipe of SURVEY §5.8
    exercised end-to-end."""
    results = _run_workers("pjit", tmp_path, nproc=4, local_devices=2,
                           topology="hybrid")

    # single-process reference: same dp=4 x tp=2 layout on a flat mesh
    from coati_tpu.parallel.tp import make_tp_mesh, shard_params
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_tp_mesh(8, model_parallel=2)
    optimizer, step = make_optimizer_and_step(mesh, "pjit")
    params = shard_params(mesh, init_coati(jax.random.PRNGKey(0), CFG))
    opt_state = optimizer.init(params)
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    batch = {
        k: jax.device_put(v, data_sh) for k, v in synthetic_batch().items()
    }
    rng = jax.device_put(jax.random.PRNGKey(42), repl)
    _, _, metrics = step(params, opt_state, rng, batch)
    for key in ("loss", "ar_loss", "clip_loss"):
        assert np.isclose(
            results[0][key], float(metrics[key]), rtol=1e-5, atol=1e-5
        ), (key, results[0][key], float(metrics[key]))


def test_make_hybrid_mesh_single_granule_fallback():
    """In a single process (one granule) make_hybrid_mesh degrades to a
    plain device mesh with the combined axis sizes."""
    from coati_tpu.parallel.mesh import make_hybrid_mesh

    mesh = make_hybrid_mesh(
        ("data", "model"), ici_shape=(2, 2), dcn_shape=(2, 1),
        devices=jax.devices()[:8],
    )
    assert mesh.shape == {"data": 4, "model": 2}
