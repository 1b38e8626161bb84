"""Pretraining-throughput benchmark (samples/sec/chip).

Measures the full CLIP+AR train step (grande config: 16x256 transformer +
5x256 EGNN, AR + global-batch CLIP loss, AdamW update) on synthetic
device-resident batches — the BASELINE.json "pretrain samples/sec/chip"
workload. Steps are chained inside one jit-driven loop to amortize the
host round-trip.

Env knobs: TRAIN_BATCH (per-chip, default 160), TRAIN_SEQ (default 80),
TRAIN_ATOMS (default 96), TRAIN_DTYPE (default bfloat16),
TRAIN_PACKED=1 for realistic per-molecule atom counts (geom_drugs-like
U(24, N) heavy atoms packed before padding — exercises the EGNN
kernel's masked-block skip; default 0 keeps every atom real for
comparability with earlier journal numbers).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from coati_tpu.common.util import enable_persistent_compilation_cache
enable_persistent_compilation_cache()

import jax.numpy as jnp

from coati_tpu.models.coati import CoatiConfig, init_coati
from coati_tpu.parallel.mesh import make_mesh, replicate_params, shard_batch
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer
from coati_tpu.training.config import grande_config
from coati_tpu.training.flops import coati_train_step_model_flops
from coati_tpu.training.train import (
    make_optimizer,
    make_train_step,
    model_config_from_train_config,
)

# Roofline denominators for the MFU report: what THIS device actually
# sustains on chained large bf16 matmuls (PERF.md device characterization),
# and the nominal v5e bf16 peak for reference.
MEASURED_CEILING_TFLOPS = float(os.environ.get("TRAIN_CEILING_TFLOPS", 103.0))
NOMINAL_PEAK_TFLOPS = 197.0


def main():
    batch = int(os.environ.get("TRAIN_BATCH", 160))
    seq = int(os.environ.get("TRAIN_SEQ", 80))
    n_atoms = int(os.environ.get("TRAIN_ATOMS", 96))
    dtype = os.environ.get("TRAIN_DTYPE", "bfloat16")

    print(f"device: {jax.devices()[0]}, batch {batch}, seq {seq}, atoms {n_atoms}, {dtype}")
    tok = TrieTokenizer(n_seq=seq, **get_vocab("mar"))
    config = grande_config(n_seq=seq, max_n_seq=seq, batch_size=batch, dtype=dtype)
    model_cfg = model_config_from_train_config(config, tok.n_token)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    optimizer = make_optimizer(config)
    params = replicate_params(mesh, init_coati(jax.random.PRNGKey(0), model_cfg))
    opt_state = optimizer.init(params)
    step = make_train_step(
        mesh, model_cfg, optimizer,
        stop_token=tok.stop_token,
        unk_token=tok.unk_token,
        p_clip_emb_smi=config.p_clip_emb_smi,
        token_entropy_unit=float(np.log2(tok.n_token)),
        do_clip=True,
    )

    rng = np.random.default_rng(0)
    g_batch = batch * n_dev
    tokens = rng.integers(100, tok.n_token, size=(g_batch, seq)).astype(np.int32)
    tokens[:, 0] = tok.smiles_token
    tokens[:, -2] = tok.stop_token
    tokens[:, -1] = tok.pad_token
    y_next = np.zeros_like(tokens)
    y_next[:, :-1] = tokens[:, 1:]
    y_next[y_next == tok.pad_token] = -1
    atoms = rng.integers(1, 9, size=(g_batch, n_atoms)).astype(np.int32)
    if os.environ.get("TRAIN_PACKED", "0") == "1":
        natoms = rng.integers(24, n_atoms + 1, size=(g_batch,))
        atoms[np.arange(n_atoms)[None, :] >= natoms[:, None]] = 0
    device_batch = shard_batch(
        mesh,
        {
            "raw_tokens": tokens,
            "tokens": tokens,
            "y_next": y_next,
            "atoms": atoms,
            "coords": rng.normal(size=(g_batch, n_atoms, 3)).astype(np.float32),
        },
    )

    key = jax.random.PRNGKey(1)
    print("compiling...")
    t0 = time.perf_counter()
    params, opt_state, metrics = step(params, opt_state, key, device_batch)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s, "
          f"loss {float(metrics['loss']):.3f}")

    # Analytic model FLOPs (training/flops.py, verified vs XLA's counter
    # in tests/test_flops.py). XLA's own cost_analysis is NOT usable
    # here: it counts the lax.scan trunk body once and cannot see inside
    # the Pallas message kernel, undercounting this step ~10x.
    model_flops = coati_train_step_model_flops(
        n_layer_xformer=config.n_layer_xformer,
        n_hidden_xformer=config.n_hidden_xformer,
        n_layer_e3gnn=config.n_layer_e3gnn,
        n_hidden_e3nn=config.n_hidden_e3nn,
        n_tok=tok.n_token,
        batch=g_batch,
        seq=seq,
        natoms=n_atoms,
    )
    # several warmup steps: some runtimes take a few executions to reach
    # steady state after compilation
    for i in range(4):
        key = jax.random.fold_in(key, 1000 + i)
        params, opt_state, metrics = step(params, opt_state, key, device_batch)
        _ = float(metrics["loss"])

    reps = 10
    t0 = time.perf_counter()
    for i in range(reps):
        key = jax.random.fold_in(key, i)
        params, opt_state, metrics = step(params, opt_state, key, device_batch)
    _ = float(metrics["loss"])  # sync
    dt = (time.perf_counter() - t0) / reps
    print(
        f"train step: {dt * 1000:.1f} ms -> {g_batch / dt:.1f} samples/s "
        f"({g_batch / dt / n_dev:.1f} samples/s/chip, {n_dev} chip(s))"
    )
    mfu = model_flops / dt / n_dev / 1e12
    print(
        f"model FLOPs/step: {model_flops / 1e12:.3f} TF -> "
        f"{mfu:.1f} TFLOP/s/chip = model-FLOPs MFU "
        f"{100 * mfu / MEASURED_CEILING_TFLOPS:.0f}% of the "
        f"{MEASURED_CEILING_TFLOPS:.0f} TF/s measured matmul ceiling "
        f"({100 * mfu / NOMINAL_PEAK_TFLOPS:.0f}% of {NOMINAL_PEAK_TFLOPS:.0f} nominal)"
    )


if __name__ == "__main__":
    main()
