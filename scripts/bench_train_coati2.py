"""COATI2 pretraining-throughput benchmark (samples/sec/chip).

Measures the full directCLR+AR COATI2 train step
(training/train_coati2.py): two-view encode (doubled-batch pass) +
property-conditioned AR forward + AdamW update, on synthetic
device-resident batches.

Env knobs: TRAIN_BATCH (per-chip, default 160), TRAIN_SEQ (default 96),
TRAIN_DTYPE (default bfloat16), TRAIN_WIDTH (model width, default 512 —
COATI2 grande).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from coati_tpu.models.coati2 import init_coati2
from coati_tpu.parallel.mesh import make_mesh, replicate_params, shard_batch
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer
from coati_tpu.training.config import TrainConfig
from coati_tpu.training.flops import coati2_train_step_model_flops
from coati_tpu.training.train import make_optimizer
from coati_tpu.training.train_coati2 import (
    Coati2TrainConfig,
    make_coati2_train_step,
)


def main():
    batch = int(os.environ.get("TRAIN_BATCH", 160))
    seq = int(os.environ.get("TRAIN_SEQ", 96))
    width = int(os.environ.get("TRAIN_WIDTH", 512))
    dtype = os.environ.get("TRAIN_DTYPE", "bfloat16")

    print(f"device: {jax.devices()[0]}, batch {batch}, seq {seq}, width {width}, {dtype}")
    tok = TrieTokenizer(n_seq=seq, **get_vocab("coati2_12_12"))
    config = Coati2TrainConfig(
        n_layer_xformer=16,
        n_hidden_xformer=width,
        embed_dim=width,
        n_head=16,
        n_seq=seq,
        batch_size=batch,
        dtype=dtype,
    )
    model_cfg = config.model_config(tok.n_token)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    optimizer = make_optimizer(TrainConfig(lr=config.lr))
    params = replicate_params(mesh, init_coati2(jax.random.PRNGKey(0), model_cfg))
    opt_state = optimizer.init(params)
    step = make_coati2_train_step(
        mesh, model_cfg, optimizer,
        stop_token=tok.stop_token,
        unk_token=tok.unk_token,
        pad_token=tok.pad_token,
        token_entropy_unit=float(np.log2(tok.n_token)),
        do_clr=True,
        clr_inv_temp=config.clr_inv_temp,
    )

    rng = np.random.default_rng(0)
    g_batch = batch * n_dev

    def rows(w):
        t = rng.integers(len(tok.special_tokens), tok.n_token, size=(g_batch, w))
        t = t.astype(np.int32)
        t[:, 0] = tok.smiles_token
        t[:, -2] = tok.stop_token
        t[:, -1] = tok.pad_token
        return t

    tokens = rows(seq)
    y_next = np.zeros_like(tokens)
    y_next[:, :-1] = tokens[:, 1:]
    y_next[y_next == tok.pad_token] = -1
    device_batch = shard_batch(
        mesh,
        {
            "tokens": tokens,
            "raw_tokens": rows(seq),
            "rand_tokens": rows(seq),
            "y_next": y_next,
        },
    )

    key = jax.random.PRNGKey(1)
    print("compiling...")
    t0 = time.perf_counter()
    params, opt_state, metrics = step(params, opt_state, key, device_batch)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s, "
          f"loss {float(metrics['loss']):.3f}")
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
        f"coati2 train step: {dt * 1000:.1f} ms -> {g_batch / dt:.1f} samples/s "
        f"({g_batch / dt / n_dev:.1f} samples/s/chip, {n_dev} chip(s))"
    )
    # Analytic model FLOPs (training/flops.py; XLA's cost_analysis
    # counts the scanned trunk body once -> unusable, tests/test_flops.py)
    model_flops = coati2_train_step_model_flops(
        n_layer_xformer=config.n_layer_xformer,
        n_hidden_xformer=config.n_hidden_xformer,
        n_tok=tok.n_token,
        batch=g_batch,
        seq=seq,
    )
    ceiling = float(os.environ.get("TRAIN_CEILING_TFLOPS", 103.0))
    mfu = model_flops / dt / n_dev / 1e12
    print(
        f"model FLOPs/step: {model_flops / 1e12:.3f} TF -> "
        f"{mfu:.1f} TFLOP/s/chip = model-FLOPs MFU {100 * mfu / ceiling:.0f}% of the "
        f"{ceiling:.0f} TF/s measured matmul ceiling "
        f"({100 * mfu / 197.0:.0f}% of 197 nominal)"
    )


if __name__ == "__main__":
    main()
