"""Decode latency characterization (serving-oriented).

Throughput benches (bench.py) run saturated batches; serving also cares
about per-request latency at small batch. This measures embed and
embed+decode wall time across the power-of-two bucket ladder on the
current device, printing ms/request and mol/s per bucket.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_latency.py
Env knobs: LAT_SEQ (default 96), LAT_DTYPE (default bfloat16),
LAT_MAX_BUCKET (default 64).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from coati_tpu.models.api import COATI
from coati_tpu.models.coati import CoatiConfig, init_coati
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer


def main():
    seq = int(os.environ.get("LAT_SEQ", 96))
    dtype = os.environ.get("LAT_DTYPE", "bfloat16")
    max_bucket = int(os.environ.get("LAT_MAX_BUCKET", 64))

    tok = TrieTokenizer(n_seq=seq, **get_vocab("mar"))
    cfg = CoatiConfig(
        n_layer_e3gnn=5, n_layer_xformer=16, n_hidden_xformer=256,
        n_hidden_e3nn=256, n_embd_common=256, n_head=16, n_seq=seq,
        n_tok=tok.n_token, norm_clips=True, token_mlp=True, dtype=dtype,
    )
    params = init_coati(jax.random.PRNGKey(0), cfg)
    if dtype == "bfloat16":
        from coati_tpu.ops.layers import cast_floats

        params = cast_floats(params, jnp.bfloat16)
    model = COATI(params, cfg)
    print(f"device: {jax.devices()[0]}, grande-scale, seq {seq}, {dtype}")

    smiles = ["CC(=O)Oc1ccccc1C(=O)O"]
    bucket = 1
    print(f"{'batch':>6} {'embed ms':>10} {'e2e ms':>10} {'e2e mol/s':>10}")
    while bucket <= max_bucket:
        batch_smiles = smiles * bucket
        tokens = np.asarray(
            [tok.tokenize_text("[SMILES]" + s + "[STOP]", pad=True)
             for s in batch_smiles], np.int32)

        def run():
            h = model.encode_tokens(tokens, tok)
            return model.hclip_to_2d_batch(
                np.asarray(h, np.float32), tok, inv_temp=2.0, k=100)

        def run_embed():
            return np.asarray(model.encode_tokens(tokens, tok))

        for _ in range(3):  # compile + steady state
            run()
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            run_embed()
        embed_ms = (time.perf_counter() - t0) / reps * 1000
        t0 = time.perf_counter()
        for _ in range(reps):
            run()
        e2e = (time.perf_counter() - t0) / reps
        print(f"{bucket:>6} {embed_ms:>10.1f} {e2e * 1000:>10.1f} "
              f"{bucket / e2e:>10.1f}")
        bucket *= 2


if __name__ == "__main__":
    main()
