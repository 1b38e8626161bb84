"""Benchmark: embed + decode throughput (molecules/sec).

The BASELINE.json north-star workload: encode a batch of SMILES to hclip
embeddings and autoregressively decode them back, grande-scale model
(16x256/16-head transformer, vocab 'mar'). Our path runs the fused
KV-cache jitted sampler on the default JAX device (TPU when present);
the baseline is the reference torch implementation (full-prefix re-run
per token, no KV cache — coati/models/encoding/smiles_xformer.py:272-351)
executed in-process on CPU with identical weights via the converter.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "mol/s", "vs_baseline": N}
Everything else goes to stderr.

Env knobs: BENCH_BATCH (default 1024 — per-step fixed costs amortize
with batch, see PERF.md), BENCH_SEQ (default 96),
BENCH_DTYPE (default bfloat16; embeddings keep fp32 parity elsewhere —
this benchmark measures the production generation path), BENCH_KV
(default "auto", the production CoatiConfig default, which resolves to
int8 under bfloat16 — quality-validated on a trained model,
scripts/eval_int8_decode.py: 100% round-trip/token agreement vs fp32),
BENCH_REF_BATCH (default 8), BENCH_SKIP_REF=1 to reuse the last recorded
baseline rate instead of re-measuring torch.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


SMILES = [
    "CC(=O)Oc1ccccc1C(=O)O",
    "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "c1ccc2c(c1)cccn2",
    "OCC1OC(O)C(O)C(O)C1O",
    "CC(C)NCC(O)c1ccc(O)c(O)c1",
    "Clc1ccccc1C2=NCC(=O)Nc3ccc(cc23)N(=O)=O",
    "CC1=CC(=O)C=CC1=O",
    "NC(=O)c1ccc(N)cc1",
    "COc1cc2c(cc1OC)CC(N)C2",
    "CCN(CC)CCNC(=O)c1ccc(N)cc1",
    "CC(N)Cc1ccccc1",
    "OC(=O)c1ccccc1O",
    "Nc1ccc(cc1)S(=O)(=O)N",
    "CCOC(=O)c1ccccc1N",
    "CN(C)CCOC(c1ccccc1)c1ccccc1",
]


def build_model(n_seq: int, dtype: str):
    import jax
    import jax.numpy as jnp
    from coati_tpu.common.util import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from coati_tpu.models.api import COATI
    from coati_tpu.models.coati import CoatiConfig, init_coati
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

    tok = TrieTokenizer(n_seq=n_seq, **get_vocab("mar"))
    cfg = CoatiConfig(
        n_layer_e3gnn=5,
        n_layer_xformer=16,
        n_hidden_xformer=256,
        n_hidden_e3nn=256,
        n_embd_common=256,
        n_head=16,
        n_seq=n_seq,
        n_tok=tok.n_token,
        norm_clips=True,
        token_mlp=True,
        dtype=dtype,
        kv_dtype=os.environ.get("BENCH_KV", "auto"),  # production default
        # ("auto" resolves to int8 under bfloat16 — TransformerConfig)
        # compute-dtype softmax in the encode pass: the grande-recipe
        # production setting (skips the (B,H,T,T) f32 probs tensor;
        # -29 ms/encode at B=1024, quality-neutral per
        # scripts/eval_softmax_dtype.py)
        softmax_dtype=os.environ.get("BENCH_SOFTMAX", "compute"),
        kv_scale_dtype=os.environ.get("BENCH_KV_SCALE", "float32"),
        decode_kernel=os.environ.get("BENCH_KERNEL", "xla"),
    )
    params = init_coati(jax.random.PRNGKey(0), cfg)
    bench_params = params
    if dtype == "bfloat16":
        bench_params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params
        )
    return COATI(bench_params, cfg), tok, cfg, params


def bench_jax(model, tok, batch: int, n_seq: int):
    smiles = (SMILES * (batch // len(SMILES) + 1))[:batch]
    tokens = np.asarray(
        [tok.tokenize_text("[SMILES]" + s + "[STOP]", pad=True) for s in smiles],
        np.int32,
    )

    def run():
        # fused embed+decode: one device program for the round trip
        smiles, h = model.smiles_to_2d_batch(
            tokens, tok, inv_temp=2.0, k=100, return_embeddings=True
        )
        return smiles

    log("jax warmup (compile + runtime steady-state)...")
    for _ in range(3):
        run()
    log("jax timed runs...")
    # best-of-N inside one process: the dev tunnel drifts up to ~25%
    # run-to-run (PERF.md), and the minimum is the reproducible number
    reps = int(os.environ.get("BENCH_REPS", 5))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    log(f"rep times: {[round(t, 3) for t in times]}")
    return batch / dt, dt


def bench_torch_reference(params, cfg, tok, batch: int, n_seq: int):
    """Reference torch pipeline with the SAME weights (via export)."""
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from oracle import load  # reference modules as oracle

    from coati_tpu.models.convert import export_transformer

    torch.set_num_threads(os.cpu_count() or 8)
    sx = load("ref_smiles_xformer")
    ref_cfg = sx.SmilesTransformerConfig(
        n_layer=cfg.n_layer_xformer,
        n_embd=cfg.n_hidden_xformer,
        n_head=cfg.n_head,
        n_seq=n_seq,
        n_tok=cfg.n_tok,
        biases=True,
        norm_embed=False,
        device=torch.device("cpu"),
        dtype=torch.float32,
    )
    ref = sx.RotarySmilesTransformer(ref_cfg)
    sd = {k: torch.tensor(v) for k, v in export_transformer(
        params.xformer, cfg.xformer_config).items()}
    # strict=False: the exported dict carries weights only, not the
    # registered causal-mask buffer (attn.bias), which init already set
    ref.load_state_dict(sd, strict=False)
    ref.eval()

    smiles = (SMILES * (batch // len(SMILES) + 1))[:batch]
    tokens = torch.tensor(
        [tok.tokenize_text("[SMILES]" + s + "[STOP]", pad=True) for s in smiles],
        dtype=torch.long,
    )
    prefix = tok.tokenize_text("[CLIP][UNK][SMILES]", pad=False)
    payload = torch.randn(batch, cfg.embed_dim)

    with torch.no_grad():
        t0 = time.perf_counter()
        x = ref.xformer(tokens)  # embed pass
        _ = x[:, -1]
        ref.generate_top_k_with_inj_batch(
            prefix=prefix,
            stop_token=tok.stop_token,
            pad_token=tok.pad_token,
            inv_temp=2.0,
            k=100,
            inj_token=tok.unk_token,
            inj_payload=payload,
        )
        dt = time.perf_counter() - t0
    return batch / dt, dt


def main():
    batch = int(os.environ.get("BENCH_BATCH", 1024))
    n_seq = int(os.environ.get("BENCH_SEQ", 96))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    ref_batch = int(os.environ.get("BENCH_REF_BATCH", 8))

    import jax

    device = jax.devices()[0]
    log(f"device: {device}, dtype: {dtype}")
    model, tok, cfg, params = build_model(n_seq, dtype)

    jax_molps, jax_dt = bench_jax(model, tok, batch, n_seq)
    log(f"coati_tpu: {jax_molps:.2f} mol/s (batch {batch}, seq {n_seq}, {jax_dt:.2f}s/iter)")

    baseline_file = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")
    if os.environ.get("BENCH_SKIP_REF") == "1" and os.path.exists(baseline_file):
        with open(baseline_file) as f:
            ref_molps = json.load(f)["ref_molps"]
        log(f"reusing recorded torch baseline: {ref_molps:.3f} mol/s")
    else:
        log(f"torch reference (cpu, batch {ref_batch})...")
        ref_molps, ref_dt = bench_torch_reference(params, cfg, tok, ref_batch, n_seq)
        log(f"torch reference: {ref_molps:.3f} mol/s ({ref_dt:.1f}s)")
        try:
            with open(baseline_file, "w") as f:
                json.dump({"ref_molps": ref_molps, "n_seq": n_seq}, f)
        except OSError:
            pass

    kv = "int8" if cfg.xformer_config.kv_quantized else "compute-dtype"
    result = {
        "metric": f"embed+decode molecules/sec on {device.device_kind} "
        f"(grande-scale, seq {n_seq}, batch {batch}, {dtype}, {kv} kv-cache; "
        f"baseline: torch-cpu reference impl)",
        "value": round(jax_molps, 2),
        "unit": "mol/s",
        "vs_baseline": round(jax_molps / ref_molps, 2),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
