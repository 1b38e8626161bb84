"""Same-process decode-kernel A/B through the REAL sampler (VERDICT r2
item 3 "done" criterion): xla vs the batch-tiled pallas masked-read
kernel, at the production decode config (bf16 + int8 KV + 6-stage
growth + recall 0.8) and without staging (the regime the masked read
targets — a single full-width cache where dead-block DMA elision is the
only thing limiting reads to [0, pos]).

Rows (grande 16x256/16h, vocab 13,603, common [CLIP][UNK][SMILES]
prefix, B/SEQ via DK_B / DK_SEQ):
  xla+staged      production default
  pallas+staged   staging already bounds reads; kernel pays only if
                  grid overhead < residual dead-read saving
  xla+single      one full-width stage (staging OFF)
  pallas+single   the kernel's target regime
Each row: decode-only mol/s (best of DK_REPS same-process runs).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from coati_tpu.models.sampler import auto_stage_widths, generate_tokens
from coati_tpu.models.transformer import (
    TransformerConfig,
    init_transformer,
)

B = int(os.environ.get("DK_B", 512))
SEQ = int(os.environ.get("DK_SEQ", 96))
REPS = int(os.environ.get("DK_REPS", 4))


def bench(name, cfg, params, inj, prefix, stage):
    p = len(prefix)
    tokens = jnp.zeros((B, SEQ), jnp.int32)
    tokens = tokens.at[:, :p].set(jnp.asarray(prefix, jnp.int32))
    prefix_len = jnp.full((B,), p, jnp.int32)
    widths = auto_stage_widths(p, SEQ) if stage else None

    def run(seed):
        out = generate_tokens(
            params, cfg, jax.random.PRNGKey(seed), tokens, prefix_len,
            prefill_len=p, total_len=SEQ, stop_token=3, k=100,
            inv_temp=2.0, inj_payload=inj, inject_token=4,
            stage_widths=widths,
        )
        return np.asarray(out)

    run(0)  # compile + steady-state warmup
    run(1)
    best = float("inf")
    for r in range(REPS):
        t0 = time.perf_counter()
        run(2 + r)
        best = min(best, time.perf_counter() - t0)
    molps = B / best
    print(f"{name:16s}: {molps:8.0f} mol/s decode-only ({best * 1e3:.0f} ms)")
    return molps


def main():
    print(f"device: {jax.devices()[0]}, B={B} seq={SEQ}")
    cfg = TransformerConfig(
        n_layer=16, n_embd=256, n_head=16, n_seq=SEQ, n_tok=13603,
        dtype="bfloat16", softmax_dtype="compute",
    )
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    inj = jax.random.normal(jax.random.PRNGKey(1), (B, 256), jnp.bfloat16)
    prefix = [5, 4, 6]  # [CLIP][UNK][SMILES]-style common prefix

    results = {}
    for name, kernel, stage in (
        ("xla+staged", "xla", True),
        ("pallas+staged", "pallas", True),
        ("xla+single", "xla", False),
        ("pallas+single", "pallas", False),
    ):
        results[name] = bench(
            name, cfg.replace(decode_kernel=kernel), params, inj, prefix,
            stage,
        )
    print(f"\npallas/xla staged: {results['pallas+staged'] / results['xla+staged']:.3f}x"
          f"   single: {results['pallas+single'] / results['xla+single']:.3f}x")


if __name__ == "__main__":
    main()
