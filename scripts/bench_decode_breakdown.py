"""Decode-step cost decomposition at the bench shapes.

Same-process A/Bs (in-jit chained loop, CLAUDE.md method) that separate
the decode step's cache-read traffic from its fixed per-step cost:

  width sweep   — decode_step chained over positions [0, W) for
                  W in {8, 32, 96}: the W-slope is the cache-read cost,
                  the W->0 intercept is everything else (per-token MLP
                  weights, logits head, layer norms, update slices)
  kv dtype      — bf16 vs int8 cache at each width, same process
  sampling      — sample_top_k alone on carried logits

Motivation: int8 KV measured only +7% over bf16 same-process at
B=1024/seq 96 (PERF.md) — if cache reads dominated the step, halving
them should gain far more. This locates where the rest of the step
time actually goes. Knobs: DB_B (batch, default 1024).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from coati_tpu.models.transformer import (
    TransformerConfig,
    decode_step,
    init_transformer,
    make_empty_cache,
)
from coati_tpu.ops.sampling import sample_top_k

B = int(os.environ.get("DB_B", 1024))
N_TOK = 13603  # grande 'mar' vocab size
ITERS = 96  # chained decode steps per timed call


def timed(name, j, *args):
    np.asarray(j(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(j(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1000
    print(f"{name:28s}: {ms:7.3f} ms/step")
    return ms


def main():
    print(f"device: {jax.devices()[0]}, B={B}, vocab {N_TOK}, 16x256/16h bf16")
    results = {}
    for kv in ("compute", "int8"):
        for width in (8, 32, 96):
            cfg = TransformerConfig(
                n_layer=16, n_embd=256, n_head=16, n_seq=96, n_tok=N_TOK,
                dtype="bfloat16", kv_dtype=kv,
            )
            params = init_transformer(jax.random.PRNGKey(0), cfg)
            cache = make_empty_cache(cfg, B, width=width)
            tok0 = jnp.zeros((B,), jnp.int32)

            def run(params, cache, tok0, cfg=cfg, width=width):
                def body(i, carry):
                    tok, cache, acc = carry
                    logits, cache = decode_step(
                        params, cfg, tok, i % width, cache
                    )
                    tok = jnp.argmax(logits[:, :64], axis=-1).astype(jnp.int32)
                    return tok, cache, acc + jnp.sum(logits[:, 0])

                _, _, acc = lax.fori_loop(
                    0, ITERS, body, (tok0, cache, jnp.float32(0.0))
                )
                return acc

            j = jax.jit(run)
            results[kv, width] = timed(f"decode_step {kv} W={width}", j, params, cache, tok0)

    # sampling cost on carried logits (the sampler adds this per step)
    key = jax.random.PRNGKey(1)
    logits0 = jax.random.normal(key, (B, N_TOK), jnp.float32)

    def run_sample(logits0):
        def body(i, carry):
            logits, acc = carry
            s = sample_top_k(jax.random.fold_in(key, i), logits, 100, 2.0, approx=True)
            return logits * (1.0 + 1e-30 * jnp.sum(s)), acc + jnp.sum(s)

        _, acc = lax.fori_loop(0, ITERS, body, (logits0, jnp.float32(0.0)))
        return acc

    t_sample = timed("sample_top_k k=100 approx", jax.jit(run_sample), logits0)

    print("\nderived (ms/step):")
    for kv in ("compute", "int8"):
        w8, w96 = results[kv, 8], results[kv, 96]
        slope = (w96 - w8) / (96 - 8)
        print(f"  {kv:8s}: cache-read cost at W=96 ~ {slope * 96:.3f}, "
              f"fixed per-step ~ {w8 - slope * 8:.3f}")
    print(f"  sampling adds ~ {t_sample:.3f}")


if __name__ == "__main__":
    main()
