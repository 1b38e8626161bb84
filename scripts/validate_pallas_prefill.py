"""Compiled-kernel validation + A/B of the fused prefill attention
(ops/pallas/flash_attention.py) on real TPU.

1. parity of the compiled kernel vs the XLA path at full-length shapes
   (bf16 and f32);
2. trunk-level A/B: forward_hidden at T=250 with prefill_kernel xla vs
   pallas (in-jit x8 chained, CLAUDE.md method).

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/validate_pallas_prefill.py
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
    forward_hidden,
    init_transformer,
)
from coati_tpu.ops.attention import causal_attention
from coati_tpu.ops.pallas.flash_attention import flash_causal_attention

B = int(os.environ.get("PF_B", 512))
T = int(os.environ.get("PF_T", 250))
ITERS = 8


def main():
    print(f"backend: {jax.default_backend()}, B={B} T={T}")
    for dtype in (jnp.float32, jnp.bfloat16):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(kk, (8, T, 16, 16), dtype) for kk in ks)
        ref = np.asarray(causal_attention(q, k, v, None, jnp.float32).astype(jnp.float32))
        out = np.asarray(jax.jit(flash_causal_attention)(q, k, v).astype(jnp.float32))
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"parity {dtype.__name__}: max rel diff {rel:.2e}")

    cfg = TransformerConfig(
        n_layer=16, n_embd=256, n_head=16, n_seq=T, n_tok=512,
        dtype="bfloat16", softmax_dtype="compute",
    )
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 512)

    def timed(name, c):
        def looped(tk):
            def body(i, carry):
                s, tk = carry
                h = forward_hidden(params, c, tk)
                return s + jnp.sum(h.astype(jnp.float32)), jnp.roll(tk, 1, 0)

            s, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), tk))
            return s

        j = jax.jit(looped)
        t0 = time.perf_counter()
        np.asarray(j(tokens))
        print(f"  ({name} compile+1st {time.perf_counter() - t0:.0f}s)")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(j(tokens))
            best = min(best, time.perf_counter() - t0)
        print(f"trunk fwd T={T} {name:8s}: {best / ITERS * 1000:7.2f} ms")
        return best

    x = timed("xla", cfg.replace(prefill_kernel="xla"))
    p = timed("pallas", cfg.replace(prefill_kernel="pallas"))
    print(f"pallas/xla: {p / x:.3f}x")


if __name__ == "__main__":
    main()
