"""Prefill (full-sequence) attention formulations at bench shapes.

The fused round trip's encode pass runs at ~31% MFU (PERF.md round-2
reconciliation); the trunk MLP matmuls account for ~24 ms of the 77 ms,
so ~50 ms is attention + elementwise. This bench isolates ONE layer's
attention at B=1024 H=16 Dh=16 T=96 (grande bench shapes) and compares
formulations XLA might lay out differently:

  einsum-bhts     the production causal_attention (ops/attention.py)
  merged-batch    (B*H, T, Dh) batched matmul form
  f32-probs       softmax_dtype=f32 (the parity path)
  qk-only         scores einsum alone (no softmax/pv) — locates traffic
  pv-only         probs@v einsum alone on a precomputed probs

Method: in-jit x8 chained with data dependence (CLAUDE.md).
Knobs: PF_B / PF_T / PF_H / PF_DH / PF_ITERS.
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

from coati_tpu.ops.attention import causal_attention

B = int(os.environ.get("PF_B", 1024))
T = int(os.environ.get("PF_T", 96))
H = int(os.environ.get("PF_H", 16))
DH = int(os.environ.get("PF_DH", 16))
ITERS = int(os.environ.get("PF_ITERS", 8))
DTYPE = jnp.bfloat16


def timed(name, fn, *args):
    def looped(first, *rest):
        def body(i, carry):
            s, q = carry
            r = fn(q, *rest)
            rs = jnp.sum(r.astype(jnp.float32))
            # data dependence via a scalar nudge (output and input may
            # have different shapes, so chaining q + r is not general)
            return s + rs, q * (1.0 + 1e-30 * rs).astype(q.dtype)

        s, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), first))
        return s

    # first positional arg doubles as the loop-varying input
    j = jax.jit(lambda *a: looped(*a))
    np.asarray(j(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(j(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1000
    print(f"{name:24s}: {ms:7.2f} ms/iter")
    return ms


def main():
    print(f"device: {jax.devices()[0]}, B={B} T={T} H={H} Dh={DH} {DTYPE.__name__}")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, T, H, DH), DTYPE)
    k = jax.random.normal(ks[1], (B, T, H, DH), DTYPE)
    v = jax.random.normal(ks[2], (B, T, H, DH), DTYPE)

    timed(
        "einsum-bhts bf16probs",
        lambda q, k, v: causal_attention(q, k, v, softmax_dtype=DTYPE),
        q, k, v,
    )
    timed(
        "einsum-bhts f32probs",
        lambda q, k, v: causal_attention(q, k, v, softmax_dtype=jnp.float32),
        q, k, v,
    )

    causal = jnp.tril(jnp.ones((T, T), dtype=bool))

    def merged(q, k, v):
        qm = q.transpose(0, 2, 1, 3).reshape(B * H, T, DH)
        km = k.transpose(0, 2, 1, 3).reshape(B * H, T, DH)
        vm = v.transpose(0, 2, 1, 3).reshape(B * H, T, DH)
        scores = jnp.einsum("ntd,nsd->nts", qm, km) * (1.0 / np.sqrt(DH))
        scores = jnp.where(causal[None], scores, jnp.asarray(-1e4, scores.dtype))
        probs = jax.nn.softmax(scores, axis=-1).astype(vm.dtype)
        out = jnp.einsum("nts,nsd->ntd", probs, vm)
        return out.reshape(B, H, T, DH).transpose(0, 2, 1, 3)

    timed("merged-batch bf16", merged, q, k, v)

    from coati_tpu.ops.pallas.flash_attention import flash_causal_attention
    from coati_tpu.ops.pallas.packed_attention import (
        packed_causal_attention,
        packed_supported,
    )

    if (H * DH) % 128 == 0:
        timed("flash-pallas", flash_causal_attention, q, k, v)
    if packed_supported(T, H, DH):
        timed("packed-pallas", packed_causal_attention, q, k, v)

    def qk_only(q, k):
        return jnp.einsum("bthd,bshd->bhts", q, k)

    timed("qk-only", qk_only, q, k)

    probs = jax.nn.softmax(
        jnp.where(
            causal[None, None],
            jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
            / np.sqrt(DH),
            -1e30,
        ),
        axis=-1,
    ).astype(DTYPE)

    def pv_only(probs, v):
        return jnp.einsum("bhts,bshd->bthd", probs, v)

    timed("pv-only", pv_only, probs, v)

    # roofline context
    flops = 2 * 2 * B * T * T * H * DH  # qk + pv
    probs_mb = B * H * T * T * 2 / 1e6
    print(f"\nuseful attention flops: {flops / 1e9:.1f} GF "
          f"(0.19 ms at the 103 TF/s ceiling); probs tensor {probs_mb:.0f} MB "
          f"({2 * probs_mb / 1000 / 0.3:.1f} ms to write+read at 300 GB/s)")


if __name__ == "__main__":
    main()
