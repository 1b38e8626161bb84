"""Fused causal multi-head attention over a full sequence (prefill).

Computes the same attention as `coati_tpu.ops.attention.causal_attention`
(reference semantics: basic_transformer.py:126-154 — 1/sqrt(Dh) scaled
scores, causal mask, softmax, probs @ v) in ONE Pallas kernel that never
materializes the (B, H, T, T) probs tensor in HBM.

Where it pays (TPU v5e, in-jit x8, PERF.md "prefill attention"):
  * T=96 (grande train/bench seq): NEUTRAL — the layer is MXU-pass-bound
    on per-(molecule, head) (96, 96) score tiles at Dh=16, a cost no
    memory layout removes, and the bf16 probs round trip is only ~2 ms
    of ~5.5. XLA stays the default at short T.
  * T=256 (full-length n_seq 250 paths: embed at max length,
    batch_smiles_to_s2s_likelihood): -35% (10.00 -> 6.52 ms/layer at
    B=512) — the probs tensor has grown 8.5x into traffic-bound
    territory while pass count only doubled. Auto-selected here
    (TransformerConfig.prefill_kernel="auto", threshold T >= 192).

Design (the egnn_messages recipe — this dev runtime penalizes
many-step grids, so keep the grid 1-D over batch blocks and loop
in-kernel): grid=(B/TILE_B,); each step loads (TILE_B, T, C) q/k/v
blocks into VMEM and statically unrolls the H heads; per head a
TB-batched dot_general computes scores, f32 softmax runs in VMEM, and
a second batched dot_general applies probs @ v. Lane-dim head slices
use compile-time offsets (h * Dh), satisfying Mosaic's constraint.

Differentiation: a custom VJP backs the kernel with the XLA reference
formulation — the forward saves (q, k, v) and the backward replays
`causal_attention` under jax.vjp. Correct everywhere (incl. under
jax.checkpoint), but it re-pays the XLA forward, so fwd+grad through
the kernel is strictly SLOWER than pure XLA; every training config
therefore pins prefill_kernel="xla" (train.py
model_config_from_train_config, train_coati2.py model_config,
finetune.py make_lora_ar_step) and "auto" is an inference default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coati_tpu.ops.pallas.common import on_tpu, pad_to

# VMEM budget for picking TILE_B (bytes). The dev tunnel's Mosaic
# accepts raised scoped-vmem limits; keep comfortably under it.
_VMEM_LIMIT = 96 * 1024 * 1024
_VMEM_BUDGET = 64 * 1024 * 1024


def _pick_tile_b(t: int, c: int, bytes_per_el: int) -> int:
    """Largest power-of-two batch tile (capped at 4) whose VMEM
    footprint fits the budget: 4 streams (q, k, v, o) of (tb, T, C)
    plus the per-head f32 score/prob temporaries (~4 copies of
    (tb, T, T) across the mask/exp chain). Cap: at T=256 tb=4 measured
    fastest (6.52 ms vs 6.69 at tb=16) AND compiles 10x quicker
    (the head unroll body scales with tb)."""
    tb = 4
    while tb > 1:
        streams = 4 * tb * t * c * bytes_per_el
        temps = 4 * tb * t * t * 4
        if streams + temps <= _VMEM_BUDGET:
            return tb
        tb //= 2
    return 1


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, h, dh, tile_b):
    """Blocks: (tile_b, Tp, C). Static head unroll; TB-batched dots."""
    t = q_ref.shape[1]
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    scale = 1.0 / np.sqrt(dh)
    row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    causal = row >= col  # key padding sits past every real query: masked
    outs = []
    for i in range(h):
        qh = q[:, :, i * dh:(i + 1) * dh]  # compile-time lane offsets
        kh = k[:, :, i * dh:(i + 1) * dh]
        vh = v[:, :, i * dh:(i + 1) * dh]
        scores = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (tile_b, t, t)
        scores = jnp.where(causal[None], scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(
            jax.lax.dot_general(
                p.astype(v.dtype), vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    o_ref[:] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _flash_forward(q, k, v, interpret=False):
    # CPU has no Mosaic backend: fall back to the interpreter so
    # prefill_kernel="pallas" stays testable on the virtual CPU mesh
    interpret = interpret or jax.default_backend() == "cpu"
    b, t, h, dh = q.shape
    c = h * dh
    # pad T to the bf16 sublane tile (16 also satisfies f32's 8); the
    # zero rows are causally masked as keys and sliced off as queries
    tp = ((t + 15) // 16) * 16
    qf = pad_to(q.reshape(b, t, c), tp, 1)
    kf = pad_to(k.reshape(b, t, c), tp, 1)
    vf = pad_to(v.reshape(b, t, c), tp, 1)
    tile_b = _pick_tile_b(tp, c, qf.dtype.itemsize)
    bp = ((b + tile_b - 1) // tile_b) * tile_b
    qf = pad_to(qf, bp, 0)
    kf = pad_to(kf, bp, 0)
    vf = pad_to(vf, bp, 0)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, h=h, dh=dh, tile_b=tile_b),
        grid=(bp // tile_b,),
        in_specs=[
            pl.BlockSpec(
                (tile_b, tp, c), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ] * 3,
        out_specs=pl.BlockSpec(
            (tile_b, tp, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, tp, c), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:b, :t].reshape(b, t, h, dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_causal_attention(q, k, v, interpret=False):
    """q, k, v: (B, T, H, Dh) -> (B, T, H, Dh), causal.

    Requires H * Dh % 128 == 0 (lane tiling); any T and B (padded
    internally). Softmax always runs in f32 inside VMEM — at least as
    accurate as either XLA softmax_dtype path."""
    return _flash_forward(q, k, v, interpret)


def _fwd(q, k, v, interpret):
    return _flash_forward(q, k, v, interpret), (q, k, v)


def _bwd(interpret, res, g):
    # XLA-reference backward: replay causal_attention under jax.vjp.
    # Numerically this is the f32-softmax XLA path's gradient; the
    # kernel's forward is the same math, so the pairing is consistent.
    from coati_tpu.ops.attention import causal_attention

    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: causal_attention(q, k, v, None, jnp.float32), q, k, v
    )
    return vjp(g.astype(q.dtype))


flash_causal_attention.defvjp(_fwd, _bwd)


def flash_supported(t: int, h: int, dh: int) -> bool:
    """Shapes the kernel accepts AND where it measured a win: lane-full
    channel dim, sequence past the traffic-bound threshold."""
    return (h * dh) % 128 == 0 and t >= 192
