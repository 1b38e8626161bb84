"""Causal multi-head attention.

Two entry points:
  * `causal_attention(q, k, v)` — full-sequence causal attention for
    training/encoding. Shapes (B, T, H, Dh). XLA fuses this pattern well
    at COATI sequence lengths (T <= 250); a Pallas flash-attention kernel
    is available for TPU via `coati_tpu.ops.pallas.flash_attention` and
    selected automatically for long sequences.
  * `decode_attention(q1, k_cache, v_cache, pos)` — single-position
    attention against a KV cache for the autoregressive sampler.

Numerics: scores scaled by 1/sqrt(Dh), softmax in float32, additive -inf
causal mask (matches coati/models/encoding/basic_transformer.py:126-154).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_NEG_INF = -1e30  # large-negative instead of -inf: keeps softmax NaN-free
# for fully-masked (padding) rows, matching torch masked_fill + softmax
# behavior closely enough (torch yields uniform attn over -inf rows only
# when ALL entries are -inf, which cannot happen causally at t>=0).


def causal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    precision: Optional[jax.lax.Precision] = None,
    softmax_dtype=jnp.float32,
) -> jnp.ndarray:
    """q, k, v: (B, T, H, Dh) -> (B, T, H, Dh), causal.

    softmax_dtype=float32 (default) upcasts scores for an exact softmax
    (oracle parity). Passing the compute dtype (bf16) keeps the whole
    (B,H,T,T) probs tensor — and, in training, its scan-saved backward
    residual — in bf16: ~0.4% prob error, -16% trunk fwd+grad
    (TransformerConfig.softmax_dtype="compute"; jax.nn.softmax still
    subtracts the row max, so bf16 exp stays in range)."""
    _, t, _, dh = q.shape
    scores = jnp.einsum("bthd,bshd->bhts", q, k, precision=precision)
    scale = jnp.asarray(1.0 / np.sqrt(dh), softmax_dtype)
    scores = scores.astype(softmax_dtype) * scale
    causal = jnp.tril(jnp.ones((t, t), dtype=bool))
    neg = jnp.asarray(
        _NEG_INF if softmax_dtype == jnp.float32 else -1e4, softmax_dtype
    )
    scores = jnp.where(causal[None, None, :, :], scores, neg)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v, precision=precision)


def decode_attention_quant(
    q1: jnp.ndarray,
    k_data: jnp.ndarray,  # (B, T, H, Dh) int8
    k_scale: jnp.ndarray,  # (B, T, H) f32
    v_data: jnp.ndarray,
    v_scale: jnp.ndarray,
    pos: jnp.ndarray,
) -> jnp.ndarray:
    """decode_attention over an int8-quantized cache. Per-token-per-head
    scales factor out of both contractions exactly:
        q . (k8 * ks) = (q . k8) * ks        (scores)
        sum_s p_s * (v8_s * vs_s) = sum_s (p_s * vs_s) * v8_s   (output)
    so the int8 tensors feed the MXU directly and only (B, T, H) scale
    vectors are read in fp32."""
    dh = q1.shape[-1]
    t_max = k_data.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum(
        "bhd,bshd->bhs", q1.astype(jnp.float32), k_data.astype(jnp.float32)
    )
    scores = scores * jnp.transpose(k_scale, (0, 2, 1)) * scale
    valid = jnp.arange(t_max) <= pos
    scores = jnp.where(valid[None, None, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * jnp.transpose(v_scale, (0, 2, 1))
    return jnp.einsum("bhs,bshd->bhd", probs, v_data.astype(jnp.float32)).astype(
        q1.dtype
    )


def decode_attention_ragged(
    q1: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    pos: jnp.ndarray,  # (B,) int32 — PER-ROW positions
    precision: Optional[jax.lax.Precision] = None,
) -> jnp.ndarray:
    """decode_attention with per-row positions: row b attends over
    [0, pos[b]]. Backbone of the continuous-batching decode engine
    (serving/continuous.py), where co-batched sequences sit at
    different generation depths. Same math as decode_attention when
    pos is constant across rows (tested)."""
    dh = q1.shape[-1]
    t_max = k_cache.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum("bhd,bshd->bhs", q1, k_cache, precision=precision)
    scores = scores.astype(jnp.float32) * scale
    valid = jnp.arange(t_max)[None, :] <= pos[:, None]  # (B, T)
    scores = jnp.where(valid[:, None, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
    return jnp.einsum("bhs,bshd->bhd", probs, v_cache, precision=precision)


def decode_attention_quant_ragged(
    q1: jnp.ndarray,
    k_data: jnp.ndarray,  # (B, T, H, Dh) int8
    k_scale: jnp.ndarray,  # (B, T, H)
    v_data: jnp.ndarray,
    v_scale: jnp.ndarray,
    pos: jnp.ndarray,  # (B,) int32 — PER-ROW positions
) -> jnp.ndarray:
    """decode_attention_quant with per-row positions (see
    decode_attention_ragged); scales factor out exactly as in the
    scalar-pos version."""
    dh = q1.shape[-1]
    t_max = k_data.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum(
        "bhd,bshd->bhs", q1.astype(jnp.float32), k_data.astype(jnp.float32)
    )
    scores = scores * jnp.transpose(k_scale, (0, 2, 1)).astype(jnp.float32)
    scores = scores * scale
    valid = jnp.arange(t_max)[None, :] <= pos[:, None]
    scores = jnp.where(valid[:, None, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * jnp.transpose(v_scale, (0, 2, 1)).astype(jnp.float32)
    return jnp.einsum(
        "bhs,bshd->bhd", probs, v_data.astype(jnp.float32)
    ).astype(q1.dtype)


def _ring_valid(ring_pos, lpos, t_max):
    """(B, T) mask of live ring slots: slot s holds the key of AGE
    (ring_pos - s) mod T; row b's history spans ages [0, lpos[b]]."""
    ages = jnp.mod(ring_pos - jnp.arange(t_max), t_max)  # (T,)
    return ages[None, :] <= lpos[:, None]


def decode_attention_ring(
    q1: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    ring_pos: jnp.ndarray,  # scalar int32 — slot just written (age 0)
    lpos: jnp.ndarray,  # (B,) int32 — current token's LOGICAL position
    precision: Optional[jax.lax.Precision] = None,
) -> jnp.ndarray:
    """Ring-buffer decode attention for the continuous-batching engine
    (serving/continuous.py): every row writes at the SAME ring slot per
    step (so the cache update stays a scalar-position
    dynamic_update_slice — the XLA in-place fast path), and per-row
    history is selected by AGE arithmetic: slot s holds the key of age
    (ring_pos - s) mod T, row b attends ages [0, lpos[b]]. Equals
    decode_attention when the ring hasn't wrapped and positions are
    uniform (tested). Requires max history < T (the engine sizes the
    ring with a segment of slack)."""
    dh = q1.shape[-1]
    t_max = k_cache.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum("bhd,bshd->bhs", q1, k_cache, precision=precision)
    scores = scores.astype(jnp.float32) * scale
    valid = _ring_valid(ring_pos, lpos, t_max)
    scores = jnp.where(valid[:, None, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
    return jnp.einsum("bhs,bshd->bhd", probs, v_cache, precision=precision)


def decode_attention_quant_ring(
    q1: jnp.ndarray,
    k_data: jnp.ndarray,  # (B, T, H, Dh) int8
    k_scale: jnp.ndarray,  # (B, T, H)
    v_data: jnp.ndarray,
    v_scale: jnp.ndarray,
    ring_pos: jnp.ndarray,  # scalar
    lpos: jnp.ndarray,  # (B,)
) -> jnp.ndarray:
    """decode_attention_quant over a ring cache (see
    decode_attention_ring); scales factor out exactly as in the
    linear-position version."""
    dh = q1.shape[-1]
    t_max = k_data.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum(
        "bhd,bshd->bhs", q1.astype(jnp.float32), k_data.astype(jnp.float32)
    )
    scores = scores * jnp.transpose(k_scale, (0, 2, 1)).astype(jnp.float32)
    scores = scores * scale
    valid = _ring_valid(ring_pos, lpos, t_max)
    scores = jnp.where(valid[:, None, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * jnp.transpose(v_scale, (0, 2, 1)).astype(jnp.float32)
    return jnp.einsum(
        "bhs,bshd->bhd", probs, v_data.astype(jnp.float32)
    ).astype(q1.dtype)


def decode_attention(
    q1: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    pos: jnp.ndarray,
    precision: Optional[jax.lax.Precision] = None,
) -> jnp.ndarray:
    """Attend a single query position against the cache.

    q1: (B, H, Dh) — query at position `pos`.
    k_cache, v_cache: (B, Tmax, H, Dh) — positions > pos are garbage and
      masked out via the position mask.
    pos: scalar int32 — current position (attends over [0, pos]).
    Returns (B, H, Dh).
    """
    dh = q1.shape[-1]
    t_max = k_cache.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum("bhd,bshd->bhs", q1, k_cache, precision=precision)
    scores = scores.astype(jnp.float32) * scale
    valid = jnp.arange(t_max) <= pos
    scores = jnp.where(valid[None, None, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
    return jnp.einsum("bhs,bshd->bhd", probs, v_cache, precision=precision)
