"""Masked-read decode attention (Pallas, TPU) — batch-tiled flash-decode.

The XLA decode path reads the FULL KV-cache width every token and masks
positions > pos — at the HBM roofline that wasted read is the dominant
cost early in generation (PERF.md). This kernel makes the skip REAL at
the DMA level: the grid iterates (batch-tile, t-block) and the K/V
BlockSpec index map CLAMPS the t-block index to the last live block
(pos // TILE_T), so every grid step past the live region re-addresses
the block it already holds — Pallas elides the copy when consecutive
steps map to the same block, and the in-kernel `pl.when` skips the
compute. Average traffic scales with pos instead of the cache width.

Round-3 re-tiling (VERDICT r2 item 3): the original grid was
(B, t-block) — ONE batch row per grid step, so B=512 decode paid 512x
the per-grid-step overhead (~130 us on the dev tunnel) and measured 5x
SLOWER than XLA. Steps now process TILE_B=64 rows at once ((B/64,
t-block) grid — 64x fewer steps), stream K/V in their NATIVE dtype
(the old version materialized an f32 copy of the whole cache in HBM
every token), and the int8 cache format is supported directly: scale
streams ride two extra (TILE_B, tile_t, H) blocks, k-scales multiply
scores after the head-segment contraction and v-scales fold into the
probabilities before value expansion — the same exact-factoring
identity as ops/attention.decode_attention_quant.

Head layout trick: head_dim (16 for grande) is far below the 128-lane
width, so K/V blocks are processed as (TILE_B * tile_t, H*Dh) 2D tiles
and the per-head reductions run through a constant block-diagonal
head-segment selector S (H*Dh, H): scores = (q*K) @ S, and the weighted
value sum expands probabilities back with S^T.

Default remains OFF (TransformerConfig.decode_kernel="xla"): see
PERF.md for the same-process A/B on this dev runtime. Correctness is
pinned against the XLA path in interpret mode on CPU
(tests/test_pallas_decode.py) and compiled on TPU
(scripts/validate_pallas_decode.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 128
TILE_B = 64
_NEG_INF = -1e30


def _head_selector(h: int, dh: int) -> jnp.ndarray:
    cols = jax.lax.broadcasted_iota(jnp.int32, (h * dh, h), 0) // dh
    heads = jax.lax.broadcasted_iota(jnp.int32, (h * dh, h), 1)
    return (cols == heads).astype(jnp.float32)


def _kernel(
    pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref,
    m_ref, l_ref, acc_ref,
    *, h, dh, tile_t, n_blocks, tile_b, quantized,
):
    """Grid: (B/TILE_B, n_blocks). q/out: (tile_b, 1, H*Dh); k/v:
    (tile_b, tile_t, H*Dh) native dtype — the j-th t-block, index map
    clamped to the last live block; ks/vs: (tile_b, tile_t, H) scale
    blocks (int8 caches only). Flash-decode state (m, l, acc) lives in
    VMEM scratch and persists across the sequential t-block steps of
    one batch tile."""
    hd = h * dh
    pos = pos_ref[0]
    jblk = pl.program_id(1)

    @pl.when(jblk == 0)
    def _():
        m_ref[:] = jnp.full((tile_b, h), _NEG_INF, jnp.float32)
        l_ref[:] = jnp.zeros((tile_b, h), jnp.float32)
        acc_ref[:] = jnp.zeros((tile_b, hd), jnp.float32)

    @pl.when(jblk * tile_t <= pos)
    def _():
        seg = _head_selector(h, dh)
        q = q_ref[:, 0, :].astype(jnp.float32)  # (tile_b, hd)
        k = k_ref[:].astype(jnp.float32)  # (tile_b, tile_t, hd)
        v = v_ref[:].astype(jnp.float32)
        m, l, acc = m_ref[:], l_ref[:], acc_ref[:]
        # scores[b, s, h] = sum_dh q[b, h*dh+d] * k[b, s, h*dh+d]
        qk = (k * q[:, None, :]).reshape(tile_b * tile_t, hd)
        scores = jax.lax.dot_general(
            qk, seg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(tile_b, tile_t, h) * (1.0 / (dh ** 0.5))
        if quantized:
            scores = scores * ks_ref[:].astype(jnp.float32)
        s_ids = jblk * tile_t + jax.lax.broadcasted_iota(
            jnp.int32, (tile_t, h), 0
        )
        scores = jnp.where(s_ids[None] <= pos, scores, _NEG_INF)
        blk_max = jnp.max(scores, axis=1)  # (tile_b, h)
        new_m = jnp.maximum(m, blk_max)
        alpha = jnp.exp(m - new_m)
        p = jnp.exp(scores - new_m[:, None, :])  # (tile_b, tile_t, h)
        new_l = l * alpha + jnp.sum(p, axis=1)
        if quantized:
            # v-scales fold into the probabilities exactly:
            # sum_s p_s * (v8_s * vs_s) = sum_s (p_s * vs_s) * v8_s
            p = p * vs_ref[:].astype(jnp.float32)
        p_full = jax.lax.dot_general(
            p.reshape(tile_b * tile_t, h), seg.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(tile_b, tile_t, hd)
        contrib = jnp.sum(p_full * v, axis=1)  # (tile_b, hd)
        alpha_full = jax.lax.dot_general(
            alpha, seg.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tile_b, hd)
        m_ref[:] = new_m
        l_ref[:] = new_l
        acc_ref[:] = acc * alpha_full + contrib

    @pl.when(jblk == n_blocks - 1)
    def _():
        seg = _head_selector(h, dh)
        l_full = jax.lax.dot_general(
            l_ref[:], seg.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, 0, :] = acc_ref[:] / jnp.maximum(l_full, 1e-30)


def _pick_tile_b(b: int) -> Optional[int]:
    tb = TILE_B
    while tb > 1 and b % tb != 0:
        tb //= 2
    return tb if b % tb == 0 else None


def _decode_pallas(q1, k_cache, v_cache, k_scale, v_scale, pos, interpret):
    # CPU has no Mosaic backend: fall back to the interpreter so
    # decode_kernel="pallas" stays testable on the virtual CPU mesh
    interpret = interpret or jax.default_backend() == "cpu"
    b, t, h, dh = k_cache.shape
    quantized = k_scale is not None
    tile_b = _pick_tile_b(b)
    if (t % TILE_T != 0 and t % 8 != 0) or tile_b is None:
        # shapes incompatible with TPU tiling: degrade gracefully
        from coati_tpu.ops.attention import (
            decode_attention,
            decode_attention_quant,
        )

        if quantized:
            return decode_attention_quant(
                q1, k_cache, k_scale, v_cache, v_scale, pos
            )
        return decode_attention(q1, k_cache, v_cache, pos)
    tile_t = TILE_T if t % TILE_T == 0 else t
    n_blocks = t // tile_t
    hd = h * dh
    pos_arr = jnp.full((1,), pos, jnp.int32)
    q_flat = q1.astype(jnp.float32).reshape(b, 1, hd)
    k_flat = k_cache.reshape(b, t, hd)
    v_flat = v_cache.reshape(b, t, hd)
    if quantized:
        ks, vs = k_scale, v_scale
    else:
        # zero-size placeholders keep ONE kernel signature; Pallas
        # still wants rank-3 blocks, so give them a unit t extent
        ks = jnp.zeros((b, 1, h), jnp.float32)
        vs = jnp.zeros((b, 1, h), jnp.float32)

    def kv_index(i, j, pos_ref):
        # clamp dead blocks to the last live one: consecutive grid steps
        # that address the same block skip the DMA, so reads stop at pos
        return (i, jnp.minimum(j, pos_ref[0] // tile_t), 0)

    def scale_index(i, j, pos_ref):
        if quantized:
            return kv_index(i, j, pos_ref)
        return (i, 0, 0)

    scale_block = (tile_b, tile_t if quantized else 1, h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // tile_b, n_blocks),
        in_specs=[
            pl.BlockSpec((tile_b, 1, hd), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((tile_b, tile_t, hd), kv_index),
            pl.BlockSpec((tile_b, tile_t, hd), kv_index),
            pl.BlockSpec(scale_block, scale_index),
            pl.BlockSpec(scale_block, scale_index),
        ],
        out_specs=pl.BlockSpec((tile_b, 1, hd), lambda i, j, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((tile_b, h), jnp.float32),  # running max
            pltpu.VMEM((tile_b, h), jnp.float32),  # running denom
            pltpu.VMEM((tile_b, hd), jnp.float32),  # running numerator
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, h=h, dh=dh, tile_t=tile_t, n_blocks=n_blocks,
            tile_b=tile_b, quantized=quantized,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, hd), jnp.float32),
        interpret=interpret,
    )(pos_arr, q_flat, k_flat, v_flat, ks, vs)
    return out.reshape(b, h, dh).astype(q1.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_pallas(
    q1: jnp.ndarray,  # (B, H, Dh)
    k_cache: jnp.ndarray,  # (B, T, H, Dh) — compute dtype
    v_cache: jnp.ndarray,
    pos: jnp.ndarray,  # scalar int32
    interpret: bool = False,
) -> jnp.ndarray:
    return _decode_pallas(q1, k_cache, v_cache, None, None, pos, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_pallas_quant(
    q1: jnp.ndarray,  # (B, H, Dh)
    k_cache: jnp.ndarray,  # (B, T, H, Dh) int8
    k_scale: jnp.ndarray,  # (B, T, H) f32/bf16
    v_cache: jnp.ndarray,
    v_scale: jnp.ndarray,
    pos: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Masked-read decode over the PRODUCTION int8 cache format
    (data + per-(token, head) scales), semantics identical to
    ops/attention.decode_attention_quant."""
    return _decode_pallas(
        q1, k_cache, v_cache,
        k_scale.astype(jnp.float32), v_scale.astype(jnp.float32),
        pos, interpret,
    )
