"""Masked-read decode attention (Pallas, TPU).

The XLA decode path reads the FULL KV-cache width every token and masks
positions > pos — at the HBM roofline that wasted read is the dominant
cost early in generation (PERF.md). This kernel makes the skip REAL at
the DMA level: the grid iterates (batch, t-block) and the K/V BlockSpec
index map CLAMPS the t-block index to the last live block
(pos // TILE_T), so every grid step past the live region re-addresses
the block it already holds — Pallas elides the copy when consecutive
steps map to the same block, and the in-kernel `pl.when` skips the
compute. Average traffic scales with pos instead of the cache width
(~2x for full-length generations, far more for early-stopping
molecules). Flash-decode online softmax accumulates across t-blocks in
VMEM scratch that persists over the sequential TPU grid.

Head layout trick: head_dim (16 for grande) is far below the 128-lane
width, so K/V blocks are processed as (TILE_T, H*Dh) 2D tiles and the
per-head reductions run on the MXU through a constant block-diagonal
head-segment selector S (H*Dh, H): scores = (q*K) @ S, and the weighted
value sum expands probabilities back with S^T.

Gated OFF by default (TransformerConfig.decode_kernel="xla"): the dev
tunnel penalizes Pallas grid steps ~130 us, swamping the saving; enable
on production TPUs. Supports non-quantized caches only (the int8 cache
path has its own scale stream; decode_step rejects the combination).
Correctness is pinned against the XLA path in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 128
_NEG_INF = -1e30


def _kernel(
    pos_ref, q_ref, k_ref, v_ref, out_ref,
    seg_ref, m_ref, l_ref, acc_ref,
    *, h, dh, tile_t, n_blocks,
):
    """Grid: (B, n_blocks). q/out: (1, 1, H*Dh) VMEM; k/v: (1, tile_t,
    H*Dh) — the j-th t-block, with the index map clamped to the last
    live block. Flash-decode state (m, l, acc) lives in VMEM scratch and
    persists across the sequential grid steps of one batch row."""
    hd = h * dh
    pos = pos_ref[0]
    jblk = pl.program_id(1)

    @pl.when(jblk == 0)
    def _():
        seg_ref[:] = _head_selector(h, dh)
        m_ref[0] = jnp.full((h,), _NEG_INF, jnp.float32)
        l_ref[0] = jnp.zeros((h,), jnp.float32)
        acc_ref[0] = jnp.zeros((hd,), jnp.float32)

    @pl.when(jblk * tile_t <= pos)
    def _():
        q = q_ref[0]  # (1, H*Dh)
        seg = seg_ref[:]
        m, l, acc = m_ref[0], l_ref[0], acc_ref[0]
        k = k_ref[0]  # (tile_t, H*Dh)
        v = v_ref[0]
        # scores[s, h] = sum_dh q[h,dh] * k[s,h,dh]
        scores = jax.lax.dot_general(
            k * q, seg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) / (dh ** 0.5)
        s_ids = jblk * tile_t + jax.lax.broadcasted_iota(
            jnp.int32, (tile_t, h), 0
        )
        scores = jnp.where(s_ids <= pos, scores, _NEG_INF)
        blk_max = jnp.max(scores, axis=0)  # (H,)
        new_m = jnp.maximum(m, blk_max)
        alpha = jnp.exp(m - new_m)  # (H,)
        p = jnp.exp(scores - new_m[None, :])  # (tile_t, H)
        new_l = l * alpha + jnp.sum(p, axis=0)
        # weighted value sum: expand p back over head segments
        p_full = jax.lax.dot_general(
            p, seg.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        contrib = jnp.sum(p_full * v, axis=0)  # (H*Dh,)
        alpha_full = jnp.dot(alpha[None, :], seg.T)[0]  # (H*Dh,)
        m_ref[0] = new_m
        l_ref[0] = new_l
        acc_ref[0] = acc * alpha_full + contrib

    @pl.when(jblk == n_blocks - 1)
    def _():
        seg = seg_ref[:]
        l_full = jnp.dot(l_ref[0][None, :], seg.T)[0]
        out_ref[0, 0] = acc_ref[0] / jnp.maximum(l_full, 1e-30)


def _head_selector(h: int, dh: int) -> jnp.ndarray:
    cols = jax.lax.broadcasted_iota(jnp.int32, (h * dh, h), 0) // dh
    heads = jax.lax.broadcasted_iota(jnp.int32, (h * dh, h), 1)
    return (cols == heads).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_pallas(
    q1: jnp.ndarray,  # (B, H, Dh)
    k_cache: jnp.ndarray,  # (B, T, H, Dh)
    v_cache: jnp.ndarray,
    pos: jnp.ndarray,  # scalar int32
    interpret: bool = False,
) -> jnp.ndarray:
    b, t, h, dh = k_cache.shape
    if t % TILE_T != 0 and t % 8 != 0:
        # width incompatible with TPU sublane tiling: degrade gracefully
        from coati_tpu.ops.attention import decode_attention

        return decode_attention(q1, k_cache, v_cache, pos)
    tile_t = TILE_T if t % TILE_T == 0 else t
    n_blocks = t // tile_t
    hd = h * dh
    pos_arr = jnp.full((1,), pos, jnp.int32)
    q_flat = q1.astype(jnp.float32).reshape(b, 1, hd)
    k_flat = k_cache.astype(jnp.float32).reshape(b, t, hd)
    v_flat = v_cache.astype(jnp.float32).reshape(b, t, hd)

    def kv_index(i, j, pos_ref):
        # clamp dead blocks to the last live one: consecutive grid steps
        # that address the same block skip the DMA, so reads stop at pos
        return (i, jnp.minimum(j, pos_ref[0] // tile_t), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, hd), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, tile_t, hd), kv_index),
            pl.BlockSpec((1, tile_t, hd), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, hd), lambda i, j, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hd, h), jnp.float32),  # head selector
            pltpu.VMEM((1, h), jnp.float32),  # running max
            pltpu.VMEM((1, h), jnp.float32),  # running denom
            pltpu.VMEM((1, hd), jnp.float32),  # running numerator
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, h=h, dh=dh, tile_t=tile_t, n_blocks=n_blocks
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, hd), jnp.float32),
        interpret=interpret,
    )(pos_arr, q_flat, k_flat, v_flat)
    return out.reshape(b, h, dh).astype(q1.dtype)
