"""Masked-read decode attention (Pallas, TPU).

The XLA decode path reads the FULL KV-cache width every token and masks
positions > pos — at the HBM roofline that wasted read is the dominant
cost early in generation (PERF.md). This kernel keeps the cache in
HBM/ANY memory space and DMAs only the blocks with position <= pos into
VMEM, accumulating flash-decode style (online softmax across blocks):
average traffic drops ~2x for full-length generations and far more for
early-stopping molecules.

Head layout trick: head_dim (16 for grande) is far below the 128-lane
width, so K/V blocks are processed as (TILE_T, H*Dh) 2D tiles and the
per-head reductions run on the MXU through a constant block-diagonal
head-segment selector S (H*Dh, H): scores = (q*K) @ S, and the weighted
value sum expands probabilities back with S^T.

Gated OFF by default (TransformerConfig.decode_kernel="xla"): the dev
tunnel penalizes Pallas grid steps ~130 us, swamping the saving; enable
on production TPUs. Correctness is pinned against the XLA path in
interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 128
_NEG_INF = -1e30


def _kernel(pos_ref, q_ref, k_ref, v_ref, out_ref, seg_ref, *, h, dh):
    """Grid: (B,). q: (1, H*Dh) VMEM; k/v: (1, T, H*Dh) VMEM flattened on
    the host (Mosaic cannot merge the trailing (H, Dh) dims in-kernel);
    out: (1, H*Dh)."""
    t_max = k_ref.shape[1]
    hd = h * dh
    pos = pos_ref[0]
    tile_t = TILE_T if t_max % TILE_T == 0 else t_max
    n_blocks = t_max // tile_t

    q = q_ref[0]  # (1, H*Dh)
    seg = seg_ref[:]  # (H*Dh, H) block-diagonal head selector

    def body(jblk, carry):
        m, l, acc = carry

        def compute(carry):
            m, l, acc = carry
            k = k_ref[0, pl.ds(jblk * tile_t, tile_t), :]
            v = v_ref[0, pl.ds(jblk * tile_t, tile_t), :]
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
            p = jnp.exp(scores - new_m[None, :])  # (TILE_T, H)
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
            new_acc = acc * alpha_full + contrib
            return new_m, new_l, new_acc

        return jax.lax.cond(
            jblk * tile_t <= pos, compute, lambda c: c, carry
        )

    m0 = jnp.full((h,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((h,), jnp.float32)
    acc0 = jnp.zeros((hd,), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    l_full = jnp.dot(l[None, :], seg.T)[0]
    out_ref[0, 0] = acc / jnp.maximum(l_full, 1e-30)


def _head_selector(h: int, dh: int) -> jnp.ndarray:
    cols = jnp.arange(h * dh) // dh
    return (cols[:, None] == jnp.arange(h)[None, :]).astype(jnp.float32)


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
    hd = h * dh
    pos_arr = jnp.full((1,), pos, jnp.int32)
    q_flat = q1.astype(jnp.float32).reshape(b, 1, hd)
    k_flat = k_cache.astype(jnp.float32).reshape(b, t, hd)
    v_flat = v_cache.astype(jnp.float32).reshape(b, t, hd)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, hd), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, t, hd), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, t, hd), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, hd), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((hd, h), jnp.float32)],
    )

    def kernel(pos_ref, q_ref, k_ref, v_ref, out_ref, seg_scratch):
        seg_scratch[:] = _head_selector(h, dh)
        _kernel(pos_ref, q_ref, k_ref, v_ref, out_ref, seg_scratch, h=h, dh=dh)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, hd), jnp.float32),
        interpret=interpret,
    )(pos_arr, q_flat, k_flat, v_flat)
    return out.reshape(b, h, dh).astype(q1.dtype)
