"""Head-packed causal attention for short sequences (T <= 128).

At the reference geometry (Dh=16, H=16 -> C=256; smiles_xformer.py:84
n_embd/n_head, block math basic_transformer.py:126-154) full-sequence
attention at T<=96 is MXU-PASS-bound, not FLOP- or traffic-bound: every
formulation XLA or the flash kernel can express issues B*H score matmuls
of shape (T, Dh)@(Dh, T) — 16,384 passes per layer-matmul at B=1024 —
each a single 128x128 output tile using only 16 of the 128-deep
contraction and 96/128 of each output edge (PERF.md "prefill attention
investigation": 5.3-5.9 ms/layer in every such formulation).

This kernel restructures the matmuls instead of the memory: pack all H
heads into ONE dense contraction per molecule via block-diagonal K/V,

    scores[b, i, h*Tk + j] = sum_c q[b, i, c] * k_bd[b, h*Tk + j, c]

where k_bd zeroes every channel outside head h's dh-slice, so the full
C=256-wide rows of q contract against masked keys and the per-head
scores come out SEPARATED along the lane axis — the "16 heads x dh 16 =
one 256-wide layout" that per-head einsums cannot reach. The score
matmul becomes (T, C) @ (C, H*Tk) and the PV matmul (T, H*Tk) @
(H*Tk, C): full 256-deep MXU passes with 128-aligned tiles. The packing
does H-fold redundant FLOPs (zeros in the dead blocks), but at these
shapes trading 16x FLOPs for full passes is ~2x faster wall-clock —
the MXU runs dense work at ~100 TF/s while depth-16 passes deliver ~4.

Keys are padded to Tk=128 rows per head so every head block sits on a
lane-tile boundary: the block-diagonal build is then a pure sublane
broadcast + static mask (no lane relayouts), and the per-head softmax
is a clean (.., H, 128) lane split. Padded key rows are causally dead
(masked to -1e30). All VMEM-resident; the (B, H, T, T) probs tensor
never exists in HBM (it exists nowhere: probs live as (tb, T, H*128)
lane-packed tiles).

Scope: T <= 128 and C % 128 == 0. Complements flash_attention.py
(which wins only at T >= 192 where traffic dominates) — between them
every COATI sequence length has a fused option. Softmax always runs in
f32 in VMEM. Differentiation: custom VJP backed by a PACKED PALLAS
backward kernel (_packed_bwd_kernel below — 4 more dense lane-packed
matmuls, recomputing probs from the saved q/k/v), so fwd+grad through
this path beats XLA too and the kernel is safe for training configs,
including under jax.checkpoint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coati_tpu.ops.pallas.common import on_tpu, pad_to

_VMEM_LIMIT = 100 * 1024 * 1024
_VMEM_BUDGET = 72 * 1024 * 1024
_TK = 128  # per-head key stride (lane-tile aligned)


def _pick_tile_b(tq: int, c: int, h: int, bytes_per_el: int) -> int:
    """Largest batch tile whose VMEM footprint fits: q/k/v/o streams,
    the two (N, C) block-diagonal builds, and ~3 f32 (tq, N)
    score/prob temporaries across the softmax chain."""
    n = h * _TK
    tb = 16
    while tb > 1:
        streams = tb * (3 * _TK + 2 * tq) * c * bytes_per_el
        bd = 2 * tb * n * c * bytes_per_el
        temps = 3 * tb * tq * n * 4
        if streams + bd + temps <= _VMEM_BUDGET:
            return tb
        tb //= 2
    return 1


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, h, dh, t):
    """Blocks: q/o (tb, Tq, C); k/v (tb, Tk=128, C)."""
    tb, tq, c = q_ref.shape
    n = h * _TK
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]

    # block-diagonal K/V: (tb, N, C), row h*Tk+j live only on head h's
    # dh channel slice. Sublane broadcast + static mask — lane layout
    # (C) is untouched, so no relayouts.
    rown = jax.lax.broadcasted_iota(jnp.int32, (n, c), 0)
    colc = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1)
    blockmask = ((rown // _TK) == (colc // dh)).astype(k.dtype)
    k_bd = jnp.broadcast_to(k[:, None], (tb, h, _TK, c)).reshape(tb, n, c)
    k_bd = k_bd * blockmask[None]
    v_bd = jnp.broadcast_to(v[:, None], (tb, h, _TK, c)).reshape(tb, n, c)
    v_bd = v_bd * blockmask[None]

    # all-head scores in one 256-deep contraction: (tb, Tq, N)
    scores = jax.lax.dot_general(
        q, k_bd, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * (1.0 / np.sqrt(dh))

    # causal + key-padding mask: column h*Tk+j is key position j
    rowi = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 0)
    coln = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)
    j = jax.lax.rem(coln, _TK)
    live = (j <= rowi) & (j < t)
    scores = jnp.where(live[None], scores, -1e30)

    # per-head softmax: lanes N = (H, 128) split on a tile boundary
    s4 = scores.reshape(tb, tq, h, _TK)
    m = jnp.max(s4, axis=-1, keepdims=True)
    e = jnp.exp(s4 - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).reshape(tb, tq, n)

    out = jax.lax.dot_general(
        p.astype(v.dtype), v_bd, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.astype(o_ref.dtype)


def _packed_forward(q, k, v, interpret=False):
    # CPU has no Mosaic backend: interpret keeps the path testable there
    interpret = interpret or jax.default_backend() == "cpu"
    b, t, h, dh = q.shape
    c = h * dh
    if t > _TK or c % 128 != 0:
        raise ValueError(
            f"packed attention needs T <= {_TK} and H*Dh % 128 == 0, "
            f"got T={t}, H*Dh={c}"
        )
    tqp = ((t + 15) // 16) * 16
    qf = pad_to(q.reshape(b, t, c), tqp, 1)
    kf = pad_to(k.reshape(b, t, c), _TK, 1)
    vf = pad_to(v.reshape(b, t, c), _TK, 1)
    tile_b = _pick_tile_b(tqp, c, h, qf.dtype.itemsize)
    bp = ((b + tile_b - 1) // tile_b) * tile_b
    qf = pad_to(qf, bp, 0)
    kf = pad_to(kf, bp, 0)
    vf = pad_to(vf, bp, 0)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, h=h, dh=dh, t=t),
        grid=(bp // tile_b,),
        in_specs=[
            pl.BlockSpec(
                (tile_b, tqp, c), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_b, _TK, c), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_b, _TK, c), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, tqp, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, tqp, c), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:b, :t].reshape(b, t, h, dh)


def _pick_tile_b_bwd(tq: int, c: int, h: int, bytes_per_el: int) -> int:
    """Backward VMEM model: q/k/v/g/dq/dk/dv streams, k_bd/v_bd, the
    P/dP/dS f32 (tq, N) chain, and the two f32 (N, C) pre-fold grads."""
    n = h * _TK
    tb = 16
    while tb > 1:
        streams = tb * (5 * _TK + 2 * tq) * c * bytes_per_el
        bd = 2 * tb * n * c * bytes_per_el
        temps = 4 * tb * tq * n * 4 + 2 * tb * n * c * 4
        if streams + bd + temps <= _VMEM_BUDGET:
            return tb
        tb //= 2
    return 1


def _packed_bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *, h, dh, t
):
    """Packed backward: recompute P, then every gradient is a dense
    packed matmul —
        dP = g @ v_bd^T            (tb, Tq, N)
        dS = P * (dP - rowsum_h(P*dP)) * scale
        dQ = dS @ k_bd             (tb, Tq, C)
        dK = fold_h(dS^T @ q)      (tb, Tk, C)
        dV = fold_h(P^T  @ g)      (tb, Tk, C)
    where fold_h masks each (N, C) pre-fold gradient to its head block
    and sums the H sublane groups — the adjoint of the block-diagonal
    broadcast, lane-aligned like everything else here."""
    tb, tq, c = q_ref.shape
    n = h * _TK
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    g = g_ref[:]
    scale = 1.0 / np.sqrt(dh)

    rown = jax.lax.broadcasted_iota(jnp.int32, (n, c), 0)
    colc = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1)
    blockmask = ((rown // _TK) == (colc // dh)).astype(jnp.float32)
    k_bd = jnp.broadcast_to(k[:, None], (tb, h, _TK, c)).reshape(tb, n, c)
    k_bd = k_bd * blockmask[None].astype(k.dtype)
    v_bd = jnp.broadcast_to(v[:, None], (tb, h, _TK, c)).reshape(tb, n, c)
    v_bd = v_bd * blockmask[None].astype(v.dtype)

    scores = jax.lax.dot_general(
        q, k_bd, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    rowi = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 0)
    coln = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)
    j = jax.lax.rem(coln, _TK)
    live = (j <= rowi) & (j < t)
    scores = jnp.where(live[None], scores, -1e30)
    s4 = scores.reshape(tb, tq, h, _TK)
    m = jnp.max(s4, axis=-1, keepdims=True)
    e = jnp.exp(s4 - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).reshape(tb, tq, n)

    dp = jax.lax.dot_general(
        g, v_bd, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    pdp = p * dp
    rowsum = jnp.sum(pdp.reshape(tb, tq, h, _TK), axis=-1, keepdims=True)
    ds = (pdp - p * jnp.broadcast_to(rowsum, (tb, tq, h, _TK)).reshape(tb, tq, n)) * scale
    ds = ds.astype(q.dtype)

    dq = jax.lax.dot_general(
        ds, k_bd, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dq_ref[:] = dq.astype(dq_ref.dtype)

    # pre-fold grads: contract the query dim (sublane of both operands)
    dk_flat = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (tb, N, C)
    dk = jnp.sum(
        dk_flat.reshape(tb, h, _TK, c) * blockmask.reshape(h, _TK, c)[None],
        axis=1,
    )
    dk_ref[:] = dk.astype(dk_ref.dtype)

    dv_flat = jax.lax.dot_general(
        p.astype(g.dtype), g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dv = jnp.sum(
        dv_flat.reshape(tb, h, _TK, c) * blockmask.reshape(h, _TK, c)[None],
        axis=1,
    )
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _packed_backward(q, k, v, g, interpret=False):
    interpret = interpret or jax.default_backend() == "cpu"
    b, t, h, dh = q.shape
    c = h * dh
    tqp = ((t + 15) // 16) * 16
    qf = pad_to(q.reshape(b, t, c), tqp, 1)
    kf = pad_to(k.reshape(b, t, c), _TK, 1)
    vf = pad_to(v.reshape(b, t, c), _TK, 1)
    gf = pad_to(g.reshape(b, t, c).astype(q.dtype), tqp, 1)
    tile_b = _pick_tile_b_bwd(tqp, c, h, qf.dtype.itemsize)
    bp = ((b + tile_b - 1) // tile_b) * tile_b
    qf, kf, vf, gf = (pad_to(x, bp, 0) for x in (qf, kf, vf, gf))
    spec_q = pl.BlockSpec(
        (tile_b, tqp, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    spec_k = pl.BlockSpec(
        (tile_b, _TK, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, h=h, dh=dh, t=t),
        grid=(bp // tile_b,),
        in_specs=[spec_q, spec_k, spec_k, spec_q],
        out_specs=[spec_q, spec_k, spec_k],
        out_shape=[
            jax.ShapeDtypeStruct((bp, tqp, c), q.dtype),
            jax.ShapeDtypeStruct((bp, _TK, c), k.dtype),
            jax.ShapeDtypeStruct((bp, _TK, c), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qf, kf, vf, gf)
    return (
        dq[:b, :t].reshape(b, t, h, dh),
        dk[:b, :t].reshape(b, t, h, dh),
        dv[:b, :t].reshape(b, t, h, dh),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def packed_causal_attention(q, k, v, interpret=False):
    """q, k, v: (B, T, H, Dh) -> (B, T, H, Dh), causal, T <= 128.

    Same semantics as causal_attention / flash_causal_attention;
    softmax always f32 in VMEM. Unlike the flash kernel, the VJP is a
    PACKED PALLAS KERNEL too (4 more dense packed matmuls), so fwd+grad
    through this path beats XLA as well — it is safe (and intended) for
    training configs, including under jax.checkpoint."""
    return _packed_forward(q, k, v, interpret)


def _fwd(q, k, v, interpret):
    return _packed_forward(q, k, v, interpret), (q, k, v)


def _bwd(interpret, res, g):
    q, k, v = res
    return _packed_backward(q, k, v, g, interpret)


packed_causal_attention.defvjp(_fwd, _bwd)


def packed_supported(t: int, h: int, dh: int) -> bool:
    """Shapes the kernel accepts AND where the pass-packing pays: the
    H-fold FLOP redundancy loses to per-head tiles once T is large
    enough for dense (T, T) score tiles (flash_attention's regime)."""
    return (h * dh) % 128 == 0 and t <= _TK and h > 1
