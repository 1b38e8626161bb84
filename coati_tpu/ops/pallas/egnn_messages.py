"""Fused EGNN message-passing kernel (Pallas, TPU).

Computes, for every atom i of every molecule b:

    mi[b, i] = sum_j w[b, i, j] * silu( silu(a[b,i] + c[b,j]
                                         + d2[b,i,j] * w_d + b1) @ W2 + b2 )

i.e. the two-layer edge MLP of e_gcl (coati/models/encoding/
e_gcl_sparse.py:130-137, 169-215) with the smooth-cutoff/pair mask folded
into the aggregation — WITHOUT materializing the (B, N, N, Hm) pairwise
message tensor in HBM. The first edge-MLP layer is pre-decomposed by the
caller (a = h @ W1_i, c = h @ W1_j), so the kernel streams (TILE_I,
TILE_J, Hm) tiles through VMEM, runs the inner matmul on the MXU, and
accumulates the weighted sum in place. HBM traffic per layer drops from
O(B N^2 Hm) to O(B N Hm + B N^2).

A custom VJP recomputes the tiles in a second Pallas kernel and
accumulates all parameter/activation gradients across the sequential TPU
grid, so training never materializes pairwise tensors either.

Both kernels have jnp reference implementations used for CPU fallback
and correctness tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coati_tpu.ops.pallas.common import on_tpu as _on_tpu
from coati_tpu.ops.pallas.common import pad_to as _pad_to

TILE_I = 8
TILE_J = 128

# Molecules per grid step. Per-GRID-step scheduling overhead is the
# dominant cost of this kernel on some TPU runtimes (~130 us/step on the
# tunneled dev runtime), so the grid is kept as coarse as VMEM allows:
# the per-molecule work runs in an IN-KERNEL fori_loop, so raising the
# tile does not unroll the kernel body — compile time stays flat while
# grid overhead drops linearly. The tile is picked per call from a
# VMEM budget (the kernels raise Mosaic's scoped-VMEM limit from the
# 16 MB default via CompilerParams; the pipeline double-buffers every
# in/out block); override with COATI_EGNN_TILE_B for experiments.
_VMEM_LIMIT = 64 * 2**20  # raised via CompilerParams (chip VMEM is 128 MB)
_VMEM_BUDGET = 56 * 2**20  # headroom for Mosaic scratch under the limit
_TILE_B_CAP = 32


def _round_nj(n: int) -> int:
    """j-rows padding: a single tight j-tile (multiple of 8 sublanes)
    when n fits one block — padding j to the full 128 would waste 25-33%
    of the silu/matmul work at the common 96-atom bucket — else
    TILE_J-aligned so dynamic j-block starts stay lane-aligned."""
    if n <= TILE_J:
        return max(8, ((n + 7) // 8) * 8)
    return ((n + TILE_J - 1) // TILE_J) * TILE_J


def _j_subtiles(nj: int):
    """Static (start, size) j sub-tiles for the in-kernel j loop.

    Each sub-tile's compute is guarded by a PER-I-BLOCK runtime cond on
    the last live pair-weight column, so small molecules in a big atom
    bucket skip the dead j suffix. The unroll must stay STATIC: Mosaic
    requires lane-dimension slice offsets be either compile-time
    constants or provable multiples of 128, so a dynamic-bound fori_loop
    over 32-column blocks cannot lower — an unrolled loop of <= 4
    statically-offset sub-tiles (each an scf.if) can. 32 columns
    (TILE_I*32 = 256 silu rows at Hm=256) keeps the VPU/MXU tiles fat;
    nj > TILE_J uses TILE_J blocks to bound the unroll."""
    sub = 32 if nj <= TILE_J else TILE_J
    return [(s, min(sub, nj - s)) for s in range(0, nj, sub)]


def _pick_tile_b(per_mol_bytes: int, fixed_bytes: int, b_sz: int) -> int:
    import os

    override = os.environ.get("COATI_EGNN_TILE_B")
    if override:
        return int(override)
    # double-buffered pipeline: every per-molecule block lives twice
    tile = (_VMEM_BUDGET - fixed_bytes) // (2 * per_mol_bytes)
    tile = max(1, min(_TILE_B_CAP, int(tile)))
    # never stream padding: small batches cap the tile at the next
    # multiple of 4 (the VMEM budget is an upper bound, not a target)
    tile = min(tile, ((b_sz + 3) // 4) * 4)
    if tile >= 4:
        tile -= tile % 4  # keep batch padding modest
    return max(1, tile)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


# ------------------------------------------------------------- forward


def _last_live_col(w_rows):
    """Index-past-the-last column with a nonzero pair weight in this
    i-block's rows. Atoms are packed before padding so live columns are
    a contiguous prefix; a fully-masked i-block (padding rows past the
    molecule's atom count) returns 0 and every j sub-tile is skipped —
    this subsumes the old block-level i-skip cond. Columns past the
    bound contribute exactly zero (w == 0 multiplies every message and
    every gradient), so the cut is exact."""
    nj = w_rows.shape[1]
    col_any = jnp.max(jnp.abs(w_rows), axis=0, keepdims=True)  # (1, nj)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, nj), 1)
    return jnp.max(jnp.where(col_any > 0.0, idx + 1, 0))


def _fwd_kernel(
    a_ref, c_ref, d2_ref, w_ref, wd_ref, b1_ref, w2_ref, b2_ref, out_ref,
    *, mm_dtype=jnp.float32, tile_b=1, subtiles=((0, TILE_J),),
):
    ni = a_ref.shape[1]
    hm = a_ref.shape[2]
    n_iblk = ni // TILE_I

    # (b, iblk) as ONE in-kernel fori_loop: the body traces once per
    # j sub-tile shape, so TILE_B scales the grid down without scaling
    # compile time up
    def outer(idx, carry):
        b = idx // n_iblk
        iblk = idx % n_iblk
        i0 = iblk * TILE_I
        a = a_ref[b, pl.ds(i0, TILE_I), :]  # (TILE_I, Hm)
        w_rows = w_ref[b, pl.ds(i0, TILE_I), :]
        jmax = _last_live_col(w_rows)

        def body(j0, sj, acc):
            c = c_ref[b, pl.ds(j0, sj), :]  # (sj, Hm)
            d2 = d2_ref[b, pl.ds(i0, TILE_I), pl.ds(j0, sj)]
            w = w_ref[b, pl.ds(i0, TILE_I), pl.ds(j0, sj)]
            z1 = (
                a[:, None, :]
                + c[None, :, :]
                + d2[:, :, None] * wd_ref[0]
                + b1_ref[0]
            )  # (TILE_I, sj, Hm)
            e1 = _silu(z1).reshape(TILE_I * sj, hm)
            # mm_dtype=bfloat16 guarantees single-pass MXU matmuls
            # (measured neutral on v5e where Mosaic already truncates
            # f32 dot inputs; explicit for toolchains that don't)
            z2 = (
                jnp.dot(
                    e1.astype(mm_dtype),
                    w2_ref[:].astype(mm_dtype),
                    preferred_element_type=jnp.float32,
                )
                + b2_ref[0]
            )
            m = _silu(z2).reshape(TILE_I, sj, hm)
            return acc + jnp.sum(m * w[:, :, None], axis=1)

        # static j sub-tile unroll, each guarded on the live bound:
        # padding i-blocks skip everything (the old i-block skip),
        # small molecules skip the dead j suffix
        acc = jnp.zeros((TILE_I, hm), jnp.float32)
        for j0, sj in subtiles:
            acc = jax.lax.cond(
                j0 < jmax,
                lambda acc, j0=j0, sj=sj: body(j0, sj, acc),
                lambda acc: acc,
                acc,
            )
        out_ref[b, pl.ds(i0, TILE_I), :] = acc
        return carry

    jax.lax.fori_loop(0, tile_b * n_iblk, outer, 0)


def fwd_tile_b(ni: int, nj: int, hm: int, b_sz: int = _TILE_B_CAP) -> int:
    """Grid tile for the forward kernel: a/out (ni,hm), c (nj,hm),
    d2/w (ni,nj) per molecule, f32."""
    per_mol = 4 * (2 * ni * hm + nj * hm + 2 * ni * nj)
    fixed = 4 * (3 * TILE_I * TILE_J * hm + hm * hm + 4 * hm)
    return _pick_tile_b(per_mol, fixed, b_sz)


def bwd_tile_b(ni: int, nj: int, hm: int, b_sz: int = _TILE_B_CAP) -> int:
    """Backward blocks: a/g/da (ni,hm), c/dc (nj,hm), d2/w (ni,nj),
    plus z1/e1/dz1-sized temporaries."""
    per_mol = 4 * (3 * ni * hm + 2 * nj * hm + 2 * ni * nj)
    fixed = 4 * (5 * TILE_I * TILE_J * hm + 2 * hm * hm + 8 * hm)
    return _pick_tile_b(per_mol, fixed, b_sz)


def _fwd_pallas(a, c, d2, w, wd, b1, w2, b2, mm_dtype=jnp.float32, tile_b=1):
    b_sz, ni, hm = a.shape
    nj = c.shape[1]
    grid = (b_sz // tile_b,)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, mm_dtype=mm_dtype, tile_b=tile_b,
            subtiles=tuple(_j_subtiles(nj)),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, ni, hm), lambda b: (b, 0, 0)),
            pl.BlockSpec((tile_b, nj, hm), lambda b: (b, 0, 0)),
            pl.BlockSpec((tile_b, ni, nj), lambda b: (b, 0, 0)),
            pl.BlockSpec((tile_b, ni, nj), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, hm), lambda b: (0, 0)),
            pl.BlockSpec((1, hm), lambda b: (0, 0)),
            pl.BlockSpec((hm, hm), lambda b: (0, 0)),
            pl.BlockSpec((1, hm), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_b, ni, hm), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_sz, ni, hm), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(a, c, d2, w, wd, b1, w2, b2)


def egnn_messages_reference(a, c, d2, w, wd, b1, w2, b2):
    """jnp reference / CPU fallback of the fused contraction."""
    z1 = a[:, :, None, :] + c[:, None, :, :] + d2[..., None] * wd + b1
    e1 = _silu(z1)
    m = _silu(jnp.einsum("bijh,hk->bijk", e1, w2) + b2)
    return jnp.einsum("bijh,bij->bih", m, w)


# ------------------------------------------------------------ backward


def _bwd_kernel(
    a_ref, c_ref, d2_ref, w_ref, wd_ref, b1_ref, w2_ref, b2_ref, g_ref,
    da_ref, dc_ref, dwd_ref, db1_ref, dw2_ref, db2_ref,
    *, mm_dtype=jnp.float32, tile_b=1, subtiles=((0, TILE_J),),
):
    b_idx = pl.program_id(0)
    ni = a_ref.shape[1]
    hm = a_ref.shape[2]

    @pl.when(b_idx == 0)  # param-grad blocks accumulate across the grid
    def _():
        dwd_ref[:] = jnp.zeros_like(dwd_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dc_ref[:] = jnp.zeros_like(dc_ref)
    n_iblk = ni // TILE_I

    # (b, iblk) as one in-kernel fori_loop — see the forward kernel
    def outer(idx, carry):
        b = idx // n_iblk
        iblk = idx % n_iblk
        i0 = iblk * TILE_I
        a = a_ref[b, pl.ds(i0, TILE_I), :]
        g = g_ref[b, pl.ds(i0, TILE_I), :]
        w_rows = w_ref[b, pl.ds(i0, TILE_I), :]

        jmax = _last_live_col(w_rows)

        def body(j0, sj):
            c = c_ref[b, pl.ds(j0, sj), :]
            d2 = d2_ref[b, pl.ds(i0, TILE_I), pl.ds(j0, sj)]
            w = w_ref[b, pl.ds(i0, TILE_I), pl.ds(j0, sj)]
            z1 = (
                a[:, None, :]
                + c[None, :, :]
                + d2[:, :, None] * wd_ref[0]
                + b1_ref[0]
            )
            z1f = z1.reshape(TILE_I * sj, hm)
            e1 = _silu(z1f)
            z2 = (
                jnp.dot(
                    e1.astype(mm_dtype),
                    w2_ref[:].astype(mm_dtype),
                    preferred_element_type=jnp.float32,
                )
                + b2_ref[0]
            )
            # dm = w_ij * g_i broadcast over j
            dm = (w[:, :, None] * g[:, None, :]).reshape(TILE_I * sj, hm)
            dz2 = dm * _dsilu(z2)
            de1 = jnp.dot(
                dz2.astype(mm_dtype),
                w2_ref[:].T.astype(mm_dtype),
                preferred_element_type=jnp.float32,
            )
            dz1 = de1 * _dsilu(z1f)
            dz1_3d = dz1.reshape(TILE_I, sj, hm)
            # parameter grads (accumulated across the sequential grid)
            dw2_ref[:] += jnp.dot(
                e1.T.astype(mm_dtype),
                dz2.astype(mm_dtype),
                preferred_element_type=jnp.float32,
            )
            db2_ref[0] += jnp.sum(dz2, axis=0)
            db1_ref[0] += jnp.sum(dz1, axis=0)
            dwd_ref[0] += jnp.sum(dz1_3d * d2[:, :, None], axis=(0, 1))
            # activation grads
            dc_ref[b, pl.ds(j0, sj), :] += jnp.sum(dz1_3d, axis=0)
            da_ref[b, pl.ds(i0, TILE_I), :] += jnp.sum(dz1_3d, axis=1)

        # static j sub-tile unroll guarded on the live bound (see the
        # forward kernel): padding i-blocks skip everything; columns
        # past the bound have dm = w*g = 0, so every gradient
        # contribution there is exactly zero
        da_ref[b, pl.ds(i0, TILE_I), :] = jnp.zeros((TILE_I, hm), jnp.float32)
        for j0, sj in subtiles:
            @pl.when(j0 < jmax)
            def _(j0=j0, sj=sj):
                body(j0, sj)
        return carry

    jax.lax.fori_loop(0, tile_b * n_iblk, outer, 0)


def _bwd_pallas(a, c, d2, w, wd, b1, w2, b2, g, mm_dtype=jnp.float32, tile_b=1):
    b_sz, ni, hm = a.shape
    nj = c.shape[1]
    grid = (b_sz // tile_b,)
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, mm_dtype=mm_dtype, tile_b=tile_b,
            subtiles=tuple(_j_subtiles(nj)),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, ni, hm), lambda b: (b, 0, 0)),
            pl.BlockSpec((tile_b, nj, hm), lambda b: (b, 0, 0)),
            pl.BlockSpec((tile_b, ni, nj), lambda b: (b, 0, 0)),
            pl.BlockSpec((tile_b, ni, nj), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, hm), lambda b: (0, 0)),
            pl.BlockSpec((1, hm), lambda b: (0, 0)),
            pl.BlockSpec((hm, hm), lambda b: (0, 0)),
            pl.BlockSpec((1, hm), lambda b: (0, 0)),
            pl.BlockSpec((tile_b, ni, hm), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, ni, hm), lambda b: (b, 0, 0)),  # da
            pl.BlockSpec((tile_b, nj, hm), lambda b: (b, 0, 0)),  # dc
            pl.BlockSpec((1, hm), lambda b: (0, 0)),  # dwd (acc)
            pl.BlockSpec((1, hm), lambda b: (0, 0)),  # db1 (acc)
            pl.BlockSpec((hm, hm), lambda b: (0, 0)),  # dw2 (acc)
            pl.BlockSpec((1, hm), lambda b: (0, 0)),  # db2 (acc)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_sz, ni, hm), jnp.float32),
            jax.ShapeDtypeStruct((b_sz, nj, hm), jnp.float32),
            jax.ShapeDtypeStruct((1, hm), jnp.float32),
            jax.ShapeDtypeStruct((1, hm), jnp.float32),
            jax.ShapeDtypeStruct((hm, hm), jnp.float32),
            jax.ShapeDtypeStruct((1, hm), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(a, c, d2, w, wd, b1, w2, b2, g)


# --------------------------------------------------------- public entry


def _pad_all(a, c, d2, w, extra=None, tile_fn=None):
    """Pad batch to the grid tile, i-rows to TILE_I, j-rows to TILE_J
    multiples. `tile_fn(ni, nj, hm, b_sz)` is the per-call grid-tile
    picker (fwd_tile_b / bwd_tile_b); the chosen tile is returned as the
    LAST element so the pallas wrapper uses the same value the batch was
    padded for."""
    b_sz, n, hm = a.shape
    ni = ((n + TILE_I - 1) // TILE_I) * TILE_I
    nj = _round_nj(n)
    tile_b = tile_fn(ni, nj, hm, b_sz)
    bp = ((b_sz + tile_b - 1) // tile_b) * tile_b
    a_p = _pad_to(_pad_to(a, ni, 1), bp, 0)
    c_p = _pad_to(_pad_to(c, nj, 1), bp, 0)
    d2_p = _pad_to(_pad_to(_pad_to(d2, ni, 1), nj, 2), bp, 0)
    w_p = _pad_to(_pad_to(_pad_to(w, ni, 1), nj, 2), bp, 0)
    out = [a_p, c_p, d2_p, w_p]
    if extra is not None:
        out.append(_pad_to(_pad_to(extra, ni, 1), bp, 0))
    out.append(tile_b)
    return out


def _make_egnn_messages(mm_dtype):
    """Build the custom-VJP fused message op with a fixed MXU input
    dtype. f32 keeps oracle-parity numerics; bf16 runs the inner matmuls
    single-pass on the MXU (~4x matmul rate) with f32 accumulation — the
    right trade for bf16 training, where activations are bf16 anyway."""

    def dispatch_fwd(a, c, d2, w, wd, b1, w2, b2):
        b_sz, n, hm = a.shape
        if not _on_tpu() or hm % 128 != 0:
            return egnn_messages_reference(a, c, d2, w, wd, b1, w2, b2)
        a_p, c_p, d2_p, w_p, tile_b = _pad_all(a, c, d2, w, tile_fn=fwd_tile_b)
        out = _fwd_pallas(
            a_p.astype(jnp.float32),
            c_p.astype(jnp.float32),
            d2_p.astype(jnp.float32),
            w_p.astype(jnp.float32),
            wd.reshape(1, hm).astype(jnp.float32),
            b1.reshape(1, hm).astype(jnp.float32),
            w2.astype(jnp.float32),
            b2.reshape(1, hm).astype(jnp.float32),
            mm_dtype=mm_dtype,
            tile_b=tile_b,
        )
        return out[:b_sz, :n].astype(a.dtype)

    @jax.custom_vjp
    def fused(a, c, d2, w, wd, b1, w2, b2):
        """Fused masked message aggregation. Shapes:
        a, c: (B, N, Hm); d2, w: (B, N, N) [w carries cutoff*mask, no
        grad]; wd, b1, b2: (Hm,); w2: (Hm, Hm). Returns mi (B, N, Hm)."""
        return dispatch_fwd(a, c, d2, w, wd, b1, w2, b2)

    def fwd(a, c, d2, w, wd, b1, w2, b2):
        out = dispatch_fwd(a, c, d2, w, wd, b1, w2, b2)
        return out, (a, c, d2, w, wd, b1, w2, b2)

    def bwd(res, g):
        a, c, d2, w, wd, b1, w2, b2 = res
        b_sz, n, hm = a.shape
        if not _on_tpu() or hm % 128 != 0:
            # reference backward via jnp autodiff of the reference forward
            def f(a, c, wd, b1, w2, b2):
                return egnn_messages_reference(a, c, d2, w, wd, b1, w2, b2)

            _, vjp = jax.vjp(f, a, c, wd, b1, w2, b2)
            da, dc, dwd, db1, dw2, db2 = vjp(g)
            # d2 / w are masks & stop-gradient'd by the caller: zero
            # cotangents
            return (
                da, dc, jnp.zeros_like(d2), jnp.zeros_like(w),
                dwd, db1, dw2, db2,
            )

        a_p, c_p, d2_p, w_p, g_p, tile_b = _pad_all(
            a, c, d2, w, g.astype(jnp.float32), tile_fn=bwd_tile_b
        )
        da, dc, dwd, db1, dw2, db2 = _bwd_pallas(
            a_p.astype(jnp.float32),
            c_p.astype(jnp.float32),
            d2_p.astype(jnp.float32),
            w_p.astype(jnp.float32),
            wd.reshape(1, hm).astype(jnp.float32),
            b1.reshape(1, hm).astype(jnp.float32),
            w2.astype(jnp.float32),
            b2.reshape(1, hm).astype(jnp.float32),
            g_p,
            mm_dtype=mm_dtype,
            tile_b=tile_b,
        )
        return (
            da[:b_sz, :n].astype(a.dtype),
            dc[:b_sz, :n].astype(c.dtype),
            jnp.zeros_like(d2),
            jnp.zeros_like(w),
            dwd[0].astype(wd.dtype),
            db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype),
            db2[0].astype(b2.dtype),
        )

    fused.defvjp(fwd, bwd)
    return fused


egnn_messages = _make_egnn_messages(jnp.float32)
egnn_messages_bf16 = _make_egnn_messages(jnp.bfloat16)
