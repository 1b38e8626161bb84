"""Localize the packed-attention kernel's cost on TPU.

Ablated kernel variants (same grid/BlockSpecs as the real kernel):
  full      the production packed kernel
  nomask    skip the block-diagonal mask multiply (broadcast only;
            WRONG numerics — measures the mask-mult VPU cost)
  nosoftmax matmuls + construction + causal mask, identity "softmax"
  mmonly    broadcast + two dot_generals only
  qkonly    construction + the score matmul alone
Knobs: PK_B / PK_T / PK_TB (force tile_b) / PK_ITERS.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coati_tpu.ops.pallas.common import pad_to

B = int(os.environ.get("PK_B", 1024))
T = int(os.environ.get("PK_T", 96))
H, DH = 16, 16
C = H * DH
TK = 128
N = H * TK
ITERS = int(os.environ.get("PK_ITERS", 8))
TB = int(os.environ.get("PK_TB", 8))


def kernel(q_ref, k_ref, v_ref, o_ref, *, variant):
    tb, tq, c = q_ref.shape
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    if variant == "synthbd":
        # no broadcast: k_bd/v_bd are mask-derived constants — isolates
        # the broadcast-materialization cost (numerics are wrong)
        rown = jax.lax.broadcasted_iota(jnp.int32, (N, c), 0)
        colc = jax.lax.broadcasted_iota(jnp.int32, (N, c), 1)
        bm = ((rown // TK) == (colc // DH)).astype(k.dtype)
        k_bd = jnp.broadcast_to(bm[None], (tb, N, c))
        scores = jax.lax.dot_general(
            q, k_bd, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (1.0 / np.sqrt(DH))
        out = jax.lax.dot_general(
            scores.astype(v.dtype), k_bd, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = out.astype(o_ref.dtype)
        return
    if variant == "qmask":
        # per-head masked-q: full-C contraction against UNPACKED k,
        # head separation via H small static-sliced matmuls
        colc = jax.lax.broadcasted_iota(jnp.int32, (tq, c), 1)
        outs = []
        for hh in range(H):
            chm = ((colc // DH) == hh).astype(q.dtype)
            qh = q * chm[None]
            sh = jax.lax.dot_general(
                qh, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * (1.0 / np.sqrt(DH))  # (tb, tq, TK)
            rowi = jax.lax.broadcasted_iota(jnp.int32, (tq, TK), 0)
            colj = jax.lax.broadcasted_iota(jnp.int32, (tq, TK), 1)
            live = (colj <= rowi) & (colj < T)
            sh = jnp.where(live[None], sh, -1e30)
            m = jnp.max(sh, axis=-1, keepdims=True)
            e = jnp.exp(sh - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            oh = jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (tb, tq, C) — only head hh's channels valid
            outs.append(oh * chm[None].astype(jnp.float32))
        o_ref[:] = sum(outs).astype(o_ref.dtype)
        return
    if variant == "qstack":
        # stacked masked-q: heads along SUBLANES -> softmax over lanes
        # needs no reshape; one score + one PV dot_general
        colc = jax.lax.broadcasted_iota(jnp.int32, (H, 1, c), 2)
        hidx = jax.lax.broadcasted_iota(jnp.int32, (H, 1, c), 0)
        chm = ((colc // DH) == hidx).astype(q.dtype)  # (H, 1, C)
        qs = (q[:, None] * chm[None]).reshape(tb, H * tq, c)
        s = jax.lax.dot_general(
            qs, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (1.0 / np.sqrt(DH))  # (tb, H*tq, TK)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (H * tq, TK), 0)
        colj = jax.lax.broadcasted_iota(jnp.int32, (H * tq, TK), 1)
        i = jax.lax.rem(rowi, tq)
        live = (colj <= i) & (colj < T)
        s = jnp.where(live[None], s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        of = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (tb, H*tq, C)
        out = jnp.sum(
            of.reshape(tb, H, tq, c) * chm[None].astype(jnp.float32), axis=1
        )
        o_ref[:] = out.astype(o_ref.dtype)
        return
    k_bd = jnp.broadcast_to(k[:, None], (tb, H, TK, c)).reshape(tb, N, c)
    v_bd = jnp.broadcast_to(v[:, None], (tb, H, TK, c)).reshape(tb, N, c)
    if variant != "nomask":
        rown = jax.lax.broadcasted_iota(jnp.int32, (N, c), 0)
        colc = jax.lax.broadcasted_iota(jnp.int32, (N, c), 1)
        bm = ((rown // TK) == (colc // DH)).astype(k.dtype)
        k_bd = k_bd * bm[None]
        v_bd = v_bd * bm[None]
    scores = jax.lax.dot_general(
        q, k_bd, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * (1.0 / np.sqrt(DH))
    if variant == "qkonly":
        o_ref[:] = scores[:, :, :c].astype(o_ref.dtype)
        return
    if variant in ("full",):
        rowi = jax.lax.broadcasted_iota(jnp.int32, (tq, N), 0)
        coln = jax.lax.broadcasted_iota(jnp.int32, (tq, N), 1)
        j = jax.lax.rem(coln, TK)
        live = (j <= rowi) & (j < T)
        scores = jnp.where(live[None], scores, -1e30)
        s4 = scores.reshape(tb, tq, H, TK)
        m = jnp.max(s4, axis=-1, keepdims=True)
        e = jnp.exp(s4 - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).reshape(tb, tq, N)
    elif variant == "nosoftmax":
        rowi = jax.lax.broadcasted_iota(jnp.int32, (tq, N), 0)
        coln = jax.lax.broadcasted_iota(jnp.int32, (tq, N), 1)
        j = jax.lax.rem(coln, TK)
        live = (j <= rowi) & (j < T)
        p = jnp.where(live[None], scores, 0.0)
    else:  # mmonly / nomask
        p = scores
    out = jax.lax.dot_general(
        p.astype(v.dtype), v_bd, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.astype(o_ref.dtype)


def run(variant, q, k, v):
    b = q.shape[0]
    tqp = ((T + 15) // 16) * 16
    qf = pad_to(q.reshape(b, T, C), tqp, 1)
    kf = pad_to(k.reshape(b, T, C), TK, 1)
    vf = pad_to(v.reshape(b, T, C), TK, 1)

    def call(qf, kf, vf):
        return pl.pallas_call(
            functools.partial(kernel, variant=variant),
            grid=(b // TB,),
            in_specs=[
                pl.BlockSpec((TB, tqp, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, TK, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, TK, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, tqp, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, tqp, C), q.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(qf, kf, vf)

    def looped(qf, kf, vf):
        def body(i, carry):
            s, qq = carry
            r = call(qq, kf, vf)
            rs = jnp.sum(r.astype(jnp.float32))
            return s + rs, qq * (1.0 + 1e-30 * rs).astype(qq.dtype)

        s, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), qf))
        return s

    j = jax.jit(looped)
    np.asarray(j(qf, kf, vf))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(j(qf, kf, vf))
        best = min(best, time.perf_counter() - t0)
    print(f"{variant:10s} tb={TB}: {best / ITERS * 1000:7.2f} ms/iter")


def main():
    print(f"device: {jax.devices()[0]}, B={B} T={T} H={H} Dh={DH} TB={TB}")
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, T, H, DH), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, T, H, DH), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, T, H, DH), jnp.bfloat16)
    for variant in sys.argv[1:] or ["mmonly", "nomask", "nosoftmax", "full", "qkonly"]:
        run(variant, q, k, v)


if __name__ == "__main__":
    main()
