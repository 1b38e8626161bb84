"""Micro-benchmark of the fused EGNN message kernel at grande shapes.

Measures fwd and fwd+bwd wall time on the real device, amortizing the
per-call tunnel overhead by chaining ITERS dependent evaluations inside
one jit (CLAUDE.md benchmarking notes). Compares the Pallas kernel
against the dense jnp path.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_egnn_kernel.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coati_tpu.ops.pallas import egnn_messages as M

B = int(os.environ.get("EG_B", 160))
N = int(os.environ.get("EG_N", 96))
H = int(os.environ.get("EG_H", 256))
ITERS = int(os.environ.get("EG_ITERS", 20))


def make_inputs(key, packed_atoms=False):
    ks = jax.random.split(key, 9)
    a = jax.random.normal(ks[0], (B, N, H), jnp.float32)
    c = jax.random.normal(ks[1], (B, N, H), jnp.float32)
    d2 = jax.random.uniform(ks[2], (B, N, N), jnp.float32) * 20.0
    w = (jax.random.uniform(ks[3], (B, N, N)) < 0.3).astype(jnp.float32)
    if packed_atoms:
        # realistic padding: per-molecule atom counts (geom_drugs mean
        # ~44 heavy atoms in a 96 bucket), atoms packed before padding
        natoms = jax.random.randint(ks[8], (B,), 24, N + 1)
        idx = jnp.arange(N)
        node = (idx[None, :] < natoms[:, None]).astype(jnp.float32)
        w = w * node[:, :, None] * node[:, None, :]
    wd = jax.random.normal(ks[4], (H,), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[5], (H,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[6], (H, H), jnp.float32) * 0.06
    b2 = jax.random.normal(ks[7], (H,), jnp.float32) * 0.1
    return a, c, d2, w, wd, b1, w2, b2


def chain(fn, n):
    def run(args):
        a, c, d2, w, wd, b1, w2, b2 = args
        out = jnp.zeros((B, N, H), jnp.float32)

        def body(i, carry):
            out, a = carry
            r = fn(a, c, d2, w, wd, b1, w2, b2)
            return out + r, a + 1e-6 * r  # data dependence between iters
        out, _ = jax.lax.fori_loop(0, n, body, (out, a))
        return jnp.sum(out)
    return jax.jit(run)


def chain_grad(fn, n):
    def loss(a, c, d2, w, wd, b1, w2, b2):
        return jnp.sum(fn(a, c, d2, w, wd, b1, w2, b2) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 4, 5, 6, 7))

    def run(args):
        a, c, d2, w, wd, b1, w2, b2 = args
        acc = jnp.zeros(())

        def body(i, carry):
            acc, a = carry
            grads = g(a, c, d2, w, wd, b1, w2, b2)
            s = sum(jnp.sum(x) for x in grads)
            return acc + s, a + 1e-9 * grads[0]
        acc, _ = jax.lax.fori_loop(0, n, body, (acc, a))
        return acc
    return jax.jit(run)


def bench(label, jitted, args):
    for _ in range(3):
        np.asarray(jitted(args))  # warmup to steady state
    times = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(jitted(args))
        times.append(time.time() - t0)
    best = min(times)
    per = (best - 0.029) / ITERS * 1e3  # subtract tunnel overhead
    print(f"{label}: {per:.2f} ms/iter (best wall {best:.3f}s for {ITERS})")
    return per


def main():
    print(f"device={jax.devices()[0].platform} B={B} N={N} H={H}", flush=True)
    args = make_inputs(jax.random.PRNGKey(0))

    fwd_pallas = chain(M.egnn_messages, ITERS)
    fwd_bf16 = chain(M.egnn_messages_bf16, ITERS)
    fwd_ref = chain(M.egnn_messages_reference, ITERS)
    bwd_pallas = chain_grad(M.egnn_messages, ITERS)
    bwd_bf16 = chain_grad(M.egnn_messages_bf16, ITERS)
    bwd_ref = chain_grad(M.egnn_messages_reference, ITERS)

    bench("pallas fwd         ", fwd_pallas, args)
    bench("pallas fwd bf16mm  ", fwd_bf16, args)
    bench("dense  fwd         ", fwd_ref, args)
    bench("pallas fwd+bwd     ", bwd_pallas, args)
    bench("pallas fwd+bwd bf16", bwd_bf16, args)
    bench("dense  fwd+bwd     ", bwd_ref, args)

    print("--- packed-atom batch (realistic padding; i-block skip) ---")
    packed = make_inputs(jax.random.PRNGKey(1), packed_atoms=True)
    bench("pallas fwd  packed ", fwd_pallas, packed)
    bench("dense  fwd  packed ", fwd_ref, packed)
    bench("pallas f+b  packed ", bwd_pallas, packed)
    bench("dense  f+b  packed ", bwd_ref, packed)


if __name__ == "__main__":
    main()
