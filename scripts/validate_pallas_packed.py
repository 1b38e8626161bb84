"""Validate the head-packed attention kernel (fwd + Pallas bwd) on TPU.

Parity vs the XLA f32-softmax reference at the grande geometry
(H=16, Dh=16), plus a same-process fwd and fwd+grad layer A/B at the
bench shape. Exits 0 iff all parity thresholds hold.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from coati_tpu.ops.attention import causal_attention
from coati_tpu.ops.pallas.packed_attention import packed_causal_attention

B = int(os.environ.get("PK_B", 512))
ITERS = int(os.environ.get("PK_ITERS", 8))


def main():
    print(f"backend: {jax.default_backend()}")
    failures = []

    # f32 tolerance is MXU rounding, not softmax error: default-precision
    # TPU matmuls run bf16 passes, and the packed kernel's 256-deep
    # contraction accumulates in a different order than XLA's 16-deep
    # per-head dots (~1e-4 rel; interpret-mode parity is 1e-6,
    # tests/test_pallas_packed.py)
    for dtype, tol in ((jnp.float32, 1e-3), (jnp.bfloat16, 2e-2)):
        for t in (17, 80, 96, 128):
            ks = jax.random.split(jax.random.PRNGKey(t), 4)
            q, k, v = (jax.random.normal(kk, (8, t, 16, 16), dtype) for kk in ks[:3])
            co = jax.random.normal(ks[3], (8, t, 16, 16), dtype)
            ref = np.asarray(
                causal_attention(q, k, v, None, jnp.float32).astype(jnp.float32)
            )
            out = np.asarray(
                jax.jit(packed_causal_attention)(q, k, v).astype(jnp.float32)
            )
            rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
            ok = rel <= tol
            print(f"parity fwd {dtype.__name__} T={t}: max rel {rel:.2e} "
                  f"{'ok' if ok else 'FAIL'}")
            if not ok:
                failures.append(f"fwd {dtype.__name__} T={t}")

            gp = jax.jit(
                jax.grad(
                    lambda q, k, v: jnp.sum(
                        packed_causal_attention(q, k, v).astype(jnp.float32)
                        * co.astype(jnp.float32)
                    ),
                    argnums=(0, 1, 2),
                )
            )(q, k, v)
            gx = jax.jit(
                jax.grad(
                    lambda q, k, v: jnp.sum(
                        causal_attention(q, k, v, None, jnp.float32).astype(
                            jnp.float32
                        )
                        * co.astype(jnp.float32)
                    ),
                    argnums=(0, 1, 2),
                )
            )(q, k, v)
            rels = [
                float(
                    np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
                    / (np.abs(np.asarray(b, np.float32)).max() + 1e-9)
                )
                for a, b in zip(gp, gx)
            ]
            ok = all(r <= max(tol, 3e-2) for r in rels)
            print(f"parity grad {dtype.__name__} T={t}: max rel "
                  f"{['%.2e' % r for r in rels]} {'ok' if ok else 'FAIL'}")
            if not ok:
                failures.append(f"grad {dtype.__name__} T={t}")

    # same-process layer A/B at the bench shape
    t = 96
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, t, 16, 16), jnp.bfloat16) for kk in ks)

    def timed(name, fn):
        def looped(q):
            def body(i, carry):
                s, q = carry
                r = fn(q)
                rs = jnp.sum(r.astype(jnp.float32))
                return s + rs, q * (1.0 + 1e-30 * rs).astype(q.dtype)

            s, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), q))
            return s

        j = jax.jit(looped)
        np.asarray(j(q))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(j(q))
            best = min(best, time.perf_counter() - t0)
        ms = best / ITERS * 1000
        print(f"{name:22s}: {ms:7.2f} ms/iter (B={B} T={t})")
        return ms

    timed("xla fwd", lambda q: causal_attention(q, k, v, softmax_dtype=jnp.bfloat16))
    timed("packed fwd", lambda q: packed_causal_attention(q, k, v))
    timed(
        "xla fwd+grad",
        jax.grad(
            lambda q: jnp.sum(
                causal_attention(q, k, v, softmax_dtype=jnp.bfloat16).astype(
                    jnp.float32
                )
            )
        ),
    )
    timed(
        "packed fwd+grad",
        jax.grad(
            lambda q: jnp.sum(packed_causal_attention(q, k, v).astype(jnp.float32))
        ),
    )

    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all parity checks ok")


if __name__ == "__main__":
    main()
