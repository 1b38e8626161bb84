"""Ablate egnn_forward internals to localize the non-kernel cost.

The step breakdown (bench_step_breakdown.py) shows encode_points
fwd+grad at ~39 ms while the fused message kernel itself measures
~6 ms — this script varies one knob at a time (in-jit x8, same method
as the breakdown) to find where the rest goes: layer count slope vs
preamble intercept, instance norm, fused vs dense messages, scan vs
unrolled layers, remat.

Knobs: TRAIN_BATCH/TRAIN_ATOMS/TRAIN_DTYPE/TRAIN_PACKED as elsewhere.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from coati_tpu.models import egnn as E

ITERS = int(os.environ.get("BREAKDOWN_ITERS", 8))


def tree_scalar(tree):
    return jnp.sum(
        jnp.stack([jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(tree)])
    )


def timed(name, body, *args):
    def looped(*args):
        return lax.fori_loop(0, ITERS, lambda i, s: body(i, s, *args), jnp.float32(0.0))

    j = jax.jit(looped)
    np.asarray(j(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(j(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s}: {best / ITERS * 1000:7.2f} ms/iter")
    return best / ITERS * 1000


def main():
    batch = int(os.environ.get("TRAIN_BATCH", 160))
    n_atoms = int(os.environ.get("TRAIN_ATOMS", 96))
    dtype = os.environ.get("TRAIN_DTYPE", "bfloat16")
    packed = os.environ.get("TRAIN_PACKED", "1") == "1"
    print(f"device: {jax.devices()[0]}, B={batch} N={n_atoms} {dtype} packed={packed}")

    rng = np.random.default_rng(0)
    atoms = rng.integers(1, 9, size=(batch, n_atoms)).astype(np.int32)
    if packed:
        natoms = rng.integers(24, n_atoms + 1, size=(batch,))
        atoms[np.arange(n_atoms)[None, :] >= natoms[:, None]] = 0
    coords = rng.normal(size=(batch, n_atoms, 3)).astype(np.float32)
    atoms = jnp.asarray(atoms)
    coords = jnp.asarray(coords)

    def mk(**kw):
        cfg = E.EgnnConfig(
            hidden_nf=256, n_layers=kw.pop("n_layers", 5),
            message_cutoff=12.0, dtype=dtype, remat=kw.pop("remat", False),
            **kw,
        )
        params = E.init_egnn(jax.random.PRNGKey(0), cfg)
        return cfg, params

    def fwd_body(cfg):
        def body(i, s, p, at, co):
            co_i = jnp.roll(co, i, axis=0) * (1.0 + 0.0 * s)
            at_i = jnp.roll(at, i, axis=0)
            return s + jnp.sum(
                E.egnn_forward(p, cfg, at_i, co_i).astype(jnp.float32)
            )

        return body

    def grad_body(cfg):
        def loss(p, at, co):
            return jnp.sum(E.egnn_forward(p, cfg, at, co).astype(jnp.float32))

        def body(i, s, p, at, co):
            co_i = jnp.roll(co, i, axis=0) * (1.0 + 0.0 * s)
            at_i = jnp.roll(at, i, axis=0)
            val, g = jax.value_and_grad(loss)(p, at_i, co_i)
            return s + val + tree_scalar(g)

        return body

    results = {}
    for name, kw in [
        ("baseline (fused, norm, 5L)", {}),
        ("1 layer", {"n_layers": 1}),
        ("3 layers", {"n_layers": 3}),
        ("no instance_norm", {"instance_norm": False}),
        # dense without remat OOMs a v5e in the backward (5 saved
        # (B,N,N,H) residuals = 17.6 GB) — dense is only usable WITH it
        ("dense + remat", {"fused_messages": False, "remat": True}),
        ("fused + remat", {"remat": True}),
    ]:
        cfg, params = mk(**kw)
        results[name] = (
            timed(f"fwd  {name}", fwd_body(cfg), params, atoms, coords),
            timed(f"f+g  {name}", grad_body(cfg), params, atoms, coords),
        )

    b = results["baseline (fused, norm, 5L)"]
    l3 = results["3 layers"]
    l1 = results["1 layer"]
    print("\nderived:")
    print(f"  per-layer fwd slope (5L-3L)/2 : {(b[0] - l3[0]) / 2:.2f} ms")
    print(f"  per-layer f+g slope (5L-3L)/2 : {(b[1] - l3[1]) / 2:.2f} ms")
    print(f"  preamble+embed/dec intercept  : fwd {l1[0] - (b[0] - l3[0]) / 2:.2f} ms, "
          f"f+g {l1[1] - (b[1] - l3[1]) / 2:.2f} ms")


if __name__ == "__main__":
    main()
