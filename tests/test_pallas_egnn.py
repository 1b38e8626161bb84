"""Fused EGNN message-kernel tests.

On CPU (the CI environment) the public entry point dispatches to the jnp
reference path — these tests pin the reference semantics, the custom-VJP
wiring, and the padding logic. The Pallas TPU path is exercised by
scripts/validate_pallas.py on real hardware (forward 1.5e-7 rel, grads
<= 1.1e-4 rel vs reference, recorded in that script's docstring).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coati_tpu.models.convert import convert_egnn
from coati_tpu.models.egnn import EgnnConfig, egnn_forward, init_egnn
from coati_tpu.ops.pallas.egnn_messages import (
    egnn_messages,
    egnn_messages_reference,
)


def make_inputs(b=3, n=11, hm=32, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(b, n, hm)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, n, hm)), jnp.float32),
        jnp.asarray(np.abs(rng.normal(size=(b, n, n))), jnp.float32),
        jnp.asarray(rng.uniform(size=(b, n, n)), jnp.float32),
        jnp.asarray(rng.normal(size=(hm,)), jnp.float32),
        jnp.asarray(rng.normal(size=(hm,)), jnp.float32),
        jnp.asarray(rng.normal(size=(hm, hm)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(hm,)), jnp.float32),
    )


def test_reference_matches_naive_dense():
    a, c, d2, w, wd, b1, w2, b2 = make_inputs()
    out = egnn_messages_reference(a, c, d2, w, wd, b1, w2, b2)
    # naive per-pair loop
    silu = jax.nn.silu
    naive = np.zeros(out.shape, np.float32)
    for bi in range(a.shape[0]):
        for i in range(a.shape[1]):
            for j in range(a.shape[1]):
                z1 = a[bi, i] + c[bi, j] + d2[bi, i, j] * wd + b1
                m = silu(silu(z1) @ w2 + b2)
                naive[bi, i] += np.asarray(w[bi, i, j] * m)
    np.testing.assert_allclose(np.asarray(out), naive, atol=1e-4, rtol=1e-4)


def test_custom_vjp_matches_autodiff():
    a, c, d2, w, wd, b1, w2, b2 = make_inputs(seed=1)

    def loss_fused(a, c, wd, b1, w2, b2):
        return jnp.sum(jnp.sin(egnn_messages(a, c, d2, w, wd, b1, w2, b2)))

    def loss_ref(a, c, wd, b1, w2, b2):
        return jnp.sum(
            jnp.sin(egnn_messages_reference(a, c, d2, w, wd, b1, w2, b2))
        )

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(a, c, wd, b1, w2, b2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(a, c, wd, b1, w2, b2)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4, rtol=1e-3)


def test_egnn_forward_fused_flag_equivalence():
    """fused_messages on/off must agree (CPU: both reach the dense path
    through different call graphs — guards the layer wiring)."""
    cfg_f = EgnnConfig(hidden_nf=32, n_layers=2, fused_messages=True, remat=False)
    cfg_d = EgnnConfig(hidden_nf=32, n_layers=2, fused_messages=False, remat=False)
    params = init_egnn(jax.random.PRNGKey(0), cfg_f)
    rng = np.random.default_rng(2)
    atoms = rng.integers(1, 9, size=(3, 9)).astype(np.int32)
    coords = rng.normal(size=(3, 9, 3)).astype(np.float32)
    a = egnn_forward(params, cfg_f, jnp.asarray(atoms), jnp.asarray(coords))
    b = egnn_forward(params, cfg_d, jnp.asarray(atoms), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
