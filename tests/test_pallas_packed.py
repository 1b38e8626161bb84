"""Parity tests for the head-packed attention kernel
(ops/pallas/packed_attention.py) against the XLA reference formulation
— interpret mode on the CPU mesh; scripts/validate_pallas_packed.py pins
the compiled kernel (fwd AND the Pallas backward) on TPU.

The kernel exists as the realized form of "pack all heads into one
256-wide MXU contraction" — on the dev-tunnel v5e it measures AT the
same pass-count ceiling as XLA (PERF.md "attention pass-count floor"),
so auto never selects it at T <= 128; these tests keep the explicit
prefill_kernel="packed" path correct."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coati_tpu.ops.attention import causal_attention
from coati_tpu.ops.pallas.packed_attention import (
    packed_causal_attention,
    packed_supported,
)


def _qkv(key, b, t, h, dh, dtype=jnp.float32, n=3):
    ks = jax.random.split(key, n)
    shape = (b, t, h, dh)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


@pytest.mark.parametrize(
    "b,t,h,dh",
    [
        (4, 96, 16, 16),   # grande bench shape (C=256)
        (3, 80, 16, 16),   # grande train seq
        (2, 128, 8, 16),   # C=128 minimum lane width, T at the cap
        (5, 17, 4, 32),    # tiny ragged T, fat heads
    ],
)
def test_forward_parity(b, t, h, dh):
    q, k, v = _qkv(jax.random.PRNGKey(0), b, t, h, dh)
    ref = causal_attention(q, k, v, None, jnp.float32)
    out = packed_causal_attention(q, k, v, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_bf16_forward_parity():
    q, k, v = _qkv(jax.random.PRNGKey(1), 4, 96, 16, 16, jnp.bfloat16)
    ref = causal_attention(q, k, v, None, jnp.float32).astype(jnp.float32)
    out = packed_causal_attention(q, k, v, True).astype(jnp.float32)
    rel = np.abs(np.asarray(out - ref)).max() / np.abs(np.asarray(ref)).max()
    assert rel < 2e-2


@pytest.mark.parametrize("t", [96, 80, 33])
def test_pallas_backward_matches_xla(t):
    """Unlike flash, the VJP here is a PACKED PALLAS KERNEL — its grads
    must agree with the XLA f32-softmax grads to matmul rounding."""
    q, k, v, co = _qkv(jax.random.PRNGKey(2), 3, t, 16, 16, n=4)

    def loss_packed(q, k, v):
        return jnp.sum(packed_causal_attention(q, k, v, True) * co)

    def loss_ref(q, k, v):
        return jnp.sum(causal_attention(q, k, v, None, jnp.float32) * co)

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_backward_under_checkpoint():
    """jax.checkpoint over the kernel (the training remat path) must
    recompute through the custom VJP without error or drift."""
    q, k, v = _qkv(jax.random.PRNGKey(3), 2, 40, 8, 16)

    f = jax.checkpoint(
        lambda q, k, v: jnp.sum(packed_causal_attention(q, k, v, True) ** 2)
    )
    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(
        lambda q, k, v: jnp.sum(
            causal_attention(q, k, v, None, jnp.float32) ** 2
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_supported_predicate():
    assert packed_supported(96, 16, 16)
    assert packed_supported(128, 8, 16)
    assert not packed_supported(129, 16, 16)  # beyond the key stride
    assert not packed_supported(96, 16, 15)   # lanes not 128-aligned
    assert not packed_supported(96, 1, 256)   # single head: no packing


def test_config_routes_packed():
    """prefill_kernel='packed' flows through forward_hidden (interpret
    on CPU) and matches the XLA path; bad shapes reject loudly."""
    from coati_tpu.models.transformer import (
        TransformerConfig,
        forward_hidden,
        init_transformer,
    )

    cfg = TransformerConfig(
        n_layer=2, n_embd=128, n_head=8, n_seq=64, n_tok=64,
        prefill_kernel="packed",
    )
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (3, 48), 0, 64)
    out = forward_hidden(params, cfg, tokens)
    ref = forward_hidden(params, cfg.replace(prefill_kernel="xla"), tokens)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    bad = cfg.replace(n_seq=256, prefill_kernel="packed")
    with pytest.raises(ValueError, match="packed"):
        forward_hidden(
            params, bad,
            jax.random.randint(jax.random.PRNGKey(2), (2, 200), 0, 64),
        )
