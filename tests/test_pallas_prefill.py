"""Parity tests for the fused prefill attention kernel
(ops/pallas/flash_attention.py) against the XLA reference formulation
(ops/attention.py causal_attention) — interpret mode on the CPU mesh;
scripts/validate_pallas_prefill.py pins the compiled kernel on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coati_tpu.ops.attention import causal_attention
from coati_tpu.ops.pallas.flash_attention import (
    flash_causal_attention,
    flash_supported,
)


def _qkv(key, b, t, h, dh, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    shape = (b, t, h, dh)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


@pytest.mark.parametrize(
    "b,t,h,dh",
    [
        (4, 96, 16, 16),   # grande bench shape (C=256)
        (3, 250, 16, 16),  # full n_seq, odd T (pads to 256) and odd B
        (2, 40, 8, 16),    # C=128 minimum lane width, T pads to 40->40
        (5, 17, 8, 16),    # tiny ragged T
    ],
)
def test_forward_parity(b, t, h, dh):
    q, k, v = _qkv(jax.random.PRNGKey(0), b, t, h, dh)
    ref = causal_attention(q, k, v, None, jnp.float32)
    out = flash_causal_attention(q, k, v, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_bf16_forward_parity():
    q, k, v = _qkv(jax.random.PRNGKey(1), 4, 96, 16, 16, jnp.bfloat16)
    ref = causal_attention(q, k, v, None, jnp.float32).astype(jnp.float32)
    out = flash_causal_attention(q, k, v, True).astype(jnp.float32)
    # bf16 inputs: kernel does f32 softmax like the reference path;
    # differences are bf16 matmul rounding only
    rel = np.abs(np.asarray(out - ref)).max() / np.abs(np.asarray(ref)).max()
    assert rel < 2e-2


def test_gradient_matches_xla():
    """The custom VJP replays the XLA path: grads must match the
    reference attention's grads exactly (same formulation)."""
    q, k, v = _qkv(jax.random.PRNGKey(2), 2, 64, 8, 16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_causal_attention(q, k, v, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(causal_attention(q, k, v, None, jnp.float32) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_trunk_selection_and_parity():
    """prefill_kernel='pallas' routes the whole trunk through the kernel
    (interpret fallback on CPU) and matches the 'xla' trunk."""
    from coati_tpu.models.transformer import (
        TransformerConfig,
        forward_hidden,
        init_transformer,
    )

    cfg = TransformerConfig(
        n_layer=2, n_embd=128, n_head=8, n_seq=64, n_tok=50
    )
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (3, 64), 0, 50)
    ref = forward_hidden(params, cfg.replace(prefill_kernel="xla"), tokens)
    out = forward_hidden(params, cfg.replace(prefill_kernel="pallas"), tokens)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_auto_selection_rules():
    # short T / narrow C never select the kernel; long T on TPU only
    assert not flash_supported(96, 16, 16)
    assert flash_supported(192, 16, 16)
    assert flash_supported(250, 16, 16)
    assert not flash_supported(250, 4, 16)  # C=64 < lane width


def test_pallas_forced_rejects_narrow_embd():
    from coati_tpu.models.transformer import (
        TransformerConfig,
        _prefill_backend,
    )

    cfg = TransformerConfig(n_embd=64, n_head=4, prefill_kernel="pallas")
    with pytest.raises(ValueError, match="n_embd"):
        _prefill_backend(cfg, 64)
