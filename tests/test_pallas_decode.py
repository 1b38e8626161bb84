"""Masked-read Pallas decode-attention kernel: interpret-mode equivalence
with the XLA path (compiled-TPU parity is checked by
scripts/ — ~7e-3 max logit deviation from single-pass bf16 MXU dots,
on par with the production bf16 decode path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coati_tpu.ops.attention import decode_attention
from coati_tpu.ops.pallas.decode_attention import decode_attention_pallas


@pytest.mark.parametrize("pos", [0, 5, 63, 127])
def test_interpret_matches_xla(pos):
    rng = np.random.default_rng(0)
    b, t, h, dh = 3, 128, 4, 16
    q = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, h, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h, dh)), jnp.float32)
    ref = np.asarray(decode_attention(q, k, v, jnp.asarray(pos)))
    mine = np.asarray(
        decode_attention_pallas(q, k, v, jnp.asarray(pos), interpret=True)
    )
    np.testing.assert_allclose(mine, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("t", [64, 96, 100])
def test_non_128_widths(t):
    """Real generation widths (64/96) take the single-block path; widths
    incompatible with sublane tiling fall back to the XLA kernel."""
    rng = np.random.default_rng(2)
    b, h, dh = 2, 2, 16
    q = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, h, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h, dh)), jnp.float32)
    for pos in (0, t // 2, t - 1):
        ref = np.asarray(decode_attention(q, k, v, jnp.asarray(pos)))
        mine = np.asarray(
            decode_attention_pallas(q, k, v, jnp.asarray(pos), interpret=True)
        )
        np.testing.assert_allclose(mine, ref, atol=1e-5, rtol=1e-5)


def test_multiblock_online_softmax():
    """T spanning multiple TILE_T blocks exercises the cross-block
    online-softmax accumulation."""
    rng = np.random.default_rng(1)
    b, t, h, dh = 2, 256, 2, 16
    q = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, h, dh)) * 3.0, jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h, dh)), jnp.float32)
    for pos in (10, 127, 128, 200, 255):
        ref = np.asarray(decode_attention(q, k, v, jnp.asarray(pos)))
        mine = np.asarray(
            decode_attention_pallas(q, k, v, jnp.asarray(pos), interpret=True)
        )
        np.testing.assert_allclose(mine, ref, atol=1e-5, rtol=1e-5)
