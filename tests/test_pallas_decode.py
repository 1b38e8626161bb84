"""Masked-read Pallas decode-attention kernel: interpret-mode equivalence
with the XLA path (compiled-TPU parity is checked by
scripts/ — ~7e-3 max logit deviation from single-pass bf16 MXU dots,
on par with the production bf16 decode path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coati_tpu.ops.attention import decode_attention, decode_attention_quant
from coati_tpu.ops.pallas.decode_attention import (
    decode_attention_pallas,
    decode_attention_pallas_quant,
)


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


def test_batch_tiled_grid():
    """Batch sizes above TILE_B split into batch tiles; non-dividing
    batches fall back to smaller tiles (round-3 re-tiling, VERDICT r2
    item 3)."""
    rng = np.random.default_rng(3)
    t, h, dh = 128, 4, 16
    for b in (128, 96, 7):
        q = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, t, h, dh)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, t, h, dh)), jnp.float32)
        for pos in (0, 100):
            ref = np.asarray(decode_attention(q, k, v, jnp.asarray(pos)))
            mine = np.asarray(
                decode_attention_pallas(
                    q, k, v, jnp.asarray(pos), interpret=True
                )
            )
            np.testing.assert_allclose(mine, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("pos", [0, 60, 127, 200])
def test_quantized_cache_matches_xla_quant(pos):
    """The int8 path must agree with decode_attention_quant EXACTLY in
    interpret mode (same factoring: k-scales on scores, v-scales folded
    into probabilities) — the production cache format the kernel
    previously rejected."""
    from coati_tpu.models.transformer import quantize_kv

    rng = np.random.default_rng(4)
    b, t, h, dh = 128, 256, 4, 16
    q = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, h, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h, dh)), jnp.float32)
    k8, ks = quantize_kv(k)
    v8, vs = quantize_kv(v)
    ref = np.asarray(
        decode_attention_quant(q, k8, ks, v8, vs, jnp.asarray(pos))
    )
    mine = np.asarray(
        decode_attention_pallas_quant(
            q, k8, ks, v8, vs, jnp.asarray(pos), interpret=True
        )
    )
    np.testing.assert_allclose(mine, ref, atol=1e-4, rtol=1e-4)


def test_decode_step_routes_pallas_int8():
    """decode_step with decode_kernel='pallas' + int8 cache (the
    production decode configuration) must run and agree with the XLA
    int8 path token-for-token."""
    from coati_tpu.models.transformer import (
        TransformerConfig,
        decode_step,
        init_transformer,
        make_empty_cache,
    )

    cfg = TransformerConfig(
        n_layer=2, n_embd=64, n_head=4, n_seq=128, n_tok=64,
        kv_dtype="int8",
    )
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    token = jax.random.randint(jax.random.PRNGKey(1), (64,), 0, 64)
    logits = {}
    for kernel in ("xla", "pallas"):
        c = cfg.replace(decode_kernel=kernel)
        cache = make_empty_cache(c, 64)
        lg, cache = decode_step(params, c, token, jnp.asarray(0), cache)
        lg2, _ = decode_step(
            params, c, jnp.argmax(lg, -1), jnp.asarray(1), cache
        )
        logits[kernel] = np.asarray(lg2)
    np.testing.assert_allclose(
        logits["pallas"], logits["xla"], atol=1e-4, rtol=1e-4
    )


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
