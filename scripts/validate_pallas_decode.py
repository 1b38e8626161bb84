"""Compiled-TPU parity for the batch-tiled masked-read decode kernel:
bf16-pass rounding only (~7e-3, see tests/test_pallas_decode.py) vs the
XLA path, for both the plain and the int8+scales production cache
format, across batch tiles."""
import numpy as np, jax, jax.numpy as jnp  # noqa: E401
from coati_tpu.ops.pallas.decode_attention import (
    decode_attention_pallas,
    decode_attention_pallas_quant,
)
from coati_tpu.ops.attention import decode_attention, decode_attention_quant
from coati_tpu.models.transformer import quantize_kv

rng = np.random.default_rng(0)
B, T, H, dh = 192, 128, 16, 16  # B=192: three 64-row batch tiles
q = jnp.asarray(rng.normal(size=(B, H, dh)), jnp.float32)
k = jnp.asarray(rng.normal(size=(B, T, H, dh)), jnp.float32)
v = jnp.asarray(rng.normal(size=(B, T, H, dh)), jnp.float32)
for pos in (5, 100):
    ref = np.asarray(decode_attention(q, k, v, jnp.asarray(pos)))
    mine = np.asarray(decode_attention_pallas(q, k, v, jnp.asarray(pos)))
    print(f"pos {pos}: compiled-TPU max diff {np.abs(mine - ref).max():.2e}")

k8, ks = quantize_kv(k)
v8, vs = quantize_kv(v)
for pos in (5, 100):
    ref = np.asarray(decode_attention_quant(q, k8, ks, v8, vs, jnp.asarray(pos)))
    mine = np.asarray(
        decode_attention_pallas_quant(q, k8, ks, v8, vs, jnp.asarray(pos))
    )
    print(f"int8 pos {pos}: compiled-TPU max diff {np.abs(mine - ref).max():.2e}")
