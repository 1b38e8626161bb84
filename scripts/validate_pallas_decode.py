import numpy as np, jax, jax.numpy as jnp, time
from coati_tpu.ops.pallas.decode_attention import decode_attention_pallas
from coati_tpu.ops.attention import decode_attention
rng = np.random.default_rng(0)
B, T, H, dh = 64, 128, 16, 16
q = jnp.asarray(rng.normal(size=(B,H,dh)), jnp.float32)
k = jnp.asarray(rng.normal(size=(B,T,H,dh)), jnp.float32)
v = jnp.asarray(rng.normal(size=(B,T,H,dh)), jnp.float32)
for pos in (5, 100):
    ref = np.asarray(decode_attention(q, k, v, jnp.asarray(pos)))
    mine = np.asarray(decode_attention_pallas(q, k, v, jnp.asarray(pos)))
    print(f"pos {pos}: compiled-TPU max diff {np.abs(mine-ref).max():.2e}")
