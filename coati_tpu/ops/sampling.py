"""Token sampling primitives (top-k + inverse-temperature categorical).

The reference samples multinomial(softmax(topk_logits * inv_temp))
(coati/models/encoding/smiles_xformer.py:305-311). Masking logits outside
the top-k to -inf and drawing jax.random.categorical(inv_temp * logits)
yields the identical distribution, with fixed shapes (no gather of a
dynamic index set).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mask everything below the per-row k-th largest logit to -inf."""
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
    return jnp.where(logits >= kth, logits, neg_inf)


def sample_top_k(
    rng: jax.Array, logits: jnp.ndarray, k: int, inv_temp: float
) -> jnp.ndarray:
    """Draw token ids (...,) from the top-k filtered distribution."""
    filtered = top_k_filter(logits.astype(jnp.float32), k)
    return jax.random.categorical(rng, filtered * inv_temp, axis=-1)
