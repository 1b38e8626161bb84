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


def top_k_filter(logits: jnp.ndarray, k: int, approx: bool = False) -> jnp.ndarray:
    """Mask everything below the per-row k-th largest logit to -inf.

    With approx=True the threshold comes from `lax.approx_max_k` — the
    TPU-native partial-reduction (~4-5x faster than the full-sort
    lax.top_k, which otherwise dominates decode time at SMILES vocab
    sizes). Its recall<1 can only LOWER the threshold, i.e. admit a few
    extra candidates beyond k — a negligible softening of top-k sampling.
    """
    if approx:
        kth = jax.lax.approx_max_k(logits, k)[0][..., -1:]
    else:
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
    neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
    return jnp.where(logits >= kth, logits, neg_inf)


def sample_top_k(
    rng: jax.Array,
    logits: jnp.ndarray,
    k: int,
    inv_temp: float,
    approx: bool = False,
) -> jnp.ndarray:
    """Draw token ids (...,) from the top-k filtered distribution."""
    filtered = top_k_filter(logits.astype(jnp.float32), k, approx=approx)
    return jax.random.categorical(rng, filtered * inv_temp, axis=-1)
