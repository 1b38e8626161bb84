"""Rotary position embedding (RoPE), eq. (34) of arXiv:2104.09864.

Numerics match the reference (coati/models/encoding/basic_transformer.py:31-100):
rotation applied after head split over head_dim, with cached
cos/sin = f(position) of shape (n_seq, head_dim) built from
inv_freq = base^(-2i/head_dim) and emb = concat(freqs, freqs).
"""

from __future__ import annotations

import jax.numpy as jnp


def rotary_tables(n_seq: int, head_dim: int, base: float = 10000.0):
    """Return (cos, sin), each (n_seq, head_dim), float32."""
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(n_seq, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (..., T, head_dim); cos/sin: broadcastable (T, head_dim)."""
    return x * cos + rotate_half(x) * sin
