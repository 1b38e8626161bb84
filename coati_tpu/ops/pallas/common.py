"""Helpers shared by the Pallas kernels (egnn_messages,
flash_attention): zero-padding to tile multiples and the TPU-backend
predicate that gates kernel dispatch — one definition so every kernel
agrees on what counts as a TPU backend."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_to(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    """Zero-pad `axis` up to `size` (no-op if already large enough)."""
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def on_tpu() -> bool:
    """True on real TPU backends (incl. the axon dev tunnel)."""
    return jax.default_backend() in ("tpu", "axon")
