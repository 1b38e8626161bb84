"""Elementary neural-net ops shared across models.

Pure functions over arrays; all shapes static. Numerics chosen to match
the reference torch modules (LayerNorm eps 1e-5; tanh-approx GELU —
coati/models/encoding/basic_transformer.py:12-28; torch-default init
distributions for from-scratch training).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

LN_EPS = 1e-5

_PRECISIONS = {
    "default": None,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def matmul_precision(name: str):
    return _PRECISIONS[name]


def cast_floats(tree, dtype):
    """Cast float32 leaves of a param pytree to the compute dtype
    (mixed precision: fp32 master weights, low-precision compute).
    No-op when dtype is float32."""
    if dtype == jnp.float32:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        tree,
    )


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """LayerNorm over the last axis, stats in float32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (y * scale + bias).astype(x.dtype)


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (y * scale).astype(x.dtype)


def instance_norm_lastdim(x: jnp.ndarray) -> jnp.ndarray:
    """Affine-free normalization over the last axis (matches how the
    reference applies torch InstanceNorm1d to (B, atoms, hidden) tensors:
    stats are taken over the trailing 'length' dim per (batch, atom))."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + LN_EPS)).astype(x.dtype)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """Tanh-approximated GELU (GPT-style 'NewGELU')."""
    return jax.nn.gelu(x, approximate=True)


def linear(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    precision: Optional[jax.lax.Precision] = None,
) -> jnp.ndarray:
    """x @ w (+ b). w is stored (in_features, out_features)."""
    y = jnp.matmul(x, w, precision=precision)
    if b is not None:
        y = y + b
    return y


def swiglu(x: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU gate over a doubled last dim: silu(gate) * value
    (value = first half, gate = second half — reference
    coati/models/simple_coati2/transformer_only.py:37-40)."""
    value, gate = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(gate) * value


# ------------------------------------------------------------------ init


def torch_linear_init(key, in_features: int, out_features: int, bias: bool = True):
    """torch.nn.Linear default init: U(±1/sqrt(fan_in)) for both W and b."""
    bound = 1.0 / math.sqrt(in_features)
    wk, bk = jax.random.split(key)
    w = jax.random.uniform(
        wk, (in_features, out_features), jnp.float32, -bound, bound
    )
    if not bias:
        return w, None
    b = jax.random.uniform(bk, (out_features,), jnp.float32, -bound, bound)
    return w, b


def torch_embedding_init(key, n_tok: int, n_embd: int):
    """torch.nn.Embedding default init: N(0, 1)."""
    return jax.random.normal(key, (n_tok, n_embd), jnp.float32)
