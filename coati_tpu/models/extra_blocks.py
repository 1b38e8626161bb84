"""Non-rotary transformer blocks and learned positional embedding.

Completes the reference basic_transformer surface
(coati/models/encoding/basic_transformer.py:177-321: CausalSelfAttention/
Block, NonCausalSelfAttention/NonCausalBlock; smiles_xformer.py:25-47:
SimpleTokenEmbedding). The flagship models use the rotary blocks in
coati_tpu.models.transformer; these variants exist for API parity and
ablations.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from coati_tpu.ops.layers import (
    gelu_tanh,
    layer_norm,
    linear,
    torch_embedding_init,
    torch_linear_init,
)


@struct.dataclass
class SimpleTokenEmbeddingParams:
    """Joint learned token + positional embedding
    (smiles_xformer.py:25-47)."""

    tok_emb: jnp.ndarray  # (n_tok, D)
    pos_emb: jnp.ndarray  # (n_seq, D)


def init_simple_token_embedding(key, n_tok, n_seq, n_embd):
    k1, k2 = jax.random.split(key)
    return SimpleTokenEmbeddingParams(
        tok_emb=torch_embedding_init(k1, n_tok, n_embd),
        pos_emb=torch_embedding_init(k2, n_seq, n_embd),
    )


def simple_token_embedding(p: SimpleTokenEmbeddingParams, tokens: jnp.ndarray):
    t = tokens.shape[1]
    return p.tok_emb[tokens] + p.pos_emb[:t][None, :, :]


@struct.dataclass
class PlainBlockParams:
    ln1_scale: jnp.ndarray
    ln1_bias: jnp.ndarray
    w_attn: jnp.ndarray  # (D, 3D)
    b_attn: jnp.ndarray
    w_proj: jnp.ndarray
    b_proj: jnp.ndarray
    ln2_scale: jnp.ndarray
    ln2_bias: jnp.ndarray
    w_fc: jnp.ndarray
    b_fc: jnp.ndarray
    w_out: jnp.ndarray
    b_out: jnp.ndarray


def init_plain_block(key, n_embd: int) -> PlainBlockParams:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    w_attn, b_attn = torch_linear_init(k1, n_embd, 3 * n_embd)
    w_proj, b_proj = torch_linear_init(k2, n_embd, n_embd)
    w_fc, b_fc = torch_linear_init(k3, n_embd, 4 * n_embd)
    w_out, b_out = torch_linear_init(k4, 4 * n_embd, n_embd)
    ones = jnp.ones((n_embd,), jnp.float32)
    zeros = jnp.zeros((n_embd,), jnp.float32)
    return PlainBlockParams(
        ln1_scale=ones, ln1_bias=zeros,
        w_attn=w_attn, b_attn=b_attn, w_proj=w_proj, b_proj=b_proj,
        ln2_scale=jnp.ones((n_embd,), jnp.float32),
        ln2_bias=jnp.zeros((n_embd,), jnp.float32),
        w_fc=w_fc, b_fc=b_fc, w_out=w_out, b_out=b_out,
    )


def _self_attention(x, p: PlainBlockParams, n_head: int, causal: bool):
    b, t, d = x.shape
    dh = d // n_head
    qkv = linear(x, p.w_attn, p.b_attn)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, n_head, dh)
    k = k.reshape(b, t, n_head, dh)
    v = v.reshape(b, t, n_head, dh)
    scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    if causal:
        mask = jnp.tril(jnp.ones((t, t), bool))
        scores = jnp.where(mask[None, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    y = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, d)
    return linear(y, p.w_proj, p.b_proj)


def plain_block(x, p: PlainBlockParams, n_head: int, causal: bool = True):
    """Block / NonCausalBlock forward (basic_transformer.py:231-321)."""
    x = x + _self_attention(layer_norm(x, p.ln1_scale, p.ln1_bias), p, n_head, causal)
    y = layer_norm(x, p.ln2_scale, p.ln2_bias)
    return x + linear(gelu_tanh(linear(y, p.w_fc, p.b_fc)), p.w_out, p.b_out)


def convert_plain_block(sd, prefix: str = "") -> PlainBlockParams:
    """Convert a reference Block/NonCausalBlock state_dict."""
    import numpy as np

    from coati_tpu.models.convert import to_numpy

    def g(name, transpose=False):
        a = to_numpy(sd[f"{prefix}{name}"])
        return jnp.asarray(a.T if transpose else a)

    return PlainBlockParams(
        ln1_scale=g("ln_1.weight"), ln1_bias=g("ln_1.bias"),
        w_attn=g("attn.c_attn.weight", True), b_attn=g("attn.c_attn.bias"),
        w_proj=g("attn.c_proj.weight", True), b_proj=g("attn.c_proj.bias"),
        ln2_scale=g("ln_2.weight"), ln2_bias=g("ln_2.bias"),
        w_fc=g("mlpf.0.weight", True), b_fc=g("mlpf.0.bias"),
        w_out=g("mlpf.2.weight", True), b_out=g("mlpf.2.bias"),
    )
