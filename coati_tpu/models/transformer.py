"""Causal rotary SMILES transformer — the COATI decoder/encoder trunk.

Functional JAX re-design of the reference RotarySmilesTransformer
(coati/models/encoding/smiles_xformer.py:71; blocks at
coati/models/encoding/basic_transformer.py:103-174). Differences by design:

  * parameters are flax.struct pytrees with all layers STACKED along a
    leading axis and executed with `lax.scan` — one compiled block body,
    fast XLA compiles, trivially shardable;
  * `encode` gathers the [STOP]-position hidden state with a fixed-shape
    one-hot contraction instead of boolean indexing (TPU-friendly);
  * soft-token injection (ClipCap-style, reference
    smiles_xformer.py:426-454) is a `jnp.where` over the embedded
    sequence, not an in-place scatter;
  * generation lives in coati_tpu.models.sampler with a fused KV-cache
    decode loop (the reference re-runs the full prefix per token).

Weight layout note: all linear weights are stored (in_features,
out_features) = transposed torch layout.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from coati_tpu.ops.attention import (
    causal_attention,
    decode_attention,
    decode_attention_quant,
    decode_attention_quant_ragged,
    decode_attention_quant_ring,
    decode_attention_ragged,
    decode_attention_ring,
)
from coati_tpu.ops.layers import (
    cast_floats,
    gelu_tanh,
    layer_norm,
    linear,
    matmul_precision,
    torch_embedding_init,
    torch_linear_init,
)
from coati_tpu.ops.rotary import apply_rotary, rotary_tables


@struct.dataclass
class TransformerConfig:
    n_layer: int = struct.field(pytree_node=False, default=4)
    n_embd: int = struct.field(pytree_node=False, default=128)
    n_head: int = struct.field(pytree_node=False, default=4)
    n_seq: int = struct.field(pytree_node=False, default=256)
    n_tok: int = struct.field(pytree_node=False, default=100)
    biases: bool = struct.field(pytree_node=False, default=True)
    norm_embed: bool = struct.field(pytree_node=False, default=False)
    # compute dtype for activations ("float32" | "bfloat16")
    dtype: str = struct.field(pytree_node=False, default="float32")
    # matmul precision ("default" fast on MXU, "highest" for parity)
    precision: str = struct.field(pytree_node=False, default="default")
    # KV-cache storage. Decode is bandwidth-bound on cache reads, so
    # int8 (per-token, per-head symmetric quantization) halves the
    # per-step traffic. Values:
    #   "auto"   — production default: int8 under bfloat16 compute
    #              (quality-validated on a trained model,
    #              scripts/eval_int8_decode.py: 100% round-trip and
    #              token agreement vs fp32), else the compute dtype.
    #              Composes with either decode kernel (the pallas
    #              masked-read kernel streams the int8 data + scale
    #              format directly since round 3).
    #   "int8"   — always quantize
    #   "compute"— always match the compute dtype (no quantization)
    kv_dtype: str = struct.field(pytree_node=False, default="auto")
    # int8-cache scale storage ("float32" | "bfloat16"): scales are
    # (L, 2, B, T, H) and ~20% of int8 decode traffic; bf16 halves that
    # at ~0.4% relative scale error on top of int8's ~0.8%
    kv_scale_dtype: str = struct.field(pytree_node=False, default="float32")
    # decode attention backend: "xla" (default) or "pallas" (masked-read
    # flash-decode kernel, ops/pallas/decode_attention.py — reads only
    # cache blocks <= pos; enable on production TPUs, the dev tunnel's
    # per-grid-step overhead negates the saving)
    decode_kernel: str = struct.field(pytree_node=False, default="xla")
    # rematerialize block activations in the backward pass (trades ~30%
    # more forward FLOPs for O(layers) less activation HBM — required for
    # wide models like COATI2-grande at training batch sizes, and a net
    # WIN for the grande train step even where memory fits: the scan
    # backward otherwise stores f32 attention probs per layer, PERF.md)
    remat: bool = struct.field(pytree_node=False, default=False)
    # training-attention softmax dtype: "float32" (oracle parity) or
    # "compute" (softmax runs in the compute dtype — with bf16 compute
    # this removes the f32 (B,H,T,T) probs tensor from the fwd AND the
    # scan-saved residuals; ~0.4% prob error, training-quality neutral
    # at these seq lengths, -16% trunk fwd+grad; PERF.md)
    softmax_dtype: str = struct.field(pytree_node=False, default="float32")
    # full-sequence attention backend:
    #   "auto"   — on TPU, the flash kernel (ops/pallas/flash_attention
    #              .py — no (B,H,T,T) probs in HBM) for T >= 192 where
    #              traffic dominates (-35%/layer); XLA below — T <= 128
    #              attention is at a measured PASS-COUNT CEILING that no
    #              formulation beats (PERF.md "attention pass-count
    #              floor": XLA/flash/head-packed all within ~15%).
    #   "xla" / "pallas" / "packed" — force one path ("pallas" = flash,
    #              "packed" = the head-packed kernel,
    #              ops/pallas/packed_attention.py, whose VJP is a Pallas
    #              kernel too — kept for hardware with different pass
    #              economics).
    prefill_kernel: str = struct.field(pytree_node=False, default="auto")
    # lax.approx_max_k recall target for the decode sampler's top-k
    # (ops/sampling.py): the TPU partial-reduction's cost scales
    # steeply with the target (1.06 ms/step at 0.95 vs 0.45 at 0.80,
    # B=1024 x 13,603 vocab — sampling was 1/3 of the decode step;
    # 0.80 is +23% decode throughput end-to-end). Per-block maxima
    # always survive, so greedy/near-greedy decoding is unaffected.
    # PRODUCTION DEFAULT 0.8 on the strength of the trained-model eval
    # (scripts/eval_int8_decode.py: 100% round-trip, 100% token
    # agreement vs fp32, and candidate-set softmax mass 1.000000 at
    # inv_temp=2 k=100 — trained SMILES logits are so peaked that the
    # recall target's tail swaps carry ~zero probability). Raise toward
    # 1.0 for untrained/flat-logit regimes.
    topk_recall: float = struct.field(pytree_node=False, default=0.8)

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def mm_precision(self):
        return matmul_precision(self.precision)

    @property
    def kv_quantized(self) -> bool:
        """Whether decode caches store int8 (see kv_dtype)."""
        if self.kv_dtype == "int8":
            return True
        if self.kv_dtype == "compute":
            return False
        if self.kv_dtype != "auto":
            raise ValueError(
                f"kv_dtype must be 'auto', 'int8' or 'compute', got "
                f"{self.kv_dtype!r}"
            )
        return self.dtype == "bfloat16"

    @property
    def attn_softmax_dtype(self):
        if self.softmax_dtype == "compute":
            return self.compute_dtype
        if self.softmax_dtype != "float32":
            raise ValueError(
                f"softmax_dtype must be 'float32' or 'compute', got "
                f"{self.softmax_dtype!r}"
            )
        return jnp.float32


@struct.dataclass
class BlockParams:
    """One (or a stack of) transformer block(s); leading axis = layer."""

    ln1_scale: jnp.ndarray
    ln1_bias: jnp.ndarray
    w_attn: jnp.ndarray  # (L, D, 3D)
    b_attn: Optional[jnp.ndarray]
    w_proj: jnp.ndarray  # (L, D, D)
    b_proj: Optional[jnp.ndarray]
    ln2_scale: jnp.ndarray
    ln2_bias: jnp.ndarray
    w_fc: jnp.ndarray  # (L, D, 4D)
    b_fc: Optional[jnp.ndarray]
    w_out: jnp.ndarray  # (L, 4D, D)
    b_out: Optional[jnp.ndarray]


@struct.dataclass
class TransformerParams:
    tok_emb: jnp.ndarray  # (n_tok, D)
    blocks: BlockParams
    lnf_scale: jnp.ndarray
    lnf_bias: jnp.ndarray
    lm_head: jnp.ndarray  # (D, n_tok)
    norm_embed_scale: Optional[jnp.ndarray] = None
    norm_embed_bias: Optional[jnp.ndarray] = None


def init_transformer(key: jax.Array, cfg: TransformerConfig) -> TransformerParams:
    """Initialize with torch-default distributions (training parity)."""
    d, layers = cfg.n_embd, cfg.n_layer
    keys = jax.random.split(key, 4 * layers + 2)

    def stack(fn):
        return jnp.stack([fn(i) for i in range(layers)])

    w_attn = stack(lambda i: torch_linear_init(keys[4 * i], d, 3 * d, cfg.biases)[0])
    b_attn = (
        stack(lambda i: torch_linear_init(keys[4 * i], d, 3 * d, True)[1])
        if cfg.biases
        else None
    )
    w_proj = stack(lambda i: torch_linear_init(keys[4 * i + 1], d, d, cfg.biases)[0])
    b_proj = (
        stack(lambda i: torch_linear_init(keys[4 * i + 1], d, d, True)[1])
        if cfg.biases
        else None
    )
    w_fc = stack(lambda i: torch_linear_init(keys[4 * i + 2], d, 4 * d, cfg.biases)[0])
    b_fc = (
        stack(lambda i: torch_linear_init(keys[4 * i + 2], d, 4 * d, True)[1])
        if cfg.biases
        else None
    )
    w_out = stack(lambda i: torch_linear_init(keys[4 * i + 3], 4 * d, d, cfg.biases)[0])
    b_out = (
        stack(lambda i: torch_linear_init(keys[4 * i + 3], 4 * d, d, True)[1])
        if cfg.biases
        else None
    )
    def ones():
        # fresh buffer per field: sharing one array across params breaks
        # donation (the same buffer would be donated twice)
        return jnp.ones((layers, d), jnp.float32)

    def zeros():
        return jnp.zeros((layers, d), jnp.float32)

    blocks = BlockParams(
        ln1_scale=ones(), ln1_bias=zeros(),
        w_attn=w_attn, b_attn=b_attn, w_proj=w_proj, b_proj=b_proj,
        ln2_scale=ones(), ln2_bias=zeros(),
        w_fc=w_fc, b_fc=b_fc, w_out=w_out, b_out=b_out,
    )
    return TransformerParams(
        tok_emb=torch_embedding_init(keys[-2], cfg.n_tok, d),
        blocks=blocks,
        lnf_scale=jnp.ones((d,), jnp.float32),
        lnf_bias=jnp.zeros((d,), jnp.float32),
        lm_head=torch_linear_init(keys[-1], d, cfg.n_tok, bias=False)[0],
        norm_embed_scale=jnp.ones((d,), jnp.float32) if cfg.norm_embed else None,
        norm_embed_bias=jnp.zeros((d,), jnp.float32) if cfg.norm_embed else None,
    )


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


# --------------------------------------------------------------- embedding


def embed_tokens(
    params: TransformerParams,
    cfg: TransformerConfig,
    tokens: jnp.ndarray,
    injection: Optional[jnp.ndarray] = None,
    inject_token: Optional[int] = None,
) -> jnp.ndarray:
    """Token embedding with optional per-row soft-token injection over
    every occurrence of `inject_token` (reference smiles_xformer.py:444-448:
    x[hole] = injection[row])."""
    x = params.tok_emb[tokens]
    if params.norm_embed_scale is not None:
        x = layer_norm(x, params.norm_embed_scale, params.norm_embed_bias)
    if injection is not None:
        holes = (tokens == inject_token)[..., None]
        x = jnp.where(holes, injection[:, None, :].astype(x.dtype), x)
    return x.astype(cfg.compute_dtype)


# ---------------------------------------------------------- full forward


def _prefill_backend(cfg: TransformerConfig, t: int) -> str:
    """Static (trace-time) choice of the full-sequence attention backend
    ("xla" | "flash" | "packed") — see TransformerConfig.prefill_kernel."""
    if cfg.prefill_kernel == "xla":
        return "xla"
    from coati_tpu.ops.pallas.flash_attention import flash_supported, on_tpu
    from coati_tpu.ops.pallas.packed_attention import packed_supported

    if cfg.prefill_kernel in ("pallas", "packed"):
        if (cfg.n_embd % 128) != 0:
            raise ValueError(
                f"prefill_kernel={cfg.prefill_kernel!r} needs n_embd % 128 "
                f"== 0 (lane tiling), got {cfg.n_embd}"
            )
        if cfg.prefill_kernel == "packed" and not packed_supported(
            t, cfg.n_head, cfg.head_dim
        ):
            raise ValueError(
                f"prefill_kernel='packed' needs T <= 128 and n_head > 1, "
                f"got T={t}, n_head={cfg.n_head}"
            )
        return "flash" if cfg.prefill_kernel == "pallas" else "packed"
    if cfg.prefill_kernel != "auto":
        raise ValueError(
            f"prefill_kernel must be 'auto', 'xla', 'pallas' or 'packed', "
            f"got {cfg.prefill_kernel!r}"
        )
    if cfg.precision != "default":
        # parity configs (precision="highest") need full-f32 matmul
        # passes, which the kernels' dot_generals don't honor — auto
        # never trades parity for speed; force with "pallas"/"packed"
        return "xla"
    if not on_tpu():
        return "xla"
    if flash_supported(t, cfg.n_head, cfg.head_dim):
        return "flash"
    # measured CEILING, not an oversight: at T <= 128 every formulation
    # (XLA einsum, flash, head-packed — see scripts/probe_packed_attention
    # .py + PERF.md "attention pass-count floor") sits within ~15% of the
    # same per-pass floor, with XLA fastest — auto keeps XLA; "packed"
    # stays available for hardware with different pass economics.
    return "xla"


def _block_full(x, blk: BlockParams, cfg: TransformerConfig, cos, sin):
    """One block over a full sequence. x: (B, T, D)."""
    b, t, d = x.shape
    h, dh = cfg.n_head, cfg.head_dim
    prec = cfg.mm_precision

    y = layer_norm(x, blk.ln1_scale, blk.ln1_bias)
    qkv = linear(y, blk.w_attn, blk.b_attn, prec)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, h, dh)
    k = k.reshape(b, t, h, dh)
    v = v.reshape(b, t, h, dh)
    # rotary over positions [0, t): cos/sin broadcast (T, Dh) -> (B, T, H, Dh)
    q = apply_rotary(q, cos[:t, None, :], sin[:t, None, :])
    k = apply_rotary(k, cos[:t, None, :], sin[:t, None, :])
    backend = _prefill_backend(cfg, t)
    if backend == "flash":
        from coati_tpu.ops.pallas.flash_attention import flash_causal_attention

        attn = flash_causal_attention(q, k, v).reshape(b, t, d)
    elif backend == "packed":
        from coati_tpu.ops.pallas.packed_attention import (
            packed_causal_attention,
        )

        attn = packed_causal_attention(q, k, v).reshape(b, t, d)
    else:
        attn = causal_attention(
            q, k, v, prec, softmax_dtype=cfg.attn_softmax_dtype
        ).reshape(b, t, d)
    x = x + linear(attn, blk.w_proj, blk.b_proj, prec)

    y = layer_norm(x, blk.ln2_scale, blk.ln2_bias)
    y = gelu_tanh(linear(y, blk.w_fc, blk.b_fc, prec))
    x = x + linear(y, blk.w_out, blk.b_out, prec)
    return x


def forward_hidden(
    params: TransformerParams,
    cfg: TransformerConfig,
    tokens: jnp.ndarray,
    injection: Optional[jnp.ndarray] = None,
    inject_token: Optional[int] = None,
) -> jnp.ndarray:
    """Full forward through all blocks + final LN. tokens: (B, T) -> (B, T, D)."""
    params = cast_floats(params, cfg.compute_dtype)
    cos, sin = rotary_tables(cfg.n_seq, cfg.head_dim)
    cos = cos.astype(cfg.compute_dtype)
    sin = sin.astype(cfg.compute_dtype)
    x = embed_tokens(params, cfg, tokens, injection, inject_token)

    def body(x, blk):
        return _block_full(x, blk, cfg, cos, sin), None

    if cfg.remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params.blocks)
    return layer_norm(x, params.lnf_scale, params.lnf_bias)


def forward_logits(
    params: TransformerParams,
    cfg: TransformerConfig,
    tokens: jnp.ndarray,
    injection: Optional[jnp.ndarray] = None,
    inject_token: Optional[int] = None,
) -> jnp.ndarray:
    """(B, T) -> (B, T, n_tok). With injection this is the reference's
    forward_with_replacement (smiles_xformer.py:426)."""
    x = forward_hidden(params, cfg, tokens, injection, inject_token)
    return linear(x, params.lm_head, None, cfg.mm_precision)


def stop_token_hidden(
    hidden: jnp.ndarray, tokens: jnp.ndarray, stop_token: int
) -> jnp.ndarray:
    """Hidden state at the first [STOP] position per row, as a fixed-shape
    one-hot contraction (reference get_stop_token_embs,
    smiles_xformer.py:50-68, requires exactly one stop per row)."""
    t = tokens.shape[1]
    stop_pos = jnp.argmax(tokens == stop_token, axis=1)  # (B,)
    onehot = jax.nn.one_hot(stop_pos, t, dtype=hidden.dtype)
    return jnp.einsum("bt,btd->bd", onehot, hidden)


def encode(
    params: TransformerParams,
    cfg: TransformerConfig,
    tokens: jnp.ndarray,
    stop_token: int,
) -> jnp.ndarray:
    """(B, T) -> (B, D): hidden state at [STOP] (reference encode,
    smiles_xformer.py:106-112)."""
    hidden = forward_hidden(params, cfg, tokens)
    return stop_token_hidden(hidden, tokens, stop_token)


def forward_with_stop_emb(
    params: TransformerParams,
    cfg: TransformerConfig,
    tokens: jnp.ndarray,
    stop_token: int,
    injection: Optional[jnp.ndarray] = None,
    inject_token: Optional[int] = None,
):
    """(logits, stop_hidden) in one pass (smiles_xformer.py:384-424)."""
    hidden = forward_hidden(params, cfg, tokens, injection, inject_token)
    logits = linear(hidden, params.lm_head, None, cfg.mm_precision)
    return logits, stop_token_hidden(hidden, tokens, stop_token)


# ----------------------------------------------------------- decode step


@struct.dataclass
class KVCache:
    """(L, 2, B, T, H, Dh) key/value storage; `scale` is the per
    (layer, kv, batch, position, head) dequantization factor when data is
    int8, else None."""

    data: jnp.ndarray
    scale: Optional[jnp.ndarray] = None


def quantize_kv(x: jnp.ndarray):
    """Symmetric per-(…, head) int8 quantization over the head dim.
    x: (..., H, Dh) -> (int8 data, f32 scale (..., H))."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def make_empty_cache(
    cfg: TransformerConfig, batch: int, width: Optional[int] = None, dtype=None
) -> KVCache:
    """KV cache sized (L, 2, B, width, H, Dh). Decode is bandwidth-bound
    on cache reads, so size the width to the actual generation length
    rather than cfg.n_seq when possible."""
    width = width or cfg.n_seq
    shape = (cfg.n_layer, 2, batch, width, cfg.n_head, cfg.head_dim)
    if cfg.kv_quantized:
        scale_dtype = (
            jnp.bfloat16 if cfg.kv_scale_dtype == "bfloat16" else jnp.float32
        )
        return KVCache(
            data=jnp.zeros(shape, jnp.int8),
            scale=jnp.zeros(shape[:-1], scale_dtype),
        )
    dtype = dtype or cfg.compute_dtype
    return KVCache(data=jnp.zeros(shape, dtype), scale=None)


def prefill(
    params: TransformerParams,
    cfg: TransformerConfig,
    tokens: jnp.ndarray,
    injection: Optional[jnp.ndarray] = None,
    inject_token: Optional[int] = None,
    cache: Optional[jnp.ndarray] = None,
):
    """Run the full prefix once, filling the KV cache.

    tokens: (B, P). Returns (hidden (B, P, D), cache) where cache holds
    rotated K and V for positions [0, P).
    """
    b, p = tokens.shape
    h, dh = cfg.n_head, cfg.head_dim
    prec = cfg.mm_precision
    params = cast_floats(params, cfg.compute_dtype)
    cos, sin = rotary_tables(cfg.n_seq, cfg.head_dim)
    cos = cos.astype(cfg.compute_dtype)
    sin = sin.astype(cfg.compute_dtype)
    if cache is None:
        cache = make_empty_cache(cfg, b)
    quantized = cache.scale is not None

    x = embed_tokens(params, cfg, tokens, injection, inject_token)

    def body(x, inputs):
        blk, layer_data, layer_scale = inputs
        y = layer_norm(x, blk.ln1_scale, blk.ln1_bias)
        qkv = linear(y, blk.w_attn, blk.b_attn, prec)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = apply_rotary(q.reshape(b, p, h, dh), cos[:p, None, :], sin[:p, None, :])
        k = apply_rotary(k.reshape(b, p, h, dh), cos[:p, None, :], sin[:p, None, :])
        v = v.reshape(b, p, h, dh)
        if quantized:
            k8, ks = quantize_kv(k)
            v8, vs = quantize_kv(v)
            layer_data = layer_data.at[0, :, :p].set(k8)
            layer_data = layer_data.at[1, :, :p].set(v8)
            layer_scale = layer_scale.at[0, :, :p].set(ks.astype(layer_scale.dtype))
            layer_scale = layer_scale.at[1, :, :p].set(vs.astype(layer_scale.dtype))
        else:
            layer_data = layer_data.at[0, :, :p].set(k.astype(layer_data.dtype))
            layer_data = layer_data.at[1, :, :p].set(v.astype(layer_data.dtype))
        # prefill attention uses the exact (unquantized) K/V
        attn = causal_attention(q, k, v, prec).reshape(b, p, cfg.n_embd)
        x = x + linear(attn, blk.w_proj, blk.b_proj, prec)
        y = layer_norm(x, blk.ln2_scale, blk.ln2_bias)
        x = x + linear(gelu_tanh(linear(y, blk.w_fc, blk.b_fc, prec)), blk.w_out, blk.b_out, prec)
        return x, (layer_data, layer_scale)

    scale_in = cache.scale if quantized else jnp.zeros((cfg.n_layer, 0))
    x, (data, scale) = jax.lax.scan(
        body, x, (params.blocks, cache.data, scale_in)
    )
    hidden = layer_norm(x, params.lnf_scale, params.lnf_bias)
    return hidden, KVCache(data=data, scale=scale if quantized else None)


def decode_step(
    params: TransformerParams,
    cfg: TransformerConfig,
    token: jnp.ndarray,
    pos: jnp.ndarray,
    cache: jnp.ndarray,
):
    """One autoregressive step: embed `token` (B,), attend at position
    `pos` (scalar) against the cache, return (logits (B, V), new cache).

    PERFORMANCE NOTE: layers are unrolled statically and the cache is
    updated with dynamic_update_slice at a STATIC layer index / dynamic
    position. Inside the sampler's while_loop this is the pattern XLA
    recognizes for in-place buffer updates; routing the cache through a
    lax.scan instead forces a full copy of the (L, 2, B, T, H, Dh) cache
    every token (~8x slower at grande scale)."""
    b = token.shape[0]
    h, dh = cfg.n_head, cfg.head_dim
    prec = cfg.mm_precision
    params = cast_floats(params, cfg.compute_dtype)
    cos_t, sin_t = rotary_tables(cfg.n_seq, cfg.head_dim)
    cos1 = jax.lax.dynamic_index_in_dim(cos_t, pos, 0, keepdims=False).astype(
        cfg.compute_dtype
    )
    sin1 = jax.lax.dynamic_index_in_dim(sin_t, pos, 0, keepdims=False).astype(
        cfg.compute_dtype
    )

    x = params.tok_emb[token]
    if params.norm_embed_scale is not None:
        x = layer_norm(x, params.norm_embed_scale, params.norm_embed_bias)
    x = x.astype(cfg.compute_dtype)  # (B, D)

    quantized = cache.scale is not None
    data, scale_arr = cache.data, cache.scale
    blocks = params.blocks
    for layer in range(cfg.n_layer):
        blk = jax.tree_util.tree_map(lambda a: a[layer], blocks)
        y = layer_norm(x, blk.ln1_scale, blk.ln1_bias)
        qkv = linear(y, blk.w_attn, blk.b_attn, prec)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = apply_rotary(q.reshape(b, h, dh), cos1, sin1)
        k = apply_rotary(k.reshape(b, h, dh), cos1, sin1)
        v = v.reshape(b, h, dh)
        if quantized:
            k8, ks = quantize_kv(k)
            v8, vs = quantize_kv(v)
            data = jax.lax.dynamic_update_slice(
                data, k8[None, None, :, None], (layer, 0, 0, pos, 0, 0)
            )
            data = jax.lax.dynamic_update_slice(
                data, v8[None, None, :, None], (layer, 1, 0, pos, 0, 0)
            )
            scale_arr = jax.lax.dynamic_update_slice(
                scale_arr,
                ks.astype(scale_arr.dtype)[None, None, :, None],
                (layer, 0, 0, pos, 0),
            )
            scale_arr = jax.lax.dynamic_update_slice(
                scale_arr,
                vs.astype(scale_arr.dtype)[None, None, :, None],
                (layer, 1, 0, pos, 0),
            )
            if cfg.decode_kernel == "pallas":
                from coati_tpu.ops.pallas.decode_attention import (
                    decode_attention_pallas_quant,
                )

                attn = decode_attention_pallas_quant(
                    q,
                    data[layer, 0],
                    scale_arr[layer, 0],
                    data[layer, 1],
                    scale_arr[layer, 1],
                    pos,
                )
            else:
                attn = decode_attention_quant(
                    q,
                    data[layer, 0],
                    scale_arr[layer, 0],
                    data[layer, 1],
                    scale_arr[layer, 1],
                    pos,
                )
        else:
            k = k.astype(data.dtype)
            data = jax.lax.dynamic_update_slice(
                data, k[None, None, :, None], (layer, 0, 0, pos, 0, 0)
            )
            data = jax.lax.dynamic_update_slice(
                data, v.astype(data.dtype)[None, None, :, None], (layer, 1, 0, pos, 0, 0)
            )
            if cfg.decode_kernel == "pallas":
                from coati_tpu.ops.pallas.decode_attention import (
                    decode_attention_pallas,
                )

                attn = decode_attention_pallas(
                    q, data[layer, 0], data[layer, 1], pos
                )
            else:
                attn = decode_attention(
                    q, data[layer, 0], data[layer, 1], pos, prec
                )
        x = x + linear(attn.reshape(b, cfg.n_embd), blk.w_proj, blk.b_proj, prec)
        y = layer_norm(x, blk.ln2_scale, blk.ln2_bias)
        x = x + linear(
            gelu_tanh(linear(y, blk.w_fc, blk.b_fc, prec)), blk.w_out, blk.b_out, prec
        )
    x = layer_norm(x, params.lnf_scale, params.lnf_bias)
    logits = linear(x, params.lm_head, None, prec)
    return logits, KVCache(data=data, scale=scale_arr)


def decode_step_ring(
    params: TransformerParams,
    cfg: TransformerConfig,
    token: jnp.ndarray,  # (B,)
    lpos: jnp.ndarray,  # (B,) int32 — per-row LOGICAL positions
    ring_pos: jnp.ndarray,  # scalar int32 — ring slot to write
    cache: KVCache,
):
    """Ring-buffer decode step — the continuous-batching engine's hot
    loop (serving/continuous.py). Rows sit at different logical depths,
    but every row writes its K/V at the SAME ring slot `ring_pos`, so
    the cache update is the scalar-position dynamic_update_slice XLA
    aliases in place (the per-row-position scatter variant,
    decode_step_ragged, measured ~12x slower per token at pool scale:
    the batched scatter copies the cache). Per-row state enters only
    through cheap primitives: rotary tables gathered at lpos, and the
    attention mask from ring-age arithmetic (decode_attention_ring).
    Token-for-token equal to decode_step when positions are uniform and
    the ring hasn't wrapped (tested)."""
    b = token.shape[0]
    h, dh = cfg.n_head, cfg.head_dim
    prec = cfg.mm_precision
    params = cast_floats(params, cfg.compute_dtype)
    cos_t, sin_t = rotary_tables(cfg.n_seq, cfg.head_dim)
    lpos_c = jnp.clip(lpos, 0, cfg.n_seq - 1)
    cos_r = cos_t[lpos_c].astype(cfg.compute_dtype)[:, None, :]  # (B, 1, Dh)
    sin_r = sin_t[lpos_c].astype(cfg.compute_dtype)[:, None, :]

    x = params.tok_emb[token]
    if params.norm_embed_scale is not None:
        x = layer_norm(x, params.norm_embed_scale, params.norm_embed_bias)
    x = x.astype(cfg.compute_dtype)  # (B, D)

    quantized = cache.scale is not None
    data, scale_arr = cache.data, cache.scale
    for layer in range(cfg.n_layer):
        blk = jax.tree_util.tree_map(lambda a: a[layer], params.blocks)
        y = layer_norm(x, blk.ln1_scale, blk.ln1_bias)
        qkv = linear(y, blk.w_attn, blk.b_attn, prec)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = apply_rotary(q.reshape(b, h, dh), cos_r, sin_r)
        k = apply_rotary(k.reshape(b, h, dh), cos_r, sin_r)
        v = v.reshape(b, h, dh)
        if quantized:
            k8, ks = quantize_kv(k)
            v8, vs = quantize_kv(v)
            data = jax.lax.dynamic_update_slice(
                data, k8[None, None, :, None], (layer, 0, 0, ring_pos, 0, 0)
            )
            data = jax.lax.dynamic_update_slice(
                data, v8[None, None, :, None], (layer, 1, 0, ring_pos, 0, 0)
            )
            scale_arr = jax.lax.dynamic_update_slice(
                scale_arr,
                ks.astype(scale_arr.dtype)[None, None, :, None],
                (layer, 0, 0, ring_pos, 0),
            )
            scale_arr = jax.lax.dynamic_update_slice(
                scale_arr,
                vs.astype(scale_arr.dtype)[None, None, :, None],
                (layer, 1, 0, ring_pos, 0),
            )
            attn = decode_attention_quant_ring(
                q,
                data[layer, 0],
                scale_arr[layer, 0],
                data[layer, 1],
                scale_arr[layer, 1],
                ring_pos,
                lpos,
            )
        else:
            data = jax.lax.dynamic_update_slice(
                data, k.astype(data.dtype)[None, None, :, None],
                (layer, 0, 0, ring_pos, 0, 0),
            )
            data = jax.lax.dynamic_update_slice(
                data, v.astype(data.dtype)[None, None, :, None],
                (layer, 1, 0, ring_pos, 0, 0),
            )
            attn = decode_attention_ring(
                q, data[layer, 0], data[layer, 1], ring_pos, lpos, prec
            )
        x = x + linear(attn.reshape(b, cfg.n_embd), blk.w_proj, blk.b_proj, prec)
        y = layer_norm(x, blk.ln2_scale, blk.ln2_bias)
        x = x + linear(
            gelu_tanh(linear(y, blk.w_fc, blk.b_fc, prec)), blk.w_out, blk.b_out, prec
        )
    x = layer_norm(x, params.lnf_scale, params.lnf_bias)
    logits = linear(x, params.lm_head, None, prec)
    return logits, KVCache(data=data, scale=scale_arr)


def decode_step_ragged(
    params: TransformerParams,
    cfg: TransformerConfig,
    token: jnp.ndarray,  # (B,)
    pos: jnp.ndarray,  # (B,) int32 — PER-ROW positions
    cache: KVCache,
):
    """decode_step with PER-ROW positions — the continuous-batching
    engine's step (serving/continuous.py), where co-batched rows sit at
    different generation depths. Row b embeds `token[b]` at position
    `pos[b]`, writes its K/V there (batched scatter at unique
    (row, pos[row]) coordinates — XLA keeps the donated cache in place),
    and attends over [0, pos[b]]. Equals decode_step token-for-token
    when pos is constant (tested). Positions are clamped to the cache
    width; retired rows can therefore keep flowing through harmlessly
    while awaiting replacement."""
    b = token.shape[0]
    h, dh = cfg.n_head, cfg.head_dim
    prec = cfg.mm_precision
    params = cast_floats(params, cfg.compute_dtype)
    t_max = cache.data.shape[3]
    pos = jnp.clip(pos, 0, t_max - 1)
    cos_t, sin_t = rotary_tables(cfg.n_seq, cfg.head_dim)
    cos_r = cos_t[pos].astype(cfg.compute_dtype)[:, None, :]  # (B, 1, Dh)
    sin_r = sin_t[pos].astype(cfg.compute_dtype)[:, None, :]

    x = params.tok_emb[token]
    if params.norm_embed_scale is not None:
        x = layer_norm(x, params.norm_embed_scale, params.norm_embed_bias)
    x = x.astype(cfg.compute_dtype)  # (B, D)

    quantized = cache.scale is not None
    data, scale_arr = cache.data, cache.scale
    rows = jnp.arange(b)
    for layer in range(cfg.n_layer):
        blk = jax.tree_util.tree_map(lambda a: a[layer], params.blocks)
        y = layer_norm(x, blk.ln1_scale, blk.ln1_bias)
        qkv = linear(y, blk.w_attn, blk.b_attn, prec)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = apply_rotary(q.reshape(b, h, dh), cos_r, sin_r)
        k = apply_rotary(k.reshape(b, h, dh), cos_r, sin_r)
        v = v.reshape(b, h, dh)
        if quantized:
            k8, ks = quantize_kv(k)
            v8, vs = quantize_kv(v)
            data = data.at[layer, 0, rows, pos].set(k8)
            data = data.at[layer, 1, rows, pos].set(v8)
            scale_arr = scale_arr.at[layer, 0, rows, pos].set(
                ks.astype(scale_arr.dtype)
            )
            scale_arr = scale_arr.at[layer, 1, rows, pos].set(
                vs.astype(scale_arr.dtype)
            )
            attn = decode_attention_quant_ragged(
                q,
                data[layer, 0],
                scale_arr[layer, 0],
                data[layer, 1],
                scale_arr[layer, 1],
                pos,
            )
        else:
            data = data.at[layer, 0, rows, pos].set(k.astype(data.dtype))
            data = data.at[layer, 1, rows, pos].set(v.astype(data.dtype))
            attn = decode_attention_ragged(
                q, data[layer, 0], data[layer, 1], pos, prec
            )
        x = x + linear(attn.reshape(b, cfg.n_embd), blk.w_proj, blk.b_proj, prec)
        y = layer_norm(x, blk.ln2_scale, blk.ln2_bias)
        x = x + linear(
            gelu_tanh(linear(y, blk.w_fc, blk.b_fc, prec)), blk.w_out, blk.b_out, prec
        )
    x = layer_norm(x, params.lnf_scale, params.lnf_bias)
    logits = linear(x, params.lm_head, None, prec)
    return logits, KVCache(data=data, scale=scale_arr)
