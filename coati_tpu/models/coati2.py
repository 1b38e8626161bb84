"""COATI2 inference model (SMILES-transformer-only, SwiGLU projections).

Parity target: coati/models/simple_coati2/transformer_only.py
(COATI_Smiles_Inference :43, SwiGLU :37, SwiGLUResNet :19) and its loader
simple_coati2/io.py:21-84. The COATI2 transformer trunk is a clone of the
COATI1 one (verified by diff), so it reuses coati_tpu.models.transformer;
COATI2 adds 512-d embeddings, SwiGLU projection heads, and the
property-conditioning token vocabulary (coati2_12_12: [PROPS]…[ENDPROPS],
[IntMolLogP], [PercentQED], [TPSA], [CHIRAL]/[RACEMIC], …) for
controlled generation.
"""

from __future__ import annotations

import threading

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from coati_tpu.models.sampler import auto_stage_widths, generate_tokens
from coati_tpu.models.transformer import (
    TransformerConfig,
    TransformerParams,
    forward_hidden,
    init_transformer,
    stop_token_hidden,
)
from coati_tpu.ops.layers import layer_norm, linear, swiglu, torch_linear_init
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer


@struct.dataclass
class Coati2Config:
    """Field names mirror the reference constructor
    (transformer_only.py:49-62)."""

    n_layer_xformer: int = struct.field(pytree_node=False, default=16)
    n_hidden_xformer: int = struct.field(pytree_node=False, default=256)
    embed_dim: int = struct.field(pytree_node=False, default=256)
    n_head: int = struct.field(pytree_node=False, default=16)
    n_seq: int = struct.field(pytree_node=False, default=80)
    mlp_dropout: float = struct.field(pytree_node=False, default=0.0)
    enc_to_coati: str = struct.field(pytree_node=False, default="linear")
    n_direct_clr: int = struct.field(pytree_node=False, default=64)
    n_tok: int = struct.field(pytree_node=False, default=4)
    biases: bool = struct.field(pytree_node=False, default=True)
    dtype: str = struct.field(pytree_node=False, default="float32")
    precision: str = struct.field(pytree_node=False, default="default")
    # rematerialize transformer activations in backward (training-only
    # concern; COATI2-grande at 512 width needs it to fit HBM)
    remat: bool = struct.field(pytree_node=False, default=False)
    # training-attention softmax dtype (see TransformerConfig.softmax_dtype)
    softmax_dtype: str = struct.field(pytree_node=False, default="float32")
    # full-sequence attention backend (see TransformerConfig.prefill_kernel)
    prefill_kernel: str = struct.field(pytree_node=False, default="auto")
    # decode top-k recall target (see TransformerConfig.topk_recall —
    # 0.8 is the quality-validated production default, +23% decode)
    topk_recall: float = struct.field(pytree_node=False, default=0.8)

    @property
    def xformer_config(self) -> TransformerConfig:
        return TransformerConfig(
            n_layer=self.n_layer_xformer,
            n_embd=self.n_hidden_xformer,
            n_head=self.n_head,
            n_seq=self.n_seq,
            n_tok=self.n_tok,
            biases=self.biases,
            norm_embed=False,
            dtype=self.dtype,
            precision=self.precision,
            remat=self.remat,
            softmax_dtype=self.softmax_dtype,
            prefill_kernel=self.prefill_kernel,
            topk_recall=self.topk_recall,
        )


@struct.dataclass
class SwigluResnetParams:
    """LayerNorm -> Linear(d, 2d') -> SwiGLU -> Linear(d', d'), + residual."""

    ln_scale: jnp.ndarray
    ln_bias: jnp.ndarray
    w1: jnp.ndarray  # (d_in, 2*d_out)
    b1: jnp.ndarray
    w2: jnp.ndarray  # (d_out, d_out)
    b2: jnp.ndarray


def apply_swiglu_resnet(p: SwigluResnetParams, x: jnp.ndarray, precision=None):
    y = layer_norm(x, p.ln_scale, p.ln_bias)
    y = swiglu(linear(y, p.w1, p.b1, precision))
    return linear(y, p.w2, p.b2, precision) + x


def apply_swiglu_mlp(p: SwigluResnetParams, x: jnp.ndarray, precision=None):
    """Same stack without the residual (enc_to_coati='swiglu_mlp')."""
    y = layer_norm(x, p.ln_scale, p.ln_bias)
    y = swiglu(linear(y, p.w1, p.b1, precision))
    return linear(y, p.w2, p.b2, precision)


def init_swiglu_resnet(key, d_in: int, d_out: int) -> SwigluResnetParams:
    k1, k2 = jax.random.split(key)
    w1, b1 = torch_linear_init(k1, d_in, 2 * d_out)
    w2, b2 = torch_linear_init(k2, d_out, d_out)
    return SwigluResnetParams(
        ln_scale=jnp.ones((d_in,), jnp.float32),
        ln_bias=jnp.zeros((d_in,), jnp.float32),
        w1=w1, b1=b1, w2=w2, b2=b2,
    )


@struct.dataclass
class Coati2Params:
    xformer: TransformerParams
    # enc_to_coati='linear': LayerNorm+Linear; swiglu variants use swiglu
    smiles_to_coati: object  # ProjLinearParams | SwigluResnetParams
    coati_to_token: SwigluResnetParams


@struct.dataclass
class ProjLinearParams:
    ln_scale: jnp.ndarray
    ln_bias: jnp.ndarray
    w: jnp.ndarray
    b: jnp.ndarray


def init_coati2(key: jax.Array, cfg: Coati2Config) -> Coati2Params:
    kx, ks, kt = jax.random.split(key, 3)
    xformer = init_transformer(kx, cfg.xformer_config)
    if cfg.enc_to_coati == "linear":
        w, b = torch_linear_init(ks, cfg.n_hidden_xformer, cfg.embed_dim)
        s2c = ProjLinearParams(
            ln_scale=jnp.ones((cfg.embed_dim,), jnp.float32),
            ln_bias=jnp.zeros((cfg.embed_dim,), jnp.float32),
            w=w, b=b,
        )
    elif cfg.enc_to_coati in ("swiglu_mlp", "swiglu_resnet"):
        s2c = init_swiglu_resnet(ks, cfg.n_hidden_xformer, cfg.embed_dim)
    else:
        raise ValueError(f"unknown enc_to_coati {cfg.enc_to_coati!r}")
    return Coati2Params(
        xformer=xformer,
        smiles_to_coati=s2c,
        coati_to_token=init_swiglu_resnet(kt, cfg.embed_dim, cfg.embed_dim),
    )


def smiles_to_coati(params: Coati2Params, cfg: Coati2Config, h: jnp.ndarray):
    prec = cfg.xformer_config.mm_precision
    if cfg.enc_to_coati == "linear":
        p = params.smiles_to_coati
        return linear(layer_norm(h, p.ln_scale, p.ln_bias), p.w, p.b, prec)
    if cfg.enc_to_coati == "swiglu_mlp":
        return apply_swiglu_mlp(params.smiles_to_coati, h, prec)
    return apply_swiglu_resnet(params.smiles_to_coati, h, prec)


# ------------------------------------------------------ training objective


def direct_clr_loss(
    h1: jnp.ndarray,
    h2: jnp.ndarray,
    bad_rows: jnp.ndarray,
    n_direct_clr: int,
    inv_temp: float = 10.0,
) -> jnp.ndarray:
    """directCLR (Jing et al. 2021, arXiv:2110.09348): symmetric InfoNCE
    applied DIRECTLY to the leading `n_direct_clr` dims of the embedding,
    no projection head. The slice width is the reference's
    Coati2Config.n_direct_clr (transformer_only.py:56) — the only trace
    the published inference code leaves of the COATI2 training loss.
    Sub-vectors are L2-normalized; inv_temp (1/τ) scales the logits."""
    from coati_tpu.models.coati import clip_loss

    z1 = h1[:, :n_direct_clr].astype(jnp.float32)
    z2 = h2[:, :n_direct_clr].astype(jnp.float32)
    z1 = z1 / jnp.maximum(jnp.linalg.norm(z1, axis=-1, keepdims=True), 1e-6)
    z2 = z2 / jnp.maximum(jnp.linalg.norm(z2, axis=-1, keepdims=True), 1e-6)
    return clip_loss(z1 * inv_temp, z2, bad_rows)


def coati2_training_forward(
    params: Coati2Params,
    cfg: Coati2Config,
    tokens: jnp.ndarray,
    raw_tokens: jnp.ndarray,
    rand_tokens: jnp.ndarray,
    stop_token: int,
    unk_token: int,
    pad_token: int = 0,
):
    """Training forward for the COATI2 recipe (BEYOND-PARITY — the
    reference ships COATI2 inference only).

    Two SMILES serializations of each molecule (canonical `raw_tokens`,
    permuted `rand_tokens`) are encoded to coati space for the directCLR
    views; the canonical embedding is mapped through coati_to_token and
    injected over [UNK] in the property-conditioned AR target `tokens`
    (the inference decode path, transformer_only.py:113-153, in reverse).

    Returns (h_canonical, h_permuted, logits, bad_rows)."""
    from coati_tpu.models.transformer import forward_logits

    xcfg = cfg.xformer_config
    prec = xcfg.mm_precision
    # both views in one doubled-batch pass (the xform pads them to a
    # shared width) — better MXU utilization than two half-size passes
    views = jnp.concatenate([raw_tokens, rand_tokens], axis=0)
    hidden = forward_hidden(params.xformer, xcfg, views)
    h12 = smiles_to_coati(
        params, cfg, stop_token_hidden(hidden, views, stop_token)
    )
    h1, h2 = jnp.split(h12, 2, axis=0)
    h_token = apply_swiglu_resnet(params.coati_to_token, h1, prec)
    logits = forward_logits(params.xformer, xcfg, tokens, h_token, unk_token)
    # failed xform rows arrive as all-pad (coati2_12_12's [PAD] is 31,
    # so a zero-sum test would never fire)
    bad_rows = jnp.all(tokens == pad_token, axis=-1)
    return h1, h2, logits, bad_rows


@functools.partial(jax.jit, static_argnames=("cfg", "stop_token"))
def _encode_tokens_jit(params: Coati2Params, cfg: Coati2Config, tokens, stop_token):
    xcfg = cfg.xformer_config
    hidden = forward_hidden(params.xformer, xcfg, tokens)
    return smiles_to_coati(params, cfg, stop_token_hidden(hidden, tokens, stop_token))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _coati_to_token_jit(params: Coati2Params, cfg: Coati2Config, h):
    return apply_swiglu_resnet(
        params.coati_to_token, h, cfg.xformer_config.mm_precision
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "stop_token", "unk_token", "pad_token", "prefill_len",
        "total_len", "k", "stage_widths",
    ),
)
def _embed_decode_jit(
    params, cfg, smiles_tokens, tokens0, noise, rng, inv_temp,
    *, stop_token, unk_token, pad_token, prefill_len, total_len, k,
    stage_widths,
):
    """Fused embed -> inject -> decode, one compiled program (COATI2
    mirror of models/api.py _embed_decode_jit)."""
    xcfg = cfg.xformer_config
    hidden = forward_hidden(params.xformer, xcfg, smiles_tokens)
    h = smiles_to_coati(
        params, cfg, stop_token_hidden(hidden, smiles_tokens, stop_token)
    )
    h_token = apply_swiglu_resnet(
        params.coati_to_token, h + noise.astype(h.dtype), xcfg.mm_precision
    )
    b = smiles_tokens.shape[0]
    out = generate_tokens(
        params.xformer,
        xcfg,
        rng,
        tokens0,
        jnp.full((b,), prefill_len, jnp.int32),
        prefill_len=prefill_len,
        total_len=total_len,
        stop_token=stop_token,
        pad_token=pad_token,
        k=k,
        inv_temp=inv_temp,
        inj_payload=h_token,
        inject_token=unk_token,
        stage_widths=stage_widths,
    )
    return h, out


class COATI2:
    """COATI_Smiles_Inference equivalent: invertible 2D-only embedding
    with SwiGLU heads and property-token conditioning."""

    def __init__(self, params: Coati2Params, config: Coati2Config, seed: int = 0):
        self.params = params
        self.config = config
        self.embed_dim = config.embed_dim
        self._rng = jax.random.PRNGKey(seed)
        self._noise = np.random.default_rng(seed)
        self._rng_lock = threading.Lock()  # serving calls from threads

    def _next_rng(self):
        with self._rng_lock:
            self._rng, out = jax.random.split(self._rng)
            return out

    def _sample_noise(self, scale, shape):
        with self._rng_lock:
            return self._noise.normal(scale=scale, size=shape).astype(np.float32)

    def encode_tokens(self, token_indices, tokenizer: TrieTokenizer) -> jnp.ndarray:
        from coati_tpu.models.api import _pad_batch, bucket_size

        tokens = np.asarray(token_indices, np.int32)
        assert tokens.ndim == 2
        b = tokens.shape[0]
        padded = _pad_batch(tokens, bucket_size(b))  # bound jit recompiles
        out = _encode_tokens_jit(
            self.params, self.config, jnp.asarray(padded), tokenizer.stop_token
        )
        return out[:b]

    def smiles_to_coati_vec(self, smiles, tokenizer: TrieTokenizer) -> np.ndarray:
        """Convenience: list of SMILES -> (B, embed_dim)."""
        tokens = [
            tokenizer.tokenize_text("[SMILES]" + s + "[STOP]", pad=True)
            for s in smiles
        ]
        return np.asarray(self.encode_tokens(np.asarray(tokens, np.int32), tokenizer))

    def hcoati_to_2d_batch(
        self,
        h_coati,
        tokenizer: TrieTokenizer,
        fill_in_from: str = "[SMILES]",
        noise_scale: float = 0.0,
        inv_temp: float = 2.0,
        k: int = 100,
        do_suffix: bool = False,
        keep_special: bool = False,
        return_tokens: bool = False,
        top_p=None,  # beyond-parity nucleus truncation (ops/sampling.py)
    ):
        assert k > 1 or k == 1
        from coati_tpu.models.api import _pad_batch, bucket_size

        h = np.asarray(h_coati, np.float32)
        n_real = h.shape[0]
        if noise_scale > 0:
            h = h + self._sample_noise(noise_scale, h.shape)
        h = _pad_batch(h, bucket_size(n_real))  # bound jit recompiles
        h_token = _coati_to_token_jit(self.params, self.config, jnp.asarray(h))
        suffstr = "[SUFFIX][MIDDLE]" if do_suffix else ""
        prefix = tokenizer.tokenize_text(
            "[CLIP][UNK]" + fill_in_from + suffstr, pad=False
        )
        b = h.shape[0]
        total_len = self.config.n_seq
        tokens0 = np.zeros((b, total_len), np.int32)
        tokens0[:, : len(prefix)] = prefix
        out = generate_tokens(
            self.params.xformer,
            self.config.xformer_config,
            self._next_rng(),
            jnp.asarray(tokens0),
            jnp.full((b,), len(prefix), jnp.int32),
            prefill_len=len(prefix),
            total_len=total_len,
            stop_token=tokenizer.stop_token,
            pad_token=tokenizer.pad_token,
            k=k,
            inv_temp=inv_temp,
            inj_payload=h_token,
            inject_token=tokenizer.unk_token,
            stage_widths=auto_stage_widths(len(prefix), total_len),
            top_p=top_p,
        )
        out = np.asarray(out)[:n_real]
        # vectorized detokenization (decode_batch, PERF.md)
        smiles = tokenizer.decode_batch(out, special=keep_special)
        if return_tokens:
            return smiles, [list(map(int, r)) for r in out]
        return smiles

    def smiles_to_2d_batch(
        self,
        token_indices,
        tokenizer: TrieTokenizer,
        fill_in_from: str = "[SMILES]",
        noise_scale: float = 0.0,
        inv_temp: float = 2.0,
        k: int = 100,
        keep_special: bool = False,
        return_embeddings: bool = False,
        total_len: Optional[int] = None,
    ):
        """Fused embed -> decode round trip as ONE device program
        (COATI2 mirror of COATI.smiles_to_2d_batch; property-conditioned
        prefixes go through `fill_in_from`, e.g.
        '[PROPS][PercentQED][NUM80][ENDPROPS][SMILES]')."""
        from coati_tpu.models.api import fused_round_trip

        return fused_round_trip(
            _embed_decode_jit, self.params, self.config, self.embed_dim,
            tokenizer, token_indices,
            fill_in_from=fill_in_from, noise_scale=noise_scale,
            inv_temp=inv_temp, k=k, keep_special=keep_special,
            return_embeddings=return_embeddings, total_len=total_len,
            noise_fn=self._sample_noise, rng=self._next_rng(),
        )

    def hcoati_to_2d(
        self,
        h_coati,
        tokenizer: TrieTokenizer,
        fill_in_from: str = "[SMILES]",
        noise_scale: float = 0.0,
        do_suffix: bool = False,
        inv_temp: float = 2.0,
        k: int = 100,
    ) -> str:
        h = np.asarray(h_coati, np.float32).reshape(1, -1)
        return self.hcoati_to_2d_batch(
            h, tokenizer, fill_in_from, noise_scale, inv_temp, k, do_suffix
        )[0]
