"""Torch-checkpoint → JAX parameter conversion.

Converts reference state_dicts (published "model document" pickles —
coati/training/train_coati.py:37-57 — or raw state_dicts) into coati_tpu
parameter pytrees. torch Linear weights are (out, in) and are transposed;
per-layer block tensors are stacked along a leading layer axis.

Works from either torch tensors or numpy arrays: any torch dependency is
confined to `to_numpy`.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np
import jax.numpy as jnp

from coati_tpu.models.coati import CoatiConfig, CoatiParams, FpHead, ProjParams
from coati_tpu.models.coati2 import (
    Coati2Config,
    Coati2Params,
    ProjLinearParams,
    SwigluResnetParams,
)
from coati_tpu.models.egnn import EgnnConfig, EgnnLayerParams, EgnnParams
from coati_tpu.models.transformer import (
    BlockParams,
    TransformerConfig,
    TransformerParams,
)


def to_numpy(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "detach"):  # torch tensor without importing torch
        return x.detach().cpu().numpy()
    return np.asarray(x)


def strip_module_prefix(state_dict: Mapping[str, object]) -> Dict[str, object]:
    """Remove DistributedDataParallel 'module.' prefixes
    (coati/models/io/coati.py:66-70)."""
    return {
        (k[len("module.") :] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def subtree(state_dict: Mapping[str, object], prefix: str) -> Dict[str, object]:
    pfx = prefix if prefix.endswith(".") else prefix + "."
    return {k[len(pfx) :]: v for k, v in state_dict.items() if k.startswith(pfx)}


def _lin_w(sd, name):
    return jnp.asarray(to_numpy(sd[name]).T)


def _arr(sd, name):
    return jnp.asarray(to_numpy(sd[name]))


def _opt(sd, name) -> Optional[jnp.ndarray]:
    return _arr(sd, name) if name in sd else None


def convert_transformer(
    sd: Mapping[str, object], cfg: TransformerConfig
) -> TransformerParams:
    """Convert a reference RotarySmilesTransformer state_dict (keys like
    'emb.tok_emb.weight', 'transformer.h.{i}.attn.c_attn.weight',
    'transformer.ln_f.weight', 'lm_head.weight')."""
    layers = cfg.n_layer

    def stack(fmt, transpose=False):
        mats = []
        for i in range(layers):
            a = to_numpy(sd[fmt.format(i=i)])
            mats.append(a.T if transpose else a)
        return jnp.asarray(np.stack(mats))

    def stack_opt(fmt):
        if fmt.format(i=0) not in sd:
            return None
        return stack(fmt)

    blocks = BlockParams(
        ln1_scale=stack("transformer.h.{i}.ln_1.weight"),
        ln1_bias=stack("transformer.h.{i}.ln_1.bias"),
        w_attn=stack("transformer.h.{i}.attn.c_attn.weight", transpose=True),
        b_attn=stack_opt("transformer.h.{i}.attn.c_attn.bias"),
        w_proj=stack("transformer.h.{i}.attn.c_proj.weight", transpose=True),
        b_proj=stack_opt("transformer.h.{i}.attn.c_proj.bias"),
        ln2_scale=stack("transformer.h.{i}.ln_2.weight"),
        ln2_bias=stack("transformer.h.{i}.ln_2.bias"),
        w_fc=stack("transformer.h.{i}.mlpf.0.weight", transpose=True),
        b_fc=stack_opt("transformer.h.{i}.mlpf.0.bias"),
        w_out=stack("transformer.h.{i}.mlpf.2.weight", transpose=True),
        b_out=stack_opt("transformer.h.{i}.mlpf.2.bias"),
    )
    # tok_emb lives at 'emb.tok_emb.weight' (plain) or
    # 'emb.tok_emb.0.weight' + LayerNorm at '.1' when norm_embed=True
    # (reference basic_transformer.py:72-78).
    if "emb.tok_emb.weight" in sd:
        tok_emb = _arr(sd, "emb.tok_emb.weight")
        ne_scale = ne_bias = None
    else:
        tok_emb = _arr(sd, "emb.tok_emb.0.weight")
        ne_scale = _opt(sd, "emb.tok_emb.1.weight")
        ne_bias = _opt(sd, "emb.tok_emb.1.bias")
    return TransformerParams(
        tok_emb=tok_emb,
        blocks=blocks,
        lnf_scale=_arr(sd, "transformer.ln_f.weight"),
        lnf_bias=_arr(sd, "transformer.ln_f.bias"),
        lm_head=_lin_w(sd, "lm_head.weight"),
        norm_embed_scale=ne_scale,
        norm_embed_bias=ne_bias,
    )


def convert_egnn(sd: Mapping[str, object], cfg: EgnnConfig) -> EgnnParams:
    """Convert a reference e3gnn_clip state_dict (keys 'embedding.weight',
    'gcl_{i}.edge_mlp.0.weight', 'node_dec.0.weight', ...; Linears inside
    Sequentials sit at indices 0/3 for edge & node MLPs and 0/2 for the
    coord MLP — coati/models/encoding/e_gcl_sparse.py:130-154)."""
    layers = cfg.n_layers

    def stack(fmt, transpose=True):
        mats = []
        for i in range(layers):
            a = to_numpy(sd[fmt.format(i=i)])
            mats.append(a.T if transpose else a)
        return jnp.asarray(np.stack(mats))

    layer_params = EgnnLayerParams(
        edge_w1=stack("gcl_{i}.edge_mlp.0.weight"),
        edge_b1=stack("gcl_{i}.edge_mlp.0.bias", transpose=False),
        edge_w2=stack("gcl_{i}.edge_mlp.3.weight"),
        edge_b2=stack("gcl_{i}.edge_mlp.3.bias", transpose=False),
        node_w1=stack("gcl_{i}.node_mlp.0.weight"),
        node_b1=stack("gcl_{i}.node_mlp.0.bias", transpose=False),
        node_w2=stack("gcl_{i}.node_mlp.3.weight"),
        node_b2=stack("gcl_{i}.node_mlp.3.bias", transpose=False),
        coord_w1=stack("gcl_{i}.coord_mlp.0.weight"),
        coord_b1=stack("gcl_{i}.coord_mlp.0.bias", transpose=False),
        coord_w2=stack("gcl_{i}.coord_mlp.2.weight"),
    )
    if cfg.torch_emb:
        embed_w, embed_b = _arr(sd, "emb.weight"), None
    else:
        embed_w, embed_b = _lin_w(sd, "embedding.weight"), _arr(sd, "embedding.bias")
    return EgnnParams(
        embed_w=embed_w,
        embed_b=embed_b,
        layers=layer_params,
        dec_w1=_lin_w(sd, "node_dec.0.weight"),
        dec_b1=_arr(sd, "node_dec.0.bias"),
        dec_w2=_lin_w(sd, "node_dec.3.weight"),
        dec_b2=_arr(sd, "node_dec.3.bias"),
    )


def _convert_projection(sd: Mapping[str, object], prefix: str) -> ProjParams:
    """Convert point_to_clip / smiles_to_clip heads. Layer order inside the
    Sequential is detected from weight rank: a 1-D '.0.weight' means
    LayerNorm-first (new architecture), 2-D means Linear-first (old
    architecture) — clip_e2e.py:408-429."""
    if f"{prefix}.weight" in sd:  # norm_clips=False: bare Linear
        return ProjParams(w=_lin_w(sd, f"{prefix}.weight"), b=_arr(sd, f"{prefix}.bias"))
    w0 = to_numpy(sd[f"{prefix}.0.weight"])
    if w0.ndim == 1:  # LayerNorm first
        return ProjParams(
            w=_lin_w(sd, f"{prefix}.1.weight"),
            b=_arr(sd, f"{prefix}.1.bias"),
            ln_scale=_arr(sd, f"{prefix}.0.weight"),
            ln_bias=_arr(sd, f"{prefix}.0.bias"),
        )
    return ProjParams(
        w=_lin_w(sd, f"{prefix}.0.weight"),
        b=_arr(sd, f"{prefix}.0.bias"),
        ln_scale=_arr(sd, f"{prefix}.1.weight"),
        ln_bias=_arr(sd, f"{prefix}.1.bias"),
    )


def projection_is_old_architecture(sd: Mapping[str, object], prefix: str) -> bool:
    key = f"{prefix}.0.weight"
    return key in sd and to_numpy(sd[key]).ndim == 2


def convert_coati(sd: Mapping[str, object], cfg: CoatiConfig) -> CoatiParams:
    """Convert a full e3gnn_smiles_clip_e2e state_dict ('xformer.*',
    'point_encoder.*', 'smiles_to_clip.*', 'point_to_clip.*',
    'point_clip_to_special_tokens.*')."""
    sd = strip_module_prefix(sd)
    xformer = convert_transformer(subtree(sd, "xformer"), cfg.xformer_config)
    point_sd = subtree(sd, "point_encoder")
    point_encoder = (
        convert_egnn(point_sd, cfg.egnn_config)
        if cfg.use_point_encoder and point_sd
        else None
    )
    point_to_clip = (
        _convert_projection(sd, "point_to_clip")
        if point_encoder is not None
        else None
    )
    smiles_to_clip = _convert_projection(sd, "smiles_to_clip")
    if "point_clip_to_special_tokens.1.weight" in sd:
        token_w = _lin_w(sd, "point_clip_to_special_tokens.1.weight")
        token_b = _arr(sd, "point_clip_to_special_tokens.1.bias")
    else:  # token_mlp=False -> Identity
        token_w = token_b = None
    # fingerprint-variant heads: fp_networks.{name}.weight (clip_fp_e2e)
    fp_names = sorted(
        {
            k.split(".")[1]
            for k in sd
            if k.startswith("fp_networks.") and k.endswith(".weight")
        }
    )
    fp_heads = (
        {
            name: FpHead(
                w=_lin_w(sd, f"fp_networks.{name}.weight"),
                b=_arr(sd, f"fp_networks.{name}.bias"),
            )
            for name in fp_names
        }
        or None
    )
    return CoatiParams(
        xformer=xformer,
        point_encoder=point_encoder,
        point_to_clip=point_to_clip,
        smiles_to_clip=smiles_to_clip,
        token_w=token_w,
        token_b=token_b,
        fp_heads=fp_heads,
    )


def _convert_swiglu_resnet(sd: Mapping[str, object], prefix: str) -> SwigluResnetParams:
    """SwiGLUResNet.net = Sequential(LN, Dropout, Linear, SwiGLU, Linear)
    -> params at .net.0 / .net.2 / .net.4 (transformer_only.py:19-34)."""
    return SwigluResnetParams(
        ln_scale=_arr(sd, f"{prefix}.net.0.weight"),
        ln_bias=_arr(sd, f"{prefix}.net.0.bias"),
        w1=_lin_w(sd, f"{prefix}.net.2.weight"),
        b1=_arr(sd, f"{prefix}.net.2.bias"),
        w2=_lin_w(sd, f"{prefix}.net.4.weight"),
        b2=_arr(sd, f"{prefix}.net.4.bias"),
    )


def convert_coati2(sd: Mapping[str, object], cfg: Coati2Config) -> Coati2Params:
    """Convert a COATI_Smiles_Inference state_dict (simple_coati2)."""
    sd = strip_module_prefix(sd)
    xformer = convert_transformer(subtree(sd, "xformer"), cfg.xformer_config)
    if cfg.enc_to_coati == "linear":
        # Sequential(LayerNorm(embed_dim), Linear) (transformer_only.py:86-89)
        s2c = ProjLinearParams(
            ln_scale=_arr(sd, "smiles_to_coati.0.weight"),
            ln_bias=_arr(sd, "smiles_to_coati.0.bias"),
            w=_lin_w(sd, "smiles_to_coati.1.weight"),
            b=_arr(sd, "smiles_to_coati.1.bias"),
        )
    elif cfg.enc_to_coati == "swiglu_mlp":
        # Sequential(LN, Linear, SwiGLU, Linear) -> .0/.1/.3 (:92-97)
        s2c = SwigluResnetParams(
            ln_scale=_arr(sd, "smiles_to_coati.0.weight"),
            ln_bias=_arr(sd, "smiles_to_coati.0.bias"),
            w1=_lin_w(sd, "smiles_to_coati.1.weight"),
            b1=_arr(sd, "smiles_to_coati.1.bias"),
            w2=_lin_w(sd, "smiles_to_coati.3.weight"),
            b2=_arr(sd, "smiles_to_coati.3.bias"),
        )
    elif cfg.enc_to_coati == "swiglu_resnet":
        s2c = _convert_swiglu_resnet(sd, "smiles_to_coati")
    else:
        raise ValueError(f"unknown enc_to_coati {cfg.enc_to_coati!r}")
    return Coati2Params(
        xformer=xformer,
        smiles_to_coati=s2c,
        coati_to_token=_convert_swiglu_resnet(sd, "coati_to_token"),
    )


_COATI2_KWARG_FIELDS = (
    "n_layer_xformer",
    "n_hidden_xformer",
    "embed_dim",
    "n_head",
    "n_seq",
    "mlp_dropout",
    "enc_to_coati",
    "n_direct_clr",
    "n_tok",
    "biases",
)


def coati2_config_from_model_kwargs(
    model_kwargs: Mapping[str, object], **overrides
) -> Coati2Config:
    kwargs = {k: model_kwargs[k] for k in _COATI2_KWARG_FIELDS if k in model_kwargs}
    kwargs.update(overrides)
    return Coati2Config(**kwargs)


_COATI_KWARG_FIELDS = (
    "n_layer_e3gnn",
    "n_layer_xformer",
    "n_hidden_xformer",
    "n_hidden_e3nn",
    "msg_cutoff_e3nn",
    "n_embd_common",
    "n_head",
    "n_seq",
    "n_tok",
    "biases",
    "torch_emb",
    "residual",
    "norm_clips",
    "norm_embed",
    "token_mlp",
    "use_point_encoder",
    "old_architecture",
)


def config_from_model_kwargs(model_kwargs: Mapping[str, object], **overrides) -> CoatiConfig:
    """Build a CoatiConfig from checkpointed model_kwargs (the reference
    stores constructor kwargs inside every model document,
    train_coati.py:119-138)."""
    kwargs = {k: model_kwargs[k] for k in _COATI_KWARG_FIELDS if k in model_kwargs}
    kwargs.update(overrides)
    return CoatiConfig(**kwargs)


def export_egnn(params: EgnnParams, cfg: EgnnConfig) -> Dict[str, np.ndarray]:
    """coati_tpu EGNN params -> reference-shaped e3gnn_clip state_dict."""
    sd: Dict[str, np.ndarray] = {}
    if cfg.torch_emb:
        sd["emb.weight"] = np.asarray(params.embed_w)
    else:
        sd["embedding.weight"] = np.asarray(params.embed_w).T
        sd["embedding.bias"] = np.asarray(params.embed_b)
    lp = params.layers
    for i in range(cfg.n_layers):
        pre = f"gcl_{i}"
        sd[f"{pre}.edge_mlp.0.weight"] = np.asarray(lp.edge_w1[i]).T
        sd[f"{pre}.edge_mlp.0.bias"] = np.asarray(lp.edge_b1[i])
        sd[f"{pre}.edge_mlp.3.weight"] = np.asarray(lp.edge_w2[i]).T
        sd[f"{pre}.edge_mlp.3.bias"] = np.asarray(lp.edge_b2[i])
        sd[f"{pre}.node_mlp.0.weight"] = np.asarray(lp.node_w1[i]).T
        sd[f"{pre}.node_mlp.0.bias"] = np.asarray(lp.node_b1[i])
        sd[f"{pre}.node_mlp.3.weight"] = np.asarray(lp.node_w2[i]).T
        sd[f"{pre}.node_mlp.3.bias"] = np.asarray(lp.node_b2[i])
        sd[f"{pre}.coord_mlp.0.weight"] = np.asarray(lp.coord_w1[i]).T
        sd[f"{pre}.coord_mlp.0.bias"] = np.asarray(lp.coord_b1[i])
        sd[f"{pre}.coord_mlp.2.weight"] = np.asarray(lp.coord_w2[i]).T
    sd["node_dec.0.weight"] = np.asarray(params.dec_w1).T
    sd["node_dec.0.bias"] = np.asarray(params.dec_b1)
    sd["node_dec.3.weight"] = np.asarray(params.dec_w2).T
    sd["node_dec.3.bias"] = np.asarray(params.dec_b2)
    return sd


def _export_projection(p: ProjParams, old_architecture: bool, prefix: str):
    sd: Dict[str, np.ndarray] = {}
    if p.ln_scale is None:
        sd[f"{prefix}.weight"] = np.asarray(p.w).T
        sd[f"{prefix}.bias"] = np.asarray(p.b)
        return sd
    lin_idx, ln_idx = (0, 1) if old_architecture else (1, 0)
    sd[f"{prefix}.{lin_idx}.weight"] = np.asarray(p.w).T
    sd[f"{prefix}.{lin_idx}.bias"] = np.asarray(p.b)
    sd[f"{prefix}.{ln_idx}.weight"] = np.asarray(p.ln_scale)
    sd[f"{prefix}.{ln_idx}.bias"] = np.asarray(p.ln_bias)
    return sd


def export_coati(params: CoatiParams, cfg: CoatiConfig) -> Dict[str, np.ndarray]:
    """coati_tpu composite params -> reference-shaped state_dict (inverse
    of convert_coati; makes our trained checkpoints loadable by the
    reference torch code)."""
    sd: Dict[str, np.ndarray] = {}
    for k, v in export_transformer(params.xformer, cfg.xformer_config).items():
        sd[f"xformer.{k}"] = v
    if params.point_encoder is not None:
        for k, v in export_egnn(params.point_encoder, cfg.egnn_config).items():
            sd[f"point_encoder.{k}"] = v
        sd.update(
            _export_projection(
                params.point_to_clip, cfg.old_architecture, "point_to_clip"
            )
        )
    sd.update(
        _export_projection(params.smiles_to_clip, cfg.old_architecture, "smiles_to_clip")
    )
    if params.token_w is not None:
        sd["point_clip_to_special_tokens.1.weight"] = np.asarray(params.token_w).T
        sd["point_clip_to_special_tokens.1.bias"] = np.asarray(params.token_b)
    if params.fp_heads:
        for name, head in params.fp_heads.items():
            sd[f"fp_networks.{name}.weight"] = np.asarray(head.w).T
            sd[f"fp_networks.{name}.bias"] = np.asarray(head.b)
    return sd


def export_transformer(params: TransformerParams, cfg: TransformerConfig):
    """Inverse of convert_transformer: coati_tpu params -> a reference-shaped
    state_dict of numpy arrays (for round-trip tests / interop)."""
    sd: Dict[str, np.ndarray] = {}
    if params.norm_embed_scale is None:
        sd["emb.tok_emb.weight"] = np.asarray(params.tok_emb)
    else:
        sd["emb.tok_emb.0.weight"] = np.asarray(params.tok_emb)
        sd["emb.tok_emb.1.weight"] = np.asarray(params.norm_embed_scale)
        sd["emb.tok_emb.1.bias"] = np.asarray(params.norm_embed_bias)
    b = params.blocks
    for i in range(cfg.n_layer):
        pre = f"transformer.h.{i}"
        sd[f"{pre}.ln_1.weight"] = np.asarray(b.ln1_scale[i])
        sd[f"{pre}.ln_1.bias"] = np.asarray(b.ln1_bias[i])
        sd[f"{pre}.attn.c_attn.weight"] = np.asarray(b.w_attn[i]).T
        sd[f"{pre}.attn.c_proj.weight"] = np.asarray(b.w_proj[i]).T
        sd[f"{pre}.ln_2.weight"] = np.asarray(b.ln2_scale[i])
        sd[f"{pre}.ln_2.bias"] = np.asarray(b.ln2_bias[i])
        sd[f"{pre}.mlpf.0.weight"] = np.asarray(b.w_fc[i]).T
        sd[f"{pre}.mlpf.2.weight"] = np.asarray(b.w_out[i]).T
        if b.b_attn is not None:
            sd[f"{pre}.attn.c_attn.bias"] = np.asarray(b.b_attn[i])
            sd[f"{pre}.attn.c_proj.bias"] = np.asarray(b.b_proj[i])
            sd[f"{pre}.mlpf.0.bias"] = np.asarray(b.b_fc[i])
            sd[f"{pre}.mlpf.2.bias"] = np.asarray(b.b_out[i])
    sd["transformer.ln_f.weight"] = np.asarray(params.lnf_scale)
    sd["transformer.ln_f.bias"] = np.asarray(params.lnf_bias)
    sd["lm_head.weight"] = np.asarray(params.lm_head).T
    return sd
