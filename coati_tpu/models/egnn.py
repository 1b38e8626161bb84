"""E(3)-equivariant point-cloud encoder (EGNN, arXiv:2102.09844 eqs. 3-6).

TPU-first re-design of the reference e3gnn_clip / e_gcl_sparse
(coati/models/encoding/e3gnn_clip.py:14, e_gcl_sparse.py:80): instead of
data-dependent neighborlist gathers + scatter_add (e_gcl_sparse.py:27-77,
284-288 — shapes vary per batch, hostile to XLA), messages are computed
DENSELY over all atom pairs with a multiplicative smooth-cutoff mask.
Molecules have <= ~150 atoms, so the (B, N, N, H) message tensor is small,
maps straight onto the MXU, and keeps every shape static. The edge-MLP
first layer is decomposed as h_i @ W_a + h_j @ W_b + d^2 * w_c so the
expensive pairwise concat never materializes.

Semantics preserved exactly:
  * cubic smooth cutoff f(d) with f(0)=1, f(cut)=0 (e_gcl_sparse.py:10-24);
  * NO gradient flows through distances by default (the reference builds
    the neighborlist and distances under no_grad, e_gcl_sparse.py:199-203)
    -> `stop_gradient` on d^2 and on the cutoff mask;
  * messages aggregate onto the first pair index (sum over partners);
  * per-atom, affine-free normalization over the hidden dim — what torch
    InstanceNorm1d actually computes on the reference's (B, N, H) inputs;
  * coordinates are never updated between layers (e3gnn_clip.py:132
    discards x_new), so the coord-MLP is carried only for checkpoint
    compatibility and never evaluated;
  * masked mean-pool over real atoms with natoms >= 1 guard
    (e3gnn_clip.py:134-136).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from coati_tpu.common.periodic_table import xy_one_hot_full_table
from coati_tpu.ops.layers import (
    cast_floats,
    instance_norm_lastdim,
    linear,
    matmul_precision,
    torch_embedding_init,
    torch_linear_init,
)

N_ONE_HOT = 28


@struct.dataclass
class EgnnConfig:
    hidden_nf: int = struct.field(pytree_node=False, default=128)
    n_layers: int = struct.field(pytree_node=False, default=5)
    message_cutoff: float = struct.field(pytree_node=False, default=5.0)
    instance_norm: bool = struct.field(pytree_node=False, default=True)
    torch_emb: bool = struct.field(pytree_node=False, default=False)
    residual: bool = struct.field(pytree_node=False, default=False)
    dropout: float = struct.field(pytree_node=False, default=0.0)
    act_fn: str = struct.field(pytree_node=False, default="SiLU")
    dtype: str = struct.field(pytree_node=False, default="float32")
    precision: str = struct.field(pytree_node=False, default="default")
    # recompute layer activations in backward to bound the (B,N,N,H) peak
    remat: bool = struct.field(pytree_node=False, default=True)
    # fused Pallas message kernel: never materializes the pairwise
    # (B,N,N,H) tensor in HBM (TPU + SiLU + hidden%128==0; falls back to
    # the dense jnp path otherwise)
    fused_messages: bool = struct.field(pytree_node=False, default=True)

    @property
    def in_node_nf(self) -> int:
        return self.hidden_nf if self.torch_emb else N_ONE_HOT

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def mm_precision(self):
        return matmul_precision(self.precision)


@struct.dataclass
class EgnnLayerParams:
    """One e_gcl layer (or a stack along a leading axis)."""

    edge_w1: jnp.ndarray  # (2H+1, H)
    edge_b1: jnp.ndarray
    edge_w2: jnp.ndarray  # (H, H)
    edge_b2: jnp.ndarray
    node_w1: jnp.ndarray  # (H + H (+res), H)
    node_b1: jnp.ndarray
    node_w2: jnp.ndarray  # (H, H)
    node_b2: jnp.ndarray
    coord_w1: jnp.ndarray  # unused in the encoder; kept for checkpoints
    coord_b1: jnp.ndarray
    coord_w2: jnp.ndarray  # (H, 1) no bias


@struct.dataclass
class EgnnParams:
    embed_w: jnp.ndarray  # Linear(28 -> H) weight, or (84, H) table if torch_emb
    embed_b: Optional[jnp.ndarray]
    layers: EgnnLayerParams  # stacked (L, ...)
    dec_w1: jnp.ndarray
    dec_b1: jnp.ndarray
    dec_w2: jnp.ndarray
    dec_b2: jnp.ndarray


def _act(cfg: EgnnConfig):
    if cfg.act_fn == "SiLU":
        return jax.nn.silu
    if cfg.act_fn == "GELU":
        return jax.nn.gelu  # torch nn.GELU default = exact erf form
    raise ValueError(f"Bad act_fn {cfg.act_fn}")


def init_egnn(key: jax.Array, cfg: EgnnConfig) -> EgnnParams:
    h = cfg.hidden_nf
    node_in = 2 * h + (cfg.in_node_nf if cfg.residual else 0)
    keys = jax.random.split(key, 6 * cfg.n_layers + 4)

    def stack(fn):
        return jnp.stack([fn(i) for i in range(cfg.n_layers)])

    def lin(i, j, n_in, n_out, bias=True):
        return torch_linear_init(keys[6 * i + j], n_in, n_out, bias)

    layers = EgnnLayerParams(
        edge_w1=stack(lambda i: lin(i, 0, 2 * h + 1, h)[0]),
        edge_b1=stack(lambda i: lin(i, 0, 2 * h + 1, h)[1]),
        edge_w2=stack(lambda i: lin(i, 1, h, h)[0]),
        edge_b2=stack(lambda i: lin(i, 1, h, h)[1]),
        node_w1=stack(lambda i: lin(i, 2, node_in, h)[0]),
        node_b1=stack(lambda i: lin(i, 2, node_in, h)[1]),
        node_w2=stack(lambda i: lin(i, 3, h, h)[0]),
        node_b2=stack(lambda i: lin(i, 3, h, h)[1]),
        coord_w1=stack(lambda i: lin(i, 4, h, h)[0]),
        coord_b1=stack(lambda i: lin(i, 4, h, h)[1]),
        # reference: xavier_uniform gain 0.001 (e_gcl_sparse.py:147-148)
        coord_w2=stack(
            lambda i: 0.001
            * jax.nn.initializers.glorot_uniform()(keys[6 * i + 5], (h, 1))
        ),
    )
    if cfg.torch_emb:
        embed_w, embed_b = torch_embedding_init(keys[-4], 84, h), None
    else:
        embed_w, embed_b = torch_linear_init(keys[-4], N_ONE_HOT, h)
    dec_w1, dec_b1 = torch_linear_init(keys[-3], h, h)
    dec_w2, dec_b2 = torch_linear_init(keys[-2], h, h)
    return EgnnParams(
        embed_w=embed_w, embed_b=embed_b, layers=layers,
        dec_w1=dec_w1, dec_b1=dec_b1, dec_w2=dec_w2, dec_b2=dec_b2,
    )


def cubic_cutoff(x: jnp.ndarray, y: float) -> jnp.ndarray:
    """Smooth cutoff: f(0)=1, f'(0)=0, f(y)=0, f'(y)=0
    (e_gcl_sparse.py:10-24)."""
    c = (-3.0 / 2.0) * y ** -2
    d = 0.5 * y ** -3
    val = 1.0 + c * jnp.square(x) + d * x ** 3
    return jnp.where(x <= 0, 1.0, jnp.where(x >= y, 0.0, val))


def _egnn_layer(
    h: jnp.ndarray,  # (B, N, H)
    layer: EgnnLayerParams,
    cfg: EgnnConfig,
    d2: jnp.ndarray,  # (B, N, N) squared distances (stop-gradient applied)
    msg_weight: jnp.ndarray,  # (B, N, N) cutoff * pair-mask (stop-gradient)
    h0: Optional[jnp.ndarray],
) -> jnp.ndarray:
    act = _act(cfg)
    prec = cfg.mm_precision
    hdim = cfg.hidden_nf

    # edge MLP layer 1, decomposed: concat([h_i, h_j, d^2]) @ W1
    w_i = layer.edge_w1[:hdim]
    w_j = layer.edge_w1[hdim : 2 * hdim]
    w_d = layer.edge_w1[2 * hdim]  # (H,)
    hi = jnp.matmul(h, w_i, precision=prec)  # (B, N, H)
    hj = jnp.matmul(h, w_j, precision=prec)
    if cfg.fused_messages and cfg.act_fn == "SiLU":
        from coati_tpu.ops.pallas.egnn_messages import (
            egnn_messages,
            egnn_messages_bf16,
        )

        # bf16 compute -> bf16 MXU inputs inside the kernel (single-pass
        # systolic passes, f32 accumulation); f32 keeps oracle parity
        fused = (
            egnn_messages_bf16
            if cfg.compute_dtype == jnp.bfloat16
            else egnn_messages
        )
        mi = fused(
            hi, hj, d2, msg_weight, w_d, layer.edge_b1, layer.edge_w2, layer.edge_b2
        ).astype(h.dtype)
    else:
        e1 = act(
            hi[:, :, None, :]
            + hj[:, None, :, :]
            + d2[..., None] * w_d
            + layer.edge_b1
        )  # (B, N, N, H)
        mij = act(linear(e1, layer.edge_w2, layer.edge_b2, prec))
        # aggregate messages onto index i, weighted by the smooth cutoff
        mi = jnp.einsum(
            "bijh,bij->bih", mij, msg_weight.astype(mij.dtype), precision=prec
        )

    feats = [h, mi] + ([h0] if cfg.residual else [])
    out = linear(jnp.concatenate(feats, axis=-1), layer.node_w1, layer.node_b1, prec)
    out = linear(act(out), layer.node_w2, layer.node_b2, prec)
    out = h + out  # recurrent=True in all reference configs
    if cfg.instance_norm:
        out = instance_norm_lastdim(out)
    return out


def egnn_forward(
    params: EgnnParams,
    cfg: EgnnConfig,
    atoms: jnp.ndarray,  # (B, N) int atomic numbers, 0 = padding
    coords: jnp.ndarray,  # (B, N, 3)
) -> jnp.ndarray:
    """-> (B, H) masked mean-pooled molecular representation."""
    atoms = atoms.astype(jnp.int32)
    params = cast_floats(params, cfg.compute_dtype)
    node_mask = (atoms > 0).astype(cfg.compute_dtype)  # (B, N)
    n = atoms.shape[1]

    if cfg.torch_emb:
        nodes = params.embed_w[atoms]
        h = nodes
    else:
        table = jnp.asarray(xy_one_hot_full_table())
        nodes = table[atoms].astype(cfg.compute_dtype)  # (B, N, 28)
        h = linear(nodes, params.embed_w, params.embed_b, cfg.mm_precision)
    if cfg.instance_norm:
        h = instance_norm_lastdim(h)
    h = h.astype(cfg.compute_dtype)

    # pairwise squared distances; the reference computes these under
    # no_grad (e_gcl_sparse.py:199-203), so block the gradient path.
    diff = coords[:, :, None, :] - coords[:, None, :, :]
    d2 = jax.lax.stop_gradient(jnp.sum(jnp.square(diff), axis=-1))
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    not_self = 1.0 - jnp.eye(n, dtype=jnp.float32)
    pair_mask = node_mask[:, :, None] * node_mask[:, None, :] * not_self
    msg_weight = jax.lax.stop_gradient(
        cubic_cutoff(d, cfg.message_cutoff) * pair_mask
    )
    d2 = d2.astype(cfg.compute_dtype)
    msg_weight = msg_weight.astype(cfg.compute_dtype)
    h0 = nodes if cfg.residual else None

    layer_fn = _egnn_layer
    if cfg.remat:
        # cfg carries no array leaves (all fields static), so it passes
        # through jax.checkpoint as an empty pytree.
        layer_fn = jax.checkpoint(_egnn_layer)

    def body(h, layer):
        return layer_fn(h, layer, cfg, d2, msg_weight, h0), None

    h, _ = jax.lax.scan(body, h, params.layers)

    h = linear(h, params.dec_w1, params.dec_b1, cfg.mm_precision)
    h = linear(_act(cfg)(h), params.dec_w2, params.dec_b2, cfg.mm_precision)
    h = h * node_mask[..., None]
    natoms = jnp.maximum(jnp.sum(node_mask, axis=-1), 1.0)
    return jnp.sum(h, axis=1) / natoms[..., None]
