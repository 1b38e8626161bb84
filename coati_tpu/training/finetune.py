"""LoRA fine-tuning for trained COATI checkpoints (beyond-parity).

The reference offers only full retraining (`train_autoencoder` with a
resume document); adapting a published checkpoint to a new assay/corpus
touches all ~20M weights. This module adds low-rank adapters
(arXiv:2106.09685) over the transformer trunk's stacked weight matrices:

    W_eff = W + (alpha / r) * A @ B          A: (L, in, r), B: (L, r, out)

Design: adapters are MERGED into a copy of the frozen base parameters
before each forward (`merge_lora`) instead of rewiring the model — the
per-step merge is L rank-r matmuls (~1 MFLOP at grande scale, noise
next to the forward), the model code stays untouched, and every
existing entry point (train steps, sampler, serving) works on the
merged params. Gradients flow to the adapters only (`jax.grad` w.r.t.
the LoRA pytree through the merge); the base stays frozen by
construction. `merge_lora` is also the export story: merged params are
a plain CoatiParams/TransformerParams, so documents written from them
load everywhere.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from coati_tpu.models.transformer import TransformerParams

# stacked trunk weights that receive adapters: (field, in_dim, out_dim)
# as multiples of D (n_embd)
_TARGETS = {
    "w_attn": (1, 3),
    "w_proj": (1, 1),
    "w_fc": (1, 4),
    "w_out": (4, 1),
}


@struct.dataclass
class LoraParams:
    """Rank-r adapters over the stacked block weights; `alpha` scaling
    is folded at merge time (static fields carry r/alpha)."""

    a: dict  # field -> (L, in, r)
    b: dict  # field -> (L, r, out)
    rank: int = struct.field(pytree_node=False, default=8)
    alpha: float = struct.field(pytree_node=False, default=16.0)


def init_lora(
    key: jax.Array,
    xformer: TransformerParams,
    rank: int = 8,
    alpha: float = 16.0,
    targets: Tuple[str, ...] = ("w_attn", "w_proj", "w_fc", "w_out"),
) -> LoraParams:
    """A ~ N(0, 1/in_dim), B = 0 — the adapter starts as an exact no-op
    (merged model == base model), the standard LoRA init."""
    a, b = {}, {}
    keys = jax.random.split(key, len(targets))
    for k, name in zip(keys, targets):
        if name not in _TARGETS:
            raise ValueError(
                f"unknown LoRA target {name!r}; choose from {sorted(_TARGETS)}"
            )
        w = getattr(xformer.blocks, name)  # (L, in, out)
        layers, n_in, n_out = w.shape
        a[name] = jax.random.normal(k, (layers, n_in, rank), jnp.float32) / (
            n_in**0.5
        )
        b[name] = jnp.zeros((layers, rank, n_out), jnp.float32)
    return LoraParams(a=a, b=b, rank=rank, alpha=alpha)


def merge_lora(xformer: TransformerParams, lora: LoraParams) -> TransformerParams:
    """-> TransformerParams with W + (alpha/r) A@B folded in. Pure and
    cheap (L rank-r matmuls per target); differentiable w.r.t. `lora`.
    Accepts document-loaded (numpy-leaf) base params."""
    xformer = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if hasattr(x, "dtype") else x, xformer
    )
    scale = lora.alpha / lora.rank
    blocks = xformer.blocks
    updates = {}
    for name, a in lora.a.items():
        w = getattr(blocks, name)
        delta = jnp.einsum("lir,lro->lio", a, lora.b[name]) * scale
        updates[name] = w + delta.astype(w.dtype)
    return xformer.replace(blocks=blocks.replace(**updates))


def make_lora_ar_step(
    base_xformer: TransformerParams,
    cfg,
    optimizer: optax.GradientTransformation,
    *,
    inject_token=None,
):
    """Jitted LoRA fine-tuning step on the AR objective:
    (lora, opt_state, tokens, y_next[, injection]) -> (lora, opt_state, loss).

    The base transformer is closed over as a frozen constant; only the
    adapter pytree receives gradients/updates."""
    from coati_tpu.models.coati import ar_loss_fn
    from coati_tpu.models.transformer import forward_logits

    # document-loaded params may carry numpy leaves; the closure must be
    # jax arrays for tracer-indexed ops like tok_emb[tokens]
    base_xformer = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if hasattr(x, "dtype") else x, base_xformer
    )
    # differentiated path: the flash prefill kernel's custom VJP replays
    # the XLA forward, so never auto-select it here (flash_attention.py)
    cfg = cfg.replace(prefill_kernel="xla")

    @jax.jit
    def step(lora, opt_state, tokens, y_next, injection=None):
        def loss_fn(lo):
            merged = merge_lora(base_xformer, lo)
            logits = forward_logits(
                merged, cfg, tokens, injection, inject_token
            )
            return ar_loss_fn(logits, y_next)

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, new_opt = optimizer.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), new_opt, loss

    return step
