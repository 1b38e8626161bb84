"""Tensor-parallel parameter sharding (BEYOND-PARITY).

The reference is data-parallel only (SURVEY §2.2 — DDP over NCCL,
train_coati.py:71-76); at ~20M params COATI needs nothing more. This
module provides the tensor-parallel seam anyway, the XLA-idiomatic way:
a `model` mesh axis and Megatron-style PartitionSpecs on the transformer
weights, with GSPMD propagating the activations and inserting the
collectives. No model code changes — TP composes with the pjit train
step (training/train.py mode="pjit") and with jitted inference.

Layout (weights are (in, out); blocks carry a leading layer axis L):
  w_attn (L, D, 3D)  column-parallel  P(None, None, "model")
  w_proj (L, D, D)   row-parallel     P(None, "model", None)
  w_fc   (L, D, 4D)  column-parallel  P(None, None, "model")
  w_out  (L, 4D, D)  row-parallel     P(None, "model", None)
  tok_emb (V, D)     vocab-parallel   P("model", None)
  lm_head (D, V)     vocab-parallel   P(None, "model")
  column-parallel biases follow their weight; row-parallel biases,
  layer norms, and every non-transformer leaf replicate.

Any dimension not divisible by the model-axis size falls back to
replicated (e.g. the 'mar' vocab 13,603 is odd, so the embedding/lm_head
stay replicated while the MLP and attention shard).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coati_tpu.parallel.mesh import replicate_params

# leaf-name -> PartitionSpec over (layer?, in, out) weight dims
_TP_RULES = {
    "w_attn": P(None, None, "model"),
    "b_attn": P(None, "model"),
    "w_fc": P(None, None, "model"),
    "b_fc": P(None, "model"),
    "w_proj": P(None, "model", None),
    "w_out": P(None, "model", None),
    "tok_emb": P("model", None),
    "lm_head": P(None, "model"),
}


def _leaf_name(path) -> str:
    for entry in reversed(path):
        if isinstance(entry, jax.tree_util.GetAttrKey):
            return entry.name
        if isinstance(entry, jax.tree_util.DictKey):
            return str(entry.key)
    return ""


def _divisible(shape, spec: P, tp_size: int) -> bool:
    for dim, axis in zip(shape, tuple(spec) + (None,) * len(shape)):
        if axis is not None and dim % tp_size != 0:
            return False
    return True


def param_specs(params, tp_size: int):
    """PartitionSpec pytree for a params pytree (CoatiParams,
    Coati2Params, or a bare TransformerParams)."""

    def spec(path, leaf):
        name = _leaf_name(path)
        rule = _TP_RULES.get(name)
        if rule is None or leaf is None:
            return P()
        trimmed = P(*rule[-leaf.ndim:]) if leaf.ndim < len(rule) else rule
        if not _divisible(leaf.shape, trimmed, tp_size):
            return P()
        return trimmed

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(mesh: Mesh, params, model_axis: str = "model"):
    """device_put the params with tensor-parallel NamedShardings.
    Falls back to full replication when the mesh has no model axis."""
    if model_axis not in mesh.axis_names:
        return replicate_params(mesh, params)
    tp_size = mesh.shape[model_axis]
    if tp_size == 1:
        return replicate_params(mesh, params)
    specs = param_specs(params, tp_size)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def commit_opt_state(mesh: Mesh, restored, template, model_axis: str = "model"):
    """Re-place a checkpoint-restored optimizer state onto the mesh.

    `template` is a freshly-init'd opt_state whose moment leaves inherit
    the (possibly tensor-parallel) param shardings but whose scalars
    (adam count) carry arbitrary single-device placements — so scalars
    are replicated explicitly (mesh.commit_to_template). DP meshes just
    replicate everything (keeping the single-device plain-placement fast
    path)."""
    if model_axis not in mesh.axis_names or mesh.shape[model_axis] == 1:
        return replicate_params(mesh, restored)
    from coati_tpu.parallel.mesh import commit_to_template

    return commit_to_template(mesh, restored, template)


def make_tp_mesh(
    n_devices: Optional[int] = None, model_parallel: int = 1
) -> Mesh:
    """(data = n/model_parallel) x (model = model_parallel) mesh. The
    model axis should map to the fastest ICI links (innermost)."""
    import numpy as np

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    return Mesh(
        np.asarray(devices).reshape(n // model_parallel, model_parallel),
        ("data", "model"),
    )
