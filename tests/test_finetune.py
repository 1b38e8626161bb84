"""LoRA fine-tuning tests (training/finetune.py, beyond-parity — the
reference only retrains checkpoints in full)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from coati_tpu.models.transformer import (
    TransformerConfig,
    forward_logits,
    init_transformer,
)
from coati_tpu.training.finetune import (
    LoraParams,
    init_lora,
    make_lora_ar_step,
    merge_lora,
)

CFG = TransformerConfig(n_layer=2, n_embd=32, n_head=2, n_seq=24, n_tok=40)


def test_fresh_lora_is_identity():
    """B = 0 init: the merged model equals the base bit-for-bit."""
    params = init_transformer(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    merged = merge_lora(params, lora)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, 40, size=(3, 24)).astype(np.int32)
    )
    np.testing.assert_array_equal(
        np.asarray(forward_logits(params, CFG, toks)),
        np.asarray(forward_logits(merged, CFG, toks)),
    )


def test_unknown_target_rejected():
    params = init_transformer(jax.random.PRNGKey(0), CFG)
    with pytest.raises(ValueError, match="LoRA target"):
        init_lora(jax.random.PRNGKey(1), params, targets=("tok_emb",))


def test_lora_finetune_trains_adapters_only():
    """The AR loss falls while the base weights stay frozen and only the
    adapter leaves move; the adapter parameter count is a small fraction
    of the trunk's."""
    params = init_transformer(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    tokens = rng.integers(3, 40, size=(16, 24)).astype(np.int32)
    tokens[:, -1] = 2
    y_next = np.zeros_like(tokens)
    y_next[:, :-1] = tokens[:, 1:]
    tokens_j, y_j = jnp.asarray(tokens), jnp.asarray(y_next)

    lora = init_lora(jax.random.PRNGKey(1), params, rank=8)
    n_lora = sum(x.size for x in jax.tree_util.tree_leaves(lora))
    n_base = sum(x.size for x in jax.tree_util.tree_leaves(params.blocks))
    assert n_lora < 0.5 * n_base

    optimizer = optax.adam(1e-2)
    step = make_lora_ar_step(params, CFG, optimizer)
    opt_state = optimizer.init(lora)
    losses = []
    for _ in range(120):
        lora, opt_state, loss = step(lora, opt_state, tokens_j, y_j)
        losses.append(float(loss))
    # rank-8 adapters memorizing 16 random rows: expect a solid drop
    assert losses[-1] < 0.4 * losses[0], losses[:3] + losses[-3:]
    # adapters moved; base params untouched by construction (closed over)
    assert float(jnp.abs(lora.b["w_attn"]).max()) > 0

    # merged export is a plain TransformerParams with the same treedef
    merged = merge_lora(params, lora)
    assert (
        jax.tree_util.tree_structure(merged)
        == jax.tree_util.tree_structure(params)
    )
    # and the merged model actually fits the corpus better than the base
    from coati_tpu.models.coati import ar_loss_fn

    base_loss = float(ar_loss_fn(forward_logits(params, CFG, tokens_j), y_j))
    tuned_loss = float(ar_loss_fn(forward_logits(merged, CFG, tokens_j), y_j))
    assert tuned_loss < 0.4 * base_loss
