"""Parity tests for the non-rotary blocks and learned positional embedding."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from coati_tpu.models.extra_blocks import (
    convert_plain_block,
    init_simple_token_embedding,
    plain_block,
    simple_token_embedding,
    SimpleTokenEmbeddingParams,
)

from .oracle import load


def test_plain_block_parity_causal_and_noncausal():
    bt = load("ref_basic_transformer")
    sx = load("ref_smiles_xformer")
    torch.manual_seed(0)
    cfg = sx.SmilesTransformerConfig(
        n_layer=1, n_embd=32, n_head=4, n_seq=16, n_tok=10,
        device=torch.device("cpu"), dtype=torch.float32,
    )
    x = np.random.default_rng(0).normal(size=(2, 16, 32)).astype(np.float32)
    for cls, causal in ((bt.Block, True), (bt.NonCausalBlock, False)):
        ref = cls(cfg)
        ref.eval()
        params = convert_plain_block(ref.state_dict())
        with torch.no_grad():
            ref_out = ref(torch.tensor(x)).numpy()
        mine = np.asarray(plain_block(jnp.asarray(x), params, 4, causal=causal))
        np.testing.assert_allclose(mine, ref_out, atol=3e-5, rtol=1e-4)


def test_simple_token_embedding_parity():
    sx = load("ref_smiles_xformer")
    torch.manual_seed(1)
    ref = sx.SimpleTokenEmbedding(n_embd=16, n_tok=20, n_seq=12)
    params = SimpleTokenEmbeddingParams(
        tok_emb=jnp.asarray(ref.tok_emb.weight.detach().numpy()),
        pos_emb=jnp.asarray(ref.pos_emb.weight.detach().numpy()),
    )
    toks = np.random.default_rng(2).integers(0, 20, size=(3, 12))
    # NOTE: the reference forward itself crashes on current torch (uint16
    # arange, smiles_xformer.py:46); evaluate its intended math directly.
    with torch.no_grad():
        ref_out = (
            ref.tok_emb(torch.tensor(toks, dtype=torch.long))
            + ref.pos_emb(torch.arange(0, 12, dtype=torch.long)).unsqueeze(0)
        ).numpy()
    mine = np.asarray(simple_token_embedding(params, jnp.asarray(toks)))
    np.testing.assert_allclose(mine, ref_out, atol=1e-6)


def test_init_shapes():
    p = init_simple_token_embedding(jax.random.PRNGKey(0), 20, 12, 16)
    assert p.tok_emb.shape == (20, 16) and p.pos_emb.shape == (12, 16)
