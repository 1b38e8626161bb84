"""Numerical parity of the JAX transformer against the reference torch
RotarySmilesTransformer on randomly initialized weights (the same check
the golden-weight converter relies on, without needing network access to
the published pickles)."""

import numpy as np
import pytest

from coati_tpu.models.convert import convert_transformer, export_transformer
from coati_tpu.models.transformer import (
    TransformerConfig,
    encode,
    forward_hidden,
    forward_logits,
    init_transformer,
)

from .oracle import load

import jax
import jax.numpy as jnp
import torch

CFG = TransformerConfig(
    n_layer=3, n_embd=64, n_head=4, n_seq=32, n_tok=50, precision="highest"
)


def make_pair(cfg=CFG, norm_embed=False, seed=0):
    """Build a reference torch transformer and its converted JAX params."""
    sx = load("ref_smiles_xformer")
    torch.manual_seed(seed)
    ref_cfg = sx.SmilesTransformerConfig(
        n_layer=cfg.n_layer,
        n_embd=cfg.n_embd,
        n_head=cfg.n_head,
        n_seq=cfg.n_seq,
        n_tok=cfg.n_tok,
        biases=cfg.biases,
        norm_embed=norm_embed,
        device=torch.device("cpu"),
        dtype=torch.float32,
    )
    ref = sx.RotarySmilesTransformer(ref_cfg)
    ref.eval()
    cfg = cfg.replace(norm_embed=norm_embed)
    params = convert_transformer(ref.state_dict(), cfg)
    return ref, params, cfg


def random_tokens(cfg, batch=4, t=None, seed=1):
    rng = np.random.default_rng(seed)
    t = t or cfg.n_seq
    toks = rng.integers(3, cfg.n_tok, size=(batch, t))
    toks[:, -2] = 2  # plant a deterministic [STOP]-like token id
    toks[:, -1] = 0
    return toks


class FakeTokenizer:
    stop_token = 2
    vocab = {"[UNK]": 1}


def test_forward_logits_parity():
    ref, params, cfg = make_pair()
    toks = random_tokens(cfg)
    with torch.no_grad():
        ref_out = ref.forward(torch.tensor(toks, dtype=torch.long)).numpy()
    mine = np.asarray(forward_logits(params, cfg, jnp.asarray(toks)))
    np.testing.assert_allclose(mine, ref_out, atol=2e-5, rtol=1e-4)


def test_forward_logits_parity_norm_embed():
    ref, params, cfg = make_pair(norm_embed=True, seed=3)
    toks = random_tokens(cfg, seed=4)
    with torch.no_grad():
        ref_out = ref.forward(torch.tensor(toks, dtype=torch.long)).numpy()
    mine = np.asarray(forward_logits(params, cfg, jnp.asarray(toks)))
    np.testing.assert_allclose(mine, ref_out, atol=2e-5, rtol=1e-4)


def test_encode_parity():
    ref, params, cfg = make_pair(seed=5)
    toks = random_tokens(cfg, seed=6)
    with torch.no_grad():
        ref_out = ref.encode(
            torch.tensor(toks, dtype=torch.long), FakeTokenizer()
        ).numpy()
    mine = np.asarray(encode(params, cfg, jnp.asarray(toks), stop_token=2))
    np.testing.assert_allclose(mine, ref_out, atol=2e-5, rtol=1e-4)


def test_injection_parity():
    """forward_with_replacement: soft-token injection over [UNK] holes."""
    ref, params, cfg = make_pair(seed=7)
    toks = random_tokens(cfg, seed=8)
    toks[:, 1] = 1  # [UNK] hole at position 1
    inj = np.random.default_rng(9).normal(size=(toks.shape[0], cfg.n_embd))
    with torch.no_grad():
        ref_out = ref.forward_with_replacement(
            torch.tensor(toks, dtype=torch.long),
            torch.tensor(inj, dtype=torch.float32),
            FakeTokenizer(),
        ).numpy()
    mine = np.asarray(
        forward_logits(
            params,
            cfg,
            jnp.asarray(toks),
            injection=jnp.asarray(inj, jnp.float32),
            inject_token=1,
        )
    )
    np.testing.assert_allclose(mine, ref_out, atol=2e-5, rtol=1e-4)


def test_shorter_sequence_than_nseq():
    ref, params, cfg = make_pair(seed=10)
    toks = random_tokens(cfg, t=9, seed=11)
    with torch.no_grad():
        ref_out = ref.forward(torch.tensor(toks, dtype=torch.long)).numpy()
    mine = np.asarray(forward_logits(params, cfg, jnp.asarray(toks)))
    np.testing.assert_allclose(mine, ref_out, atol=2e-5, rtol=1e-4)


def test_convert_export_roundtrip():
    _, params, cfg = make_pair(seed=12)
    sd = export_transformer(params, cfg)
    params2 = convert_transformer(sd, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_param_count_matches_reference_grande_scale():
    """Sanity: block parameter count formula matches the reference print
    for a grande-like config (~12.6M block params at 16x256/16 heads)."""
    cfg = TransformerConfig(n_layer=16, n_embd=256, n_head=16, n_seq=64, n_tok=100)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    block_params = sum(
        x.size for x in jax.tree_util.tree_leaves(params.blocks)
    ) + params.lnf_scale.size + params.lnf_bias.size
    assert abs(block_params - 12.6e6) < 0.2e6


def test_remat_is_numerically_exact():
    """jax.checkpoint recomputes — forward values and grads must be
    bit-comparable to the non-remat trunk."""
    import coati_tpu.models.transformer as T

    cfg = TransformerConfig(n_layer=3, n_embd=64, n_head=4, n_seq=32, n_tok=50)
    params = init_transformer(jax.random.PRNGKey(3), cfg)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 50, size=(4, 32)).astype(np.int32)
    )

    def loss(p, c):
        return jnp.sum(T.forward_hidden(p, c, tokens) ** 2)

    l0, g0 = jax.value_and_grad(loss)(params, cfg)
    l1, g1 = jax.value_and_grad(loss)(params, cfg.replace(remat=True))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    # recompute changes XLA fusion/summation order, and cancellation in
    # the LN backward amplifies the low-bit differences on small-entry
    # tensors — compare against each tensor's own scale at 1% (structural
    # errors produce O(100%) differences)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        tol = 1e-2 * max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(a, b, atol=tol)


def test_softmax_compute_dtype_close_to_f32():
    """softmax_dtype='compute' with bf16 activations must track the
    f32-softmax bf16 trunk within bf16-scale error, and must leave the
    f32 path (the parity default) bit-identical."""
    import coati_tpu.models.transformer as T

    cfg32 = TransformerConfig(n_layer=2, n_embd=64, n_head=4, n_seq=32, n_tok=50)
    params = init_transformer(jax.random.PRNGKey(4), cfg32)
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, 50, size=(4, 32)).astype(np.int32)
    )
    # f32 compute: "compute" == float32 -> identical
    out_a = T.forward_hidden(params, cfg32, tokens)
    out_b = T.forward_hidden(params, cfg32.replace(softmax_dtype="compute"), tokens)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    # bf16 compute: close
    cfg16 = cfg32.replace(dtype="bfloat16")
    h32sm = np.asarray(T.forward_hidden(params, cfg16, tokens), np.float32)
    h16sm = np.asarray(
        T.forward_hidden(params, cfg16.replace(softmax_dtype="compute"), tokens),
        np.float32,
    )
    scale = np.abs(h32sm).max()
    assert np.abs(h32sm - h16sm).max() < 0.05 * scale


def test_softmax_dtype_validated():
    """Unknown softmax_dtype values must fail loudly, not silently run
    the f32 path."""
    import pytest

    with pytest.raises(ValueError, match="softmax_dtype"):
        _ = TransformerConfig(softmax_dtype="bfloat16").attn_softmax_dtype
