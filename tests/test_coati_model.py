"""Composite-model tests: encode/likelihood/loss parity against the full
reference e3gnn_smiles_clip_e2e (loaded with rdkit stub shims), model-doc
round-trip through the reference pickle format, and end-to-end embed ->
decode on the JAX side."""

import os
import pickle

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from coati_tpu.models import coati as F
from coati_tpu.models.api import COATI
from coati_tpu.models.coati import CoatiConfig
from coati_tpu.models.convert import convert_coati
from coati_tpu.models.io import load_e3gnn_smiles_clip_e2e, serialize_model
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

from .oracle import load_ref_clip_e2e, ref_tokenizer

VOCAB = "mar"


def small_cfg(tok, **kw):
    base = dict(
        n_layer_e3gnn=2,
        n_layer_xformer=2,
        n_hidden_xformer=32,
        n_hidden_e3nn=32,
        msg_cutoff_e3nn=6.0,
        n_embd_common=32,
        n_head=2,
        n_seq=40,
        n_tok=tok.n_token,
        biases=True,
        torch_emb=False,
        norm_clips=True,
        norm_embed=False,
        token_mlp=True,
        precision="highest",
    )
    base.update(kw)
    return CoatiConfig(**base)


@pytest.fixture(scope="module")
def pair():
    ce = load_ref_clip_e2e()
    tok = ref_tokenizer(VOCAB, n_seq=40)
    torch.manual_seed(0)
    cfg = small_cfg(tok)
    ref = ce.e3gnn_smiles_clip_e2e(
        n_layer_e3gnn=cfg.n_layer_e3gnn,
        n_layer_xformer=cfg.n_layer_xformer,
        n_hidden_xformer=cfg.n_hidden_xformer,
        n_hidden_e3nn=cfg.n_hidden_e3nn,
        msg_cutoff_e3nn=cfg.msg_cutoff_e3nn,
        n_embd_common=cfg.n_embd_common,
        n_head=cfg.n_head,
        n_seq=cfg.n_seq,
        n_tok=cfg.n_tok,
        biases=True,
        torch_emb=False,
        norm_clips=True,
        norm_embed=False,
        token_mlp=True,
        use_point_encoder=True,
        device=torch.device("cpu"),
        dtype=torch.float32,
    )
    ref.eval()
    params = convert_coati(ref.state_dict(), cfg)
    my_tok = TrieTokenizer(n_seq=40, **get_vocab(VOCAB))
    return ref, params, cfg, tok, my_tok


def token_batch(tok, smiles):
    rows = [tok.tokenize_text("[SMILES]" + s + "[STOP]", pad=True) for s in smiles]
    return np.asarray(rows, np.int32)


SMILES = ["C", "CCO", "c1ccccc1", "CC(=O)O"]


def test_encode_tokens_parity(pair):
    ref, params, cfg, rtok, mtok = pair
    toks = token_batch(mtok, SMILES)
    with torch.no_grad():
        ref_h = ref.encode_tokens(torch.tensor(toks, dtype=torch.long), rtok).numpy()
    mine = np.asarray(F.encode_tokens(params, cfg, jnp.asarray(toks), mtok.stop_token))
    np.testing.assert_allclose(mine, ref_h, atol=3e-5, rtol=1e-4)


def test_encode_points_parity(pair):
    ref, params, cfg, rtok, mtok = pair
    rng = np.random.default_rng(0)
    atoms = rng.integers(1, 9, size=(4, 10)).astype(np.int64)
    atoms[:, 8:] = 0
    coords = rng.normal(scale=2.0, size=(4, 10, 3)).astype(np.float32)
    with torch.no_grad():
        ref_h = ref.encode_points(
            torch.tensor(atoms, dtype=torch.long), torch.tensor(coords)
        ).numpy()
    mine = np.asarray(
        F.encode_points(params, cfg, jnp.asarray(atoms), jnp.asarray(coords))
    )
    np.testing.assert_allclose(mine, ref_h, atol=3e-5, rtol=1e-4)


def test_clip_loss_parity(pair):
    ref, params, cfg, *_ = pair
    ce = load_ref_clip_e2e()
    rng = np.random.default_rng(1)
    s = rng.normal(size=(6, cfg.embed_dim)).astype(np.float32)
    c = rng.normal(size=(6, cfg.embed_dim)).astype(np.float32)
    bad = np.array([False, False, True, False, False, False])
    with torch.no_grad():
        ref_loss = (
            ce.clip_loss()(torch.tensor(s), torch.tensor(c), torch.tensor(bad))
            .numpy()
            .item()
        )
    mine = float(F.clip_loss(jnp.asarray(s), jnp.asarray(c), jnp.asarray(bad)))
    assert abs(mine - ref_loss) < 1e-5


def test_likelihood_parity(pair):
    ref, params, cfg, rtok, mtok = pair
    model = COATI(params, cfg)
    h = np.random.default_rng(2).normal(size=(cfg.embed_dim,)).astype(np.float32)
    smi = "CCO"
    with torch.no_grad():
        ref_nll = ref.hclip_and_tokens_to_likelihood(
            torch.tensor(h), smi, rtok
        ).numpy()
    mine = np.asarray(model.hclip_and_tokens_to_likelihood(h, smi, mtok))
    np.testing.assert_allclose(mine, ref_nll, atol=1e-4, rtol=1e-4)


def test_s2s_likelihood_parity(pair):
    ref, params, cfg, rtok, mtok = pair
    model = COATI(params, cfg)
    with torch.no_grad():
        ref_nll, ref_mask = ref.batch_smiles_to_s2s_likelihood(SMILES, rtok)
    mine, mask = model.batch_smiles_to_s2s_likelihood(SMILES, mtok)
    np.testing.assert_array_equal(mask, ref_mask.numpy())
    np.testing.assert_allclose(np.asarray(mine), ref_nll.numpy(), atol=1e-4, rtol=1e-4)


def test_forward_parity_stats(pair):
    """forward() draws a random per-row clip-token choice; check the
    deterministic pieces (h_e3gnn, h_smiles, bad_rows) and that logits
    match the reference when the choice is forced to one side."""
    ref, params, cfg, rtok, mtok = pair
    toks = token_batch(mtok, SMILES)
    rng = np.random.default_rng(3)
    atoms = rng.integers(1, 9, size=(4, 10)).astype(np.int64)
    coords = rng.normal(scale=2.0, size=(4, 10, 3)).astype(np.float32)
    with torch.no_grad():
        h_e, h_s, logits_ref, bad = ref.forward_dist(
            torch.tensor(toks, dtype=torch.long),
            torch.tensor(toks, dtype=torch.long),
            torch.tensor(atoms, dtype=torch.long),
            torch.tensor(coords),
            rtok,
            p_clip_emb_smi=0.0,  # always pick the point token
        )
    he, hs, logits, badm = F.forward(
        params,
        cfg,
        jax.random.PRNGKey(0),
        jnp.asarray(toks),
        jnp.asarray(toks),
        jnp.asarray(atoms),
        jnp.asarray(coords),
        mtok.stop_token,
        mtok.unk_token,
        p_clip_emb_smi=0.0,
    )
    np.testing.assert_allclose(np.asarray(he), h_e.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(hs), h_s.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logits), logits_ref.numpy(), atol=5e-5, rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(badm), bad.numpy())


def test_model_document_roundtrip(pair, tmp_path):
    """Serialize the torch reference exactly like the reference trainer
    does, load through our loader, and verify embedding parity — this is
    the converter path used for the published s3 pickles."""
    ref, params, cfg, rtok, mtok = pair
    doc = {
        "train_args": {"tokenizer_vocab": VOCAB},
        "dataset_summary": {},
        "model": ref.state_dict(),
        "optimizer": None,
        "model_kwargs": {
            "n_layer_e3gnn": cfg.n_layer_e3gnn,
            "n_layer_xformer": cfg.n_layer_xformer,
            "n_hidden_xformer": cfg.n_hidden_xformer,
            "n_hidden_e3nn": cfg.n_hidden_e3nn,
            "msg_cutoff_e3nn": cfg.msg_cutoff_e3nn,
            "n_embd_common": cfg.n_embd_common,
            "n_head": cfg.n_head,
            "n_seq": cfg.n_seq,
            "n_tok": cfg.n_tok,
            "biases": True,
            "torch_emb": False,
            "norm_clips": True,
            "norm_embed": False,
            "token_mlp": True,
        },
    }
    path = tmp_path / "model_doc.pkl"
    with open(path, "wb") as f:
        pickle.dump(doc, f)

    model, tok = load_e3gnn_smiles_clip_e2e(str(path))
    assert tok.n_token == mtok.n_token
    toks = token_batch(tok, SMILES)
    with torch.no_grad():
        ref_h = ref.encode_tokens(torch.tensor(toks, dtype=torch.long), rtok).numpy()
    # default precision is fast-mode; re-wrap at parity precision
    model = COATI(model.params, model.config.replace(precision="highest"))
    mine = np.asarray(model.encode_tokens(toks, tok))
    np.testing.assert_allclose(mine, ref_h, atol=3e-5, rtol=1e-4)


def test_embed_decode_roundtrip_runs(pair):
    """End-to-end: encode a SMILES batch, decode it back; outputs must be
    well-formed token strings (random weights, so no chemical validity)."""
    _, params, cfg, _, mtok = pair
    model = COATI(params, cfg)
    toks = token_batch(mtok, SMILES)
    h = model.encode_tokens(toks, mtok)
    out = model.hclip_to_2d_batch(np.asarray(h), mtok, k=10, inv_temp=1.0)
    assert len(out) == len(SMILES)
    assert all(isinstance(s, str) for s in out)
    single = model.hclip_to_2d(np.asarray(h)[0], mtok, k=10)
    assert isinstance(single, str)
    comp = model.complete_batch(["[SMILES]C"] * 3, mtok, k=10)
    assert len(comp) == 3


def test_old_architecture_parity():
    """old_architecture=True swaps the projection-head layer order
    (Linear then LayerNorm, clip_e2e.py:409-418); conversion must
    auto-detect it and outputs must match."""
    from coati_tpu.models.convert import projection_is_old_architecture

    ce = load_ref_clip_e2e()
    tok = ref_tokenizer(VOCAB, n_seq=40)
    torch.manual_seed(11)
    cfg = small_cfg(tok, old_architecture=True, n_layer_e3gnn=1)
    ref = ce.e3gnn_smiles_clip_e2e(
        n_layer_e3gnn=1, n_layer_xformer=2, n_hidden_xformer=32,
        n_hidden_e3nn=32, n_embd_common=32, n_head=2, n_seq=40,
        n_tok=tok.n_token, norm_clips=True, token_mlp=True,
        old_architecture=True, device=torch.device("cpu"), dtype=torch.float32,
    )
    ref.eval()
    assert projection_is_old_architecture(ref.state_dict(), "smiles_to_clip")
    params = convert_coati(ref.state_dict(), cfg)
    my_tok = TrieTokenizer(n_seq=40, **get_vocab(VOCAB))
    toks = token_batch(my_tok, SMILES)
    with torch.no_grad():
        ref_h = ref.encode_tokens(torch.tensor(toks, dtype=torch.long), tok).numpy()
    mine = np.asarray(F.encode_tokens(params, cfg, jnp.asarray(toks), my_tok.stop_token))
    np.testing.assert_allclose(mine, ref_h, atol=3e-5, rtol=1e-4)


def test_no_norm_clips_parity():
    """norm_clips=False: bare Linear projection heads."""
    ce = load_ref_clip_e2e()
    tok = ref_tokenizer(VOCAB, n_seq=40)
    torch.manual_seed(12)
    cfg = small_cfg(tok, norm_clips=False, n_layer_e3gnn=1)
    ref = ce.e3gnn_smiles_clip_e2e(
        n_layer_e3gnn=1, n_layer_xformer=2, n_hidden_xformer=32,
        n_hidden_e3nn=32, n_embd_common=32, n_head=2, n_seq=40,
        n_tok=tok.n_token, norm_clips=False, token_mlp=False,
        device=torch.device("cpu"), dtype=torch.float32,
    )
    ref.eval()
    cfg = cfg.replace(token_mlp=False)
    params = convert_coati(ref.state_dict(), cfg)
    assert params.token_w is None  # Identity token MLP
    my_tok = TrieTokenizer(n_seq=40, **get_vocab(VOCAB))
    toks = token_batch(my_tok, SMILES)
    with torch.no_grad():
        ref_h = ref.encode_tokens(torch.tensor(toks, dtype=torch.long), tok).numpy()
    mine = np.asarray(F.encode_tokens(params, cfg, jnp.asarray(toks), my_tok.stop_token))
    np.testing.assert_allclose(mine, ref_h, atol=3e-5, rtol=1e-4)


def test_export_coati_roundtrip_and_torch_load(pair):
    """export_coati must produce a state_dict the reference torch model
    can load (strict), and converting it back must be bit-identical."""
    from coati_tpu.models.convert import export_coati

    ref, params, cfg, rtok, mtok = pair
    sd = export_coati(params, cfg)
    params2 = convert_coati(sd, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the reference model loads our exported dict without missing keys
    # (buffers like the causal mask are not parameters -> strict=False)
    torch_sd = {k: torch.tensor(v) for k, v in sd.items()}
    missing, unexpected = ref.load_state_dict(torch_sd, strict=False)
    assert not unexpected, unexpected
    assert all("attn.bias" in k for k in missing), missing  # only mask buffers
