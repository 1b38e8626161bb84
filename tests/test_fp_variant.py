"""Fingerprint-variant (clip_fp_e2e) parity tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from coati_tpu.models import coati as F
from coati_tpu.models.api import COATI
from coati_tpu.models.coati import CoatiConfig
from coati_tpu.models.convert import convert_coati
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

from .oracle import load_ref_module, ref_tokenizer

VOCAB = "mar"


@pytest.fixture(scope="module")
def pair():
    fp_mod = load_ref_module("coati.models.encoding.clip_fp_e2e")
    rtok = ref_tokenizer(VOCAB, n_seq=40)
    torch.manual_seed(0)
    cfg = CoatiConfig(
        n_layer_e3gnn=1,
        n_layer_xformer=2,
        n_hidden_xformer=32,
        n_hidden_e3nn=32,
        n_embd_common=32,
        n_head=2,
        n_seq=40,
        n_tok=rtok.n_token,
        norm_clips=True,
        token_mlp=True,
        fp_map=(("morgan", 64),),
        precision="highest",
    )
    ref = fp_mod.e3gnn_smiles_clip_e2e(
        n_layer_e3gnn=1,
        n_layer_xformer=2,
        n_hidden_xformer=32,
        n_hidden_e3nn=32,
        n_embd_common=32,
        n_head=2,
        n_seq=40,
        n_tok=rtok.n_token,
        norm_clips=True,
        token_mlp=True,
        fp_map={"morgan": 64},
        device=torch.device("cpu"),
        dtype=torch.float32,
    )
    ref.eval()
    params = convert_coati(ref.state_dict(), cfg)
    mtok = TrieTokenizer(n_seq=40, **get_vocab(VOCAB))
    return ref, params, cfg, rtok, mtok


def test_fp_heads_converted(pair):
    _, params, cfg, _, _ = pair
    assert params.fp_heads is not None and "morgan" in params.fp_heads
    assert params.fp_heads["morgan"].w.shape == (32, 64)


def test_get_fp_pred_v2_parity(pair):
    ref, params, cfg, rtok, mtok = pair
    model = COATI(params, cfg)
    tokens = np.asarray(
        [mtok.tokenize_text("[SMILES]" + s + "[STOP]", pad=True) for s in ["C", "CCO"]],
        np.int32,
    )
    with torch.no_grad():
        ref_out = ref.get_fp_pred_v2(
            torch.tensor(tokens, dtype=torch.long), rtok, "morgan"
        ).numpy()
    mine = np.asarray(model.get_fp_pred_v2(tokens, mtok, "morgan"))
    np.testing.assert_allclose(mine, ref_out, atol=3e-5, rtol=1e-4)


def test_forward_fp_parity(pair):
    ref, params, cfg, rtok, mtok = pair
    tokens = np.asarray(
        [mtok.tokenize_text("[SMILES]" + s + "[STOP]", pad=True) for s in ["C", "CCO"]],
        np.int32,
    )
    rng = np.random.default_rng(0)
    atoms = rng.integers(1, 9, size=(2, 6)).astype(np.int64)
    coords = rng.normal(size=(2, 6, 3)).astype(np.float32)
    with torch.no_grad():
        h_e, h_s, logits_r, bad_r, fp_r = ref.forward_dist(
            torch.tensor(tokens, dtype=torch.long),
            torch.tensor(tokens, dtype=torch.long),
            torch.tensor(atoms, dtype=torch.long),
            torch.tensor(coords),
            rtok,
            p_clip_emb_smi=0.0,
        )
    he, hs, logits, bad, fp = F.forward_fp(
        params, cfg, jax.random.PRNGKey(0),
        jnp.asarray(tokens), jnp.asarray(tokens),
        jnp.asarray(atoms), jnp.asarray(coords),
        mtok.stop_token, mtok.unk_token, p_clip_emb_smi=0.0,
    )
    np.testing.assert_allclose(np.asarray(hs), h_s.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(fp["morgan"]), fp_r["morgan"].numpy(), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(logits), logits_r.numpy(), atol=5e-5, rtol=1e-4
    )


def test_fp_loss_runs(pair):
    _, params, cfg, _, _ = pair
    preds = {"morgan": jnp.zeros((2, 64))}
    targets = {"morgan": jnp.ones((2, 64), jnp.int32)}
    loss = float(F.fp_loss_fn(preds, targets))
    assert np.isfinite(loss) and loss > 0


def test_graph_generation_runs(pair):
    _, params, cfg, _, mtok = pair
    model = COATI(params, cfg)
    out = model.smiles_to_graph_batch(["C", "CC"], mtok, k=5)
    assert len(out) == 2 and all(isinstance(s, str) for s in out)
    pg = model.prefix_generate_batch(["[SMILES]C"], mtok, k=5)
    assert len(pg) == 1
