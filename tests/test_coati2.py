"""COATI2 tests: parity vs the reference COATI_Smiles_Inference for every
enc_to_coati variant, plus document-loader round-trip."""

import pickle
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from coati_tpu.models.coati2 import Coati2Config, COATI2
from coati_tpu.models.convert import convert_coati2
from coati_tpu.models.io import load_coati2
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

from .oracle import load_ref_simple_coati2_transformer_only


TOK = TrieTokenizer(n_seq=40, **get_vocab("coati2_12_12"))


def make_pair(enc_to_coati, seed=0):
    to = load_ref_simple_coati2_transformer_only()
    torch.manual_seed(seed)
    cfg = Coati2Config(
        n_layer_xformer=2,
        n_hidden_xformer=32,
        embed_dim=32,
        n_head=2,
        n_seq=40,
        enc_to_coati=enc_to_coati,
        n_tok=TOK.n_token,
        precision="highest",
    )
    ref = to.COATI_Smiles_Inference(
        n_layer_xformer=2,
        n_hidden_xformer=32,
        embed_dim=32,
        n_head=2,
        n_seq=40,
        enc_to_coati=enc_to_coati,
        n_tok=TOK.n_token,
        device=torch.device("cpu"),
        dtype=torch.float32,
    )
    ref.eval()
    return ref, convert_coati2(ref.state_dict(), cfg), cfg


SMILES = ["C", "CCO", "c1ccccc1"]


@pytest.mark.parametrize("variant", ["linear", "swiglu_mlp", "swiglu_resnet"])
def test_encode_tokens_parity(variant):
    ref, params, cfg = make_pair(variant)
    model = COATI2(params, cfg)

    class RT:  # the reference tokenizer only needs stop_token here
        stop_token = TOK.stop_token

    tokens = np.asarray(
        [TOK.tokenize_text("[SMILES]" + s + "[STOP]", pad=True) for s in SMILES],
        np.int32,
    )
    with torch.no_grad():
        ref_h = ref.encode_tokens(torch.tensor(tokens, dtype=torch.long), RT()).numpy()
    mine = np.asarray(model.encode_tokens(tokens, TOK))
    np.testing.assert_allclose(mine, ref_h, atol=3e-5, rtol=1e-4)


def test_decode_runs_and_greedy_matches():
    ref, params, cfg = make_pair("linear", seed=1)
    model = COATI2(params, cfg)
    h = np.random.default_rng(0).normal(size=(2, cfg.embed_dim)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.xformer.generate_top_k_with_inj_batch(
            prefix=TOK.tokenize_text("[CLIP][UNK][SMILES]", pad=False),
            stop_token=TOK.stop_token,
            pad_token=TOK.pad_token,
            inv_temp=1.0,
            k=1,
            inj_token=TOK.unk_token,
            inj_payload=ref.coati_to_token(torch.tensor(h)),
        )
    _, mine_tokens = model.hcoati_to_2d_batch(
        h, TOK, inv_temp=1.0, k=1, return_tokens=True
    )
    for i in range(2):
        assert mine_tokens[i][: len(ref_out[i])] == ref_out[i]


def test_property_conditioned_prefix_generation():
    """COATI2 vocab carries property-conditioning tokens; prefix-based
    conditioned generation must run through the sampler."""
    _, params, cfg = make_pair("linear", seed=2)
    model = COATI2(params, cfg)
    prefix = TOK.tokenize_text(
        "[PROPS][IntMolLogP][NUM3][ENDPROPS][SMILES]", pad=False
    )
    assert all(isinstance(t, int) for t in prefix)
    from coati_tpu.models.sampler import generate_prefix_batch
    import jax

    out = np.asarray(
        generate_prefix_batch(
            params.xformer,
            cfg.xformer_config,
            jax.random.PRNGKey(0),
            [prefix, prefix],
            stop_token=TOK.stop_token,
            k=5,
            inv_temp=1.0,
        )
    )
    assert (out[:, : len(prefix)] == np.asarray(prefix)).all()


def test_load_coati2_document(tmp_path):
    ref, params, cfg = make_pair("swiglu_resnet", seed=3)
    doc = {
        "train_args": {"tokenizer_vocab": "coati2_12_12"},
        "model": ref.state_dict(),
        "model_kwargs": {
            "n_layer_xformer": 2,
            "n_hidden_xformer": 32,
            "embed_dim": 32,
            "n_head": 2,
            "n_seq": 40,
            "mlp_dropout": 0.0,
            "enc_to_coati": "swiglu_resnet",
            "n_direct_clr": 64,
            "n_tok": TOK.n_token,
            "biases": True,
        },
    }
    path = tmp_path / "coati2_doc.pkl"
    with open(path, "wb") as f:
        pickle.dump(doc, f)
    model, tok = load_coati2(str(path))
    assert tok.n_token == TOK.n_token
    tokens = np.asarray(
        [tok.tokenize_text("[SMILES]CCO[STOP]", pad=True)], np.int32
    )
    model = COATI2(model.params, model.config.replace(precision="highest"))
    mine = np.asarray(model.encode_tokens(tokens, tok))

    class RT:
        stop_token = tok.stop_token

    with torch.no_grad():
        ref_h = ref.encode_tokens(torch.tensor(tokens, dtype=torch.long), RT()).numpy()
    np.testing.assert_allclose(mine, ref_h, atol=3e-5, rtol=1e-4)


def test_coati2_fused_embed_decode_matches_two_call():
    """COATI2.smiles_to_2d_batch (one device program) reproduces
    smiles_to_coati_vec + hcoati_to_2d_batch with the same rng seed."""
    import jax

    from coati_tpu.models.coati2 import COATI2, Coati2Config, init_coati2
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

    tok = TrieTokenizer(n_seq=48, **get_vocab("coati2_12_12"))
    cfg = Coati2Config(
        n_layer_xformer=2, n_hidden_xformer=32, embed_dim=32, n_head=2,
        n_seq=48, enc_to_coati="swiglu_resnet", n_tok=tok.n_token,
    )
    params = init_coati2(jax.random.PRNGKey(0), cfg)
    smiles = ["CCO", "CC", "CNC", "COC"]
    tokens = np.asarray(
        [tok.tokenize_text("[SMILES]" + s + "[STOP]", pad=True) for s in smiles],
        np.int32)

    m1 = COATI2(params, cfg, seed=9)
    fused, fused_h = m1.smiles_to_2d_batch(
        tokens, tok, inv_temp=2.0, k=8, return_embeddings=True)

    m2 = COATI2(params, cfg, seed=9)
    h = m2.smiles_to_coati_vec(smiles, tok)
    two_call = m2.hcoati_to_2d_batch(h, tok, inv_temp=2.0, k=8)

    np.testing.assert_allclose(fused_h, h, atol=1e-5)
    assert fused == two_call
