"""Sharded-inference tests on the virtual 8-device mesh: outputs must be
identical to single-device execution (embedding) and well-formed for
generation; non-multiple batch sizes handled via row padding."""

import numpy as np
import pytest

import jax

from coati_tpu.models.api import COATI
from coati_tpu.models.coati import CoatiConfig, init_coati
from coati_tpu.parallel.inference import ShardedCOATI
from coati_tpu.parallel.mesh import make_mesh
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer


@pytest.fixture(scope="module")
def setup():
    tok = TrieTokenizer(n_seq=32, **get_vocab("mar"))
    cfg = CoatiConfig(
        n_layer_e3gnn=1,
        n_layer_xformer=2,
        n_hidden_xformer=32,
        n_hidden_e3nn=32,
        n_embd_common=32,
        n_head=2,
        n_seq=32,
        n_tok=tok.n_token,
        norm_clips=True,
        token_mlp=True,
        precision="highest",
    )
    model = COATI(init_coati(jax.random.PRNGKey(0), cfg), cfg)
    sharded = ShardedCOATI(model, make_mesh())
    return model, sharded, tok


def test_sharded_encode_matches_single_device(setup):
    model, sharded, tok = setup
    smiles = ["C", "CCO", "c1ccccc1", "CCN", "CC(=O)O"] * 4  # 20 rows (not /8)
    tokens = np.asarray(
        [tok.tokenize_text("[SMILES]" + s + "[STOP]", pad=True) for s in smiles],
        np.int32,
    )
    single = np.asarray(model.encode_tokens(tokens, tok))
    multi = sharded.encode_tokens(tokens, tok)
    np.testing.assert_allclose(multi, single, atol=1e-5, rtol=1e-5)


def test_sharded_encode_points_matches(setup):
    model, sharded, tok = setup
    rng = np.random.default_rng(0)
    atoms = rng.integers(1, 9, size=(12, 8)).astype(np.int32)
    coords = rng.normal(size=(12, 8, 3)).astype(np.float32)
    single = np.asarray(model.encode_points(atoms, coords))
    multi = sharded.encode_points(atoms, coords)
    np.testing.assert_allclose(multi, single, atol=1e-5, rtol=1e-5)


def test_sharded_generation_runs(setup):
    model, sharded, tok = setup
    h = np.random.default_rng(1).normal(size=(10, 32)).astype(np.float32)
    out = sharded.hclip_to_2d_batch(h, tok, k=10, inv_temp=1.0)
    assert len(out) == 10
    assert all(isinstance(s, str) for s in out)


def test_sharded_greedy_generation_matches_single_device(setup):
    """k=1 decoding is deterministic; sharding the batch over the mesh
    must not change the generated tokens."""
    model, sharded, tok = setup
    h = np.random.default_rng(5).normal(size=(8, 32)).astype(np.float32)
    single = model.hclip_to_2d_batch(h, tok, k=1, inv_temp=1.0)
    multi = sharded.hclip_to_2d_batch(h, tok, k=1, inv_temp=1.0)
    assert single == multi


# ------------------------------------------------- COATI2 (round 4)


@pytest.fixture(scope="module")
def setup2():
    from coati_tpu.models.coati2 import COATI2, Coati2Config, init_coati2
    from coati_tpu.parallel.inference import ShardedCOATI2

    tok = TrieTokenizer(n_seq=48, **get_vocab("coati2_12_12"))
    cfg = Coati2Config(
        n_layer_xformer=2, n_hidden_xformer=32, embed_dim=32, n_head=2,
        n_seq=48, enc_to_coati="swiglu_resnet", n_tok=tok.n_token,
        precision="highest",
    )
    model = COATI2(init_coati2(jax.random.PRNGKey(0), cfg), cfg)
    sharded = ShardedCOATI2(model, make_mesh())
    return model, sharded, tok


def test_coati2_sharded_encode_matches_single_device(setup2):
    model, sharded, tok = setup2
    smiles = ["C", "CCO", "c1ccccc1", "CCN", "CC(=O)O"] * 4  # 20 (not /8)
    tokens = np.asarray(
        [tok.tokenize_text("[SMILES]" + s + "[STOP]", pad=True) for s in smiles],
        np.int32,
    )
    single = np.asarray(model.encode_tokens(tokens, tok))
    multi = sharded.encode_tokens(tokens, tok)
    np.testing.assert_allclose(multi, single, atol=1e-5, rtol=1e-5)


def test_coati2_sharded_greedy_matches_single_device(setup2):
    """Sharded COATI2 decode must be token-identical to the one-device
    model under deterministic (k=1) sampling — the VERDICT r3 item 4
    done-criterion."""
    model, sharded, tok = setup2
    h = np.random.default_rng(5).normal(size=(8, 32)).astype(np.float32)
    single = model.hcoati_to_2d_batch(h, tok, k=1, inv_temp=1.0)
    multi = sharded.hcoati_to_2d_batch(h, tok, k=1, inv_temp=1.0)
    assert single == multi


def test_coati2_sharded_conditioned_generation(setup2):
    """Property-conditioned prefixes ('[PROPS]...[ENDPROPS][SMILES]')
    decode under the mesh via fill_in_from, like single-device COATI2."""
    model, sharded, tok = setup2
    h = np.random.default_rng(7).normal(size=(5, 32)).astype(np.float32)
    fill = "[PROPS][PercentQED][NUM80][ENDPROPS][SMILES]"
    single = model.hcoati_to_2d_batch(h, tok, fill_in_from=fill,
                                      k=1, inv_temp=1.0)
    multi = sharded.hcoati_to_2d_batch(h, tok, fill_in_from=fill,
                                       k=1, inv_temp=1.0)
    assert single == multi
    assert len(multi) == 5 and all(isinstance(s, str) for s in multi)
