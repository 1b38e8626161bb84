"""Published-checkpoint schema fixtures.

The real s3 pickles (reference README.md:71-82: tall_closed,
grande_closed, grade_closed_fp, barlow_closed_fp, barlow_closed,
autoreg_only, barlow_venti, grande_open, selfies_barlow) are
unreachable offline (PARITY.md), so conversion coverage of every
published schema VARIANT is pinned here instead: for each architecture
variant the reference torch model is constructed with that variant's
kwargs, serialized into a reference-format document exactly as
train_coati.py:37-57 writes them (flat torch state_dict + model_kwargs
envelope), loaded through our public loader, and embeddings compared
torch-vs-JAX.

Axes covered (clip_e2e.py:357-377 constructor flags):
  new/old projection architecture (incl. auto-detection), norm_clips
  off, torch_emb, token_mlp off, norm_embed, EGNN residual,
  no point encoder (autoreg_only), DataParallel 'module.' prefixes,
  fingerprint heads (clip_fp_e2e → grade_closed_fp/barlow_closed_fp),
  selfies vocab (→ selfies_barlow), and all three COATI2 enc_to_coati
  variants through load_coati2 (simple_coati2/io.py:21-84).
"""

import pickle

import numpy as np
import pytest
import torch

from coati_tpu.models.api import COATI
from coati_tpu.models.io import load_coati2, load_e3gnn_smiles_clip_e2e
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

from .oracle import (
    load_ref_clip_e2e,
    load_ref_module,
    load_ref_simple_coati2_transformer_only,
    ref_tokenizer,
)

VOCAB = "mar"
SMILES = ["C", "CCO", "c1ccccc1", "CC(=O)O"]

BASE_KWARGS = dict(
    n_layer_e3gnn=1,
    n_layer_xformer=2,
    n_hidden_xformer=32,
    n_hidden_e3nn=32,
    msg_cutoff_e3nn=6.0,
    n_embd_common=32,
    n_head=2,
    n_seq=40,
    biases=True,
    torch_emb=False,
    residual=False,
    norm_clips=True,
    norm_embed=False,
    token_mlp=True,
    use_point_encoder=True,
)

# schema axes of the 9 published models; every case is one reference
# constructor-flag combination
VARIANTS = {
    "default_new_arch": {},  # grande/tall/barlow_closed, barlow_venti, grande_open
    "old_architecture": {"old_architecture": True},
    "no_norm_clips": {"norm_clips": False},
    "torch_emb": {"torch_emb": True},
    "no_token_mlp": {"token_mlp": False},
    "norm_embed": {"norm_embed": True},
    "egnn_residual": {"residual": True},
    "autoreg_only": {"use_point_encoder": False},
}


def _write_doc(tmp_path, state_dict, model_kwargs, vocab=VOCAB, prefix=""):
    doc = {
        "train_args": {"tokenizer_vocab": vocab},
        "dataset_summary": {},
        "model": {prefix + k: v for k, v in state_dict.items()},
        "optimizer": None,
        "model_kwargs": dict(model_kwargs),
        "n_toks_processed": 0,
        "offline_loss": {"ar_losses": [], "clip_losses": []},
    }
    path = tmp_path / "doc.pkl"
    with open(path, "wb") as f:
        pickle.dump(doc, f)
    return str(path)


def _make_ref(overrides, seed=0):
    ce = load_ref_clip_e2e()
    rtok = ref_tokenizer(VOCAB, n_seq=40)
    torch.manual_seed(seed)
    kwargs = dict(BASE_KWARGS, n_tok=rtok.n_token, **overrides)
    ref = ce.e3gnn_smiles_clip_e2e(
        **kwargs, device=torch.device("cpu"), dtype=torch.float32
    )
    ref.eval()
    return ref, rtok, kwargs


def _token_batch(tok):
    return np.asarray(
        [tok.tokenize_text("[SMILES]" + s + "[STOP]", pad=True) for s in SMILES],
        np.int32,
    )


def _assert_doc_parity(path, ref, rtok, **load_kwargs):
    model, tok = load_e3gnn_smiles_clip_e2e(path, **load_kwargs)
    model = COATI(model.params, model.config.replace(precision="highest"))
    toks = _token_batch(tok)
    with torch.no_grad():
        want = ref.encode_tokens(torch.tensor(toks, dtype=torch.long), rtok).numpy()
    got = np.asarray(model.encode_tokens(toks, tok))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
    return model, tok


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_schema_variant_document_parity(name, tmp_path):
    overrides = VARIANTS[name]
    ref, rtok, kwargs = _make_ref(overrides)
    # old_architecture reaches the reference loader as a LOAD flag, not a
    # stored kwarg (io/coati.py:78-80) — keep it out of the document
    doc_kwargs = {k: v for k, v in kwargs.items() if k != "old_architecture"}
    path = _write_doc(tmp_path, ref.state_dict(), doc_kwargs)
    # our loader auto-detects old_architecture from the projection key
    # order, so no flag is needed even for old-architecture documents
    _assert_doc_parity(path, ref, rtok)


def test_old_architecture_explicit_flag(tmp_path):
    ref, rtok, kwargs = _make_ref({"old_architecture": True})
    doc_kwargs = {k: v for k, v in kwargs.items() if k != "old_architecture"}
    path = _write_doc(tmp_path, ref.state_dict(), doc_kwargs)
    _assert_doc_parity(path, ref, rtok, old_architecture=True)


def test_dataparallel_module_prefix(tmp_path):
    """Documents saved from nn.DataParallel carry 'module.'-prefixed keys
    (io/coati.py:64-69)."""
    ref, rtok, kwargs = _make_ref({})
    path = _write_doc(tmp_path, ref.state_dict(), kwargs, prefix="module.")
    _assert_doc_parity(path, ref, rtok)


def test_fp_document_parity(tmp_path):
    """grade_closed_fp / barlow_closed_fp schema: clip_fp_e2e with
    fingerprint heads; loads through the same loader with heads
    auto-detected, and the fp predictions match torch."""
    fp_mod = load_ref_module("coati.models.encoding.clip_fp_e2e")
    rtok = ref_tokenizer(VOCAB, n_seq=40)
    torch.manual_seed(0)
    kwargs = {
        k: v
        for k, v in dict(BASE_KWARGS, n_tok=rtok.n_token).items()
        if k not in ("residual", "use_point_encoder", "msg_cutoff_e3nn")
    }
    fp_map = {"morgan": 64, "maccs": 32}
    ref = fp_mod.e3gnn_smiles_clip_e2e(
        **kwargs, fp_map=fp_map, device=torch.device("cpu"), dtype=torch.float32
    )
    ref.eval()
    path = _write_doc(tmp_path, ref.state_dict(), {**kwargs, "fp_map": fp_map})
    model, tok = _assert_doc_parity(path, ref, rtok, model_type="fp")
    toks = _token_batch(tok)
    for head in fp_map:
        with torch.no_grad():
            want = ref.get_fp_pred_v2(
                torch.tensor(toks, dtype=torch.long), rtok, head
            ).numpy()
        got = np.asarray(model.get_fp_pred_v2(toks, tok, head))
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_selfies_document_wraps_tokenizer(tmp_path):
    """selfies_barlow schema: the loader must return a selfies-rebound
    tokenizer for selfies vocabs (reference io/coati.py:90-92)."""
    from coati_tpu.tokenizers.selfies_support import selfies_pre_tokenize

    ce = load_ref_clip_e2e()
    vocab = get_vocab("selfies_mcp_clone")
    mtok = TrieTokenizer(n_seq=40, side_tasks=False, **vocab)
    torch.manual_seed(0)
    kwargs = dict(BASE_KWARGS, n_tok=mtok.n_token)
    ref = ce.e3gnn_smiles_clip_e2e(
        **kwargs, device=torch.device("cpu"), dtype=torch.float32
    )
    ref.eval()
    path = _write_doc(tmp_path, ref.state_dict(), kwargs, vocab="selfies_mcp_clone")
    model, tok = load_e3gnn_smiles_clip_e2e(path)
    assert getattr(tok.pre_tokenize, "__func__", None) is selfies_pre_tokenize
    # embedding parity on raw token ids built with the UNWRAPPED
    # tokenizer (the selfies rebinding needs the absent selfies package;
    # encode_tokens itself only consumes ids)
    toks = np.asarray(
        [mtok.tokenize_text("[SMILES][STOP]", pad=True) for _ in range(2)], np.int32
    )
    model = COATI(model.params, model.config.replace(precision="highest"))
    with torch.no_grad():
        want = ref.encode_tokens(
            torch.tensor(toks, dtype=torch.long), mtok
        ).numpy()
    got = np.asarray(model.encode_tokens(toks, tok))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("variant", ["linear", "swiglu_mlp", "swiglu_resnet"])
def test_coati2_document_parity(variant, tmp_path):
    """COATI2 pickle schema per enc_to_coati mode through load_coati2
    (simple_coati2/io.py:54-68 reconstructs kwargs explicitly)."""
    to = load_ref_simple_coati2_transformer_only()
    tok = TrieTokenizer(n_seq=40, **get_vocab("coati2_12_12"))
    torch.manual_seed(0)
    kwargs = dict(
        n_layer_xformer=2,
        n_hidden_xformer=32,
        embed_dim=32,
        n_head=2,
        n_seq=40,
        mlp_dropout=0.0,
        enc_to_coati=variant,
        n_direct_clr=16,
        n_tok=tok.n_token,
        biases=True,
    )
    ref = to.COATI_Smiles_Inference(
        **kwargs, device=torch.device("cpu"), dtype=torch.float32
    )
    ref.eval()
    path = _write_doc(
        tmp_path,
        ref.state_dict(),
        {**kwargs, "device": "cpu", "dtype": "torch.float32"},
        vocab="coati2_12_12",
    )
    model, tok2 = load_coati2(path, force_cpu=True)
    toks = np.asarray(
        [tok2.tokenize_text("[SMILES]" + s + "[STOP]", pad=True) for s in SMILES],
        np.int32,
    )

    class RT:
        stop_token = tok2.stop_token

    with torch.no_grad():
        want = ref.encode_tokens(torch.tensor(toks, dtype=torch.long), RT()).numpy()
    got = np.asarray(model.encode_tokens(toks, tok2))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
