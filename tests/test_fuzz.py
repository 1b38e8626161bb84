"""Property / fuzz tests (the reference's defensive batch-skips and
exception swallowing, SURVEY §4, turned into real checks)."""

import random
import string

import numpy as np
import pytest

from coati_tpu.data.xform import clip_ar_xform
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

TOK = TrieTokenizer(n_seq=48, **get_vocab("mar"))


def test_tokenize_decode_roundtrip_property():
    """tokenize ∘ decode == id over random concatenations of vocab tokens."""
    rng = random.Random(0)
    smiles_tokens = get_vocab("mar")["smiles_tokens"]
    for _ in range(200):
        parts = [rng.choice(smiles_tokens) for _ in range(rng.randint(1, 12))]
        text = "".join(parts)
        try:
            ids = TOK.tokenize_text("[SMILES]" + text + "[STOP]", pad=True)
        except (KeyError, ValueError):
            continue  # oversized
        assert TOK.decode(ids, special=False) == text


def test_malformed_rows_do_not_crash_xform():
    """Garbage SMILES must degrade to loss-inert rows, not exceptions
    (reference behavior: clip_e2e.py:268-286)."""
    rng = random.Random(1)
    garbage = [
        "".join(rng.choice(string.printable) for _ in range(rng.randint(1, 30)))
        for _ in range(10)
    ]
    batch = {
        "smiles": garbage,
        "source_collection": ["geom_drugs"] * len(garbage),
        "atoms": np.ones((len(garbage), 3)),
        "coords": np.zeros((len(garbage), 3, 3)),
    }
    out = clip_ar_xform(batch, TOK, p_clip=0.5, p_randsmiles=0.3)
    assert out["tokens"].shape[0] == len(garbage)
    assert out["y_next"].shape == out["tokens"].shape
    # failed rows are all-pad -> fully masked labels
    dead = (out["tokens"].sum(axis=1) == 0)
    assert (out["y_next"][dead] <= 0).all()


def test_decode_arbitrary_ids_never_crashes():
    rng = np.random.default_rng(2)
    for _ in range(50):
        ids = rng.integers(0, TOK.n_token, size=rng.integers(0, 60)).tolist()
        out = TOK.decode(ids, special=False)
        assert isinstance(out, str)
        out2 = TOK.decode(ids, special=True, de_fim=True)
        assert isinstance(out2, str)


def test_batch_smiles_empty_and_oversized():
    arr, bad = TOK.batch_smiles([])
    assert arr.shape[0] == 0 and bad == []
    long_smiles = "C" * 500
    arr, bad = TOK.batch_smiles(["C", long_smiles], skip_failed=True)
    # the oversized row is reported in bad_idxs and DROPPED from the
    # output (kept rows only) — pin both halves of that contract
    assert bad == [1]
    assert arr.shape[0] == 1
