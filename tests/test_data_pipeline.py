"""Data pipeline tests: md5 split semantics, stack_batch padding, batcher
sharding/partitioning, and clip_ar_xform parity vs the reference."""

import hashlib
import random
import sys
import types

import numpy as np
import pytest

from coati_tpu.data.batch_pipe import (
    batch_rows,
    get_mod_from_str,
    shuffle_buffer,
    stack_batch,
)
from coati_tpu.data.xform import clip_ar_xform
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

from .oracle import REF, ref_tokenizer


def test_get_mod_from_str_md5_semantics():
    # byte-identical to the reference: little-endian md5 mod 100_000
    for s in ["C", "CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O"]:
        expected = (
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest(), "little")
            % 100_000
        )
        assert get_mod_from_str(s) == expected


def test_stack_batch_pads_ragged():
    rows = [
        {"smiles": "C", "atoms": np.array([6]), "coords": np.zeros((1, 3))},
        {
            "smiles": "CCO",
            "atoms": np.array([6, 6, 8]),
            "coords": np.ones((3, 3)),
        },
    ]
    batch = stack_batch(rows)
    assert batch["atoms"].shape == (2, 3)
    assert batch["coords"].shape == (2, 3, 3)
    assert batch["atoms"][0, 1] == 0  # padded
    assert list(batch["smiles"]) == ["C", "CCO"]


def test_stack_batch_bucket():
    rows = [
        {"smiles": "C", "atoms": np.array([6] * 20), "coords": np.zeros((20, 3))}
    ]
    batch = stack_batch(rows, pad_to_bucket=True)
    assert batch["atoms"].shape == (1, 32)


def test_batch_rows_sharding_and_partition():
    rows = [
        {"smiles": f"C{'C' * (i % 7)}", "atoms": np.array([6]), "coords": np.zeros((1, 3))}
        for i in range(200)
    ]
    seen = set()
    for shard in range(4):
        for batch in batch_rows(
            iter([dict(r) for r in rows]),
            batch_size=4,
            partition="raw",
            distributed_rankmod_total=4,
            distributed_rankmod_rank=shard,
            required_fields=["smiles"],
            skip_last=False,
        ):
            for s, m in zip(batch["smiles"], batch["mod_molecule"]):
                assert m % 4 == shard
                seen.add((s, shard))
    # every unique smiles lands on exactly one shard
    shards_per_smiles = {}
    for s, shard in seen:
        shards_per_smiles.setdefault(s, set()).add(shard)
    assert all(len(v) == 1 for v in shards_per_smiles.values())


def test_shuffle_buffer_is_permutation():
    items = list(range(1000))
    out = list(shuffle_buffer(iter(items), 64, np.random.default_rng(0)))
    assert sorted(out) == items
    assert out != items


def _ref_clip_ar_xform():
    """Load the reference clip_ar_xform with rdkit stubbed so that
    CanonSmiles is OUR no-rdkit fallback (in-tree graph
    canonicalization) — both sides then canonicalize identically and
    the parity assertion covers the real offline canonical forms."""
    from coati_tpu.chem.rdkit_support import canonicalize_or_self

    if "rdkit" not in sys.modules:
        rdkit = types.ModuleType("rdkit")
        chem = types.ModuleType("rdkit.Chem")
        chem.CanonSmiles = canonicalize_or_self
        rdkit.Chem = chem
        sys.modules["rdkit"] = rdkit
        sys.modules["rdkit.Chem"] = chem
    from .oracle import load_ref_clip_e2e

    return load_ref_clip_e2e().clip_ar_xform


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_clip_ar_xform_parity(seed, monkeypatch):
    """Seeded-RNG parity with the reference augmentation pipeline: both
    consume the global `random` stream in the same order, so outputs must
    be token-identical. permute_smiles is stubbed to the identity on
    BOTH sides (the oracle shim already stubs the reference's; ours now
    really permutes via the in-tree parser, which would desync the
    shared RNG stream) — the permutation itself is pinned by
    tests/test_selfies_lite.py."""
    import coati_tpu.data.xform as xform_mod

    monkeypatch.setattr(xform_mod, "permute_smiles", lambda s: s)
    ref_xform = _ref_clip_ar_xform()
    rtok = ref_tokenizer("mar", n_seq=64)
    mtok = TrieTokenizer(n_seq=64, **get_vocab("mar"))

    def make_batch():
        return {
            "smiles": ["C", "CCO", "c1ccccc1", "CC(=O)O", "CCN"],
            "source_collection": ["geom_drugs"] * 5,
            "atoms": np.array([[6, 0, 0], [6, 6, 8], [6, 6, 6], [6, 6, 8], [6, 6, 7]], dtype=float),
            "coords": np.zeros((5, 3, 3)),
        }

    kwargs = dict(
        p_dataset=0.5, p_formula=0.5, p_fim=0.3, p_graph=0.0,
        p_clip=0.7, p_clip_cut=0.5, p_randsmiles=0.4,
    )
    random.seed(seed)
    ref_out = ref_xform(make_batch(), rtok, **kwargs)
    random.seed(seed)
    mine = clip_ar_xform(make_batch(), mtok, pad_width_to=0, **kwargs)

    np.testing.assert_array_equal(
        mine["tokens"], ref_out["tokens"].numpy().astype(np.int32)
    )
    np.testing.assert_array_equal(
        mine["raw_tokens"], ref_out["raw_tokens"].numpy().astype(np.int32)
    )
    np.testing.assert_array_equal(
        mine["y_next"], ref_out["y_next"].numpy().astype(np.int32)
    )


def test_clip_ar_xform_y_next_masks():
    mtok = TrieTokenizer(n_seq=64, **get_vocab("mar"))
    batch = {
        "smiles": ["CC(=O)Oc1ccccc1C(=O)O"],  # long enough for the CLIP prefix
        "source_collection": ["geom_drugs"],
        "atoms": np.array([[6, 6, 8]], dtype=float),
        "coords": np.zeros((1, 3, 3)),
    }
    out = clip_ar_xform(
        batch, mtok, p_dataset=0, p_formula=0, p_fim=0, p_graph=0,
        p_clip=1.0, p_clip_cut=0.0, p_randsmiles=0.0,
    )
    toks = out["tokens"][0]
    assert toks[0] == mtok.clip_token and toks[1] == mtok.unk_token
    # label for predicting the [UNK] hole and pads must be masked
    assert out["y_next"][0][0] == -1
    assert (out["y_next"][0][out["tokens"][0] == 0] <= 0).all()


def test_width_rounding_clamped_to_n_seq():
    """Rows near n_seq with a non-multiple-of-16 n_seq must not round the
    batch width past the model's rotary tables."""
    from coati_tpu.data.xform import clip_ar_xform
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

    tok = TrieTokenizer(n_seq=30, **get_vocab("mar_verysimple"))
    smiles = ["C" * 26]  # tokenizes to ~28 tokens with [SMILES]/[STOP]
    batch = {
        "smiles": smiles,
        "atoms": np.ones((1, 4), np.int32),
        "coords": np.zeros((1, 4, 3), np.float32),
        "source_collection": ["geom_drugs"],
    }
    out = clip_ar_xform(dict(batch), tok, p_clip=0.0, p_dataset=0.0,
                        p_formula=0.0, p_fim=0.0, p_graph=0.0)
    assert out["tokens"].shape[1] <= 30
    assert out["raw_tokens"].shape[1] <= 30


def test_fp_targets_offline():
    """fp_targets computes Morgan bit targets host-side through
    mol_to_morgan — offline via the in-tree ECFP engine
    (chem/fingerprints.py), with rdkit when present — so the fp-variant
    training recipe (clip_fp_e2e.py:273-278) runs without the package."""
    mtok = TrieTokenizer(n_seq=64, **get_vocab("mar"))
    batch = {
        "smiles": ["CCO", "c1ccccc1", "CC(=O)O"],
        "atoms": np.array([[6, 6, 8], [6, 6, 6], [6, 6, 8]], dtype=float),
        "coords": np.zeros((3, 3, 3)),
    }
    out = clip_ar_xform(
        batch, mtok, rng=random.Random(0), fp_targets=(("morgan", 512),)
    )
    fp = out["fp_morgan"]
    assert fp.shape == (3, 512) and fp.dtype == np.int32
    assert set(np.unique(fp)) <= {0, 1}
    assert fp.sum(axis=1).min() > 0  # every molecule sets some bits
    # deterministic across calls
    out2 = clip_ar_xform(
        dict(batch), mtok, rng=random.Random(1), fp_targets=(("morgan", 512),)
    )
    assert np.array_equal(out2["fp_morgan"], fp)
