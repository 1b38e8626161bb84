"""SynthCorpusDataset (data/synth.py): the precomputed-conformer corpus
pipe standing in for the reference's s3 tensor-shard datasets
(reference coati/data/dataset.py:37-103; rows there carry precomputed
ETKDG atoms/coords columns, rdkit_utils.py:162-219)."""

import gzip

import numpy as np
import pytest

from coati_tpu.data.synth import (
    SynthCorpusDataset,
    load_conformer_sidecar,
    load_corpus,
)

SMILES = [
    "CCO", "CCN", "CCC", "CCCl", "CC=O", "CCF",
    "c1ccccc1", "Cc1ccccc1", "CCOC", "CC(C)O",
]


def _sidecar(tmp_path, smiles, fail=()):
    atoms, coords = [], []
    for i, s in enumerate(smiles):
        n = 0 if s in fail else 3 + i
        atoms.append(np.full((n,), 6, np.int32))
        coords.append(np.arange(n * 3, dtype=np.float32).reshape(n, 3))
    p = str(tmp_path / "conf.npz")
    np.savez_compressed(p, smiles=np.array(smiles),
                        atoms=np.array(atoms, dtype=object),
                        coords=np.array(coords, dtype=object))
    return p


def test_from_files_and_sidecar(tmp_path):
    cp = str(tmp_path / "c.smi.gz")
    with gzip.open(cp, "wt") as f:
        f.write("\n".join(SMILES) + "\n")
    sp = _sidecar(tmp_path, SMILES, fail={"CCF"})
    assert load_corpus(cp) == SMILES
    side = load_conformer_sidecar(sp)
    assert "CCF" not in side  # failed rows omitted -> xform fallback
    ds = SynthCorpusDataset.from_files(cp, epoch_rows=8, conformers_path=sp)
    assert ds.summary["n_molecules"] == len(SMILES)
    assert ds.summary["n_with_conformers"] == len(SMILES) - 1


def test_rows_carry_precomputed_conformers(tmp_path):
    sp = _sidecar(tmp_path, SMILES)
    ds = SynthCorpusDataset(SMILES, epoch_rows=8,
                            conformers=load_conformer_sidecar(sp))
    batch = next(ds.get_data_pipe(batch_size=4))
    assert batch["atoms"].shape[0] == 4
    assert batch["atoms"].shape[1] > 0
    # every row's atoms match its sidecar entry (padded with zeros)
    for i, s in enumerate(batch["smiles"]):
        a, c = ds.conformers[str(s)]
        assert (batch["atoms"][i, :a.shape[0]] == a).all()
        assert batch["atoms"][i, a.shape[0]:].sum() == 0
        np.testing.assert_allclose(batch["coords"][i, :c.shape[0]], c)


def test_epoch_passes_never_straddle_batches():
    # 10 molecules, batch 4 -> per-pass 8 rows; each pass is a fresh
    # permutation prefix, and no batch mixes two passes
    ds = SynthCorpusDataset(SMILES, epoch_rows=40)
    seen_batches = [list(b["smiles"]) for b in ds.get_data_pipe(batch_size=4)]
    assert len(seen_batches) == 10
    for i in range(0, len(seen_batches), 2):
        two = seen_batches[i] + seen_batches[i + 1]
        assert len(set(two)) == 8  # one pass: no duplicates within it


def test_split_deterministic_and_disjoint():
    ds = SynthCorpusDataset(SMILES, epoch_rows=4)
    t1, h1 = ds.split(holdout_frac=0.2)
    t2, h2 = ds.split(holdout_frac=0.2)
    assert t1 == t2 and h1 == h2
    assert not set(t1) & set(h1)
    assert sorted(t1 + h1) == sorted(SMILES)
    sub = ds.subset(t1, epoch_rows=4)
    batch = next(sub.get_data_pipe(batch_size=4))
    assert set(batch["smiles"]) <= set(t1)


def test_xform_consumes_precomputed_rows(tmp_path):
    """End-to-end: a batch with sidecar conformers passes through the
    real clip_ar_xform without triggering per-row synthesis."""
    from coati_tpu.data import xform as xf
    from coati_tpu.data.xform import clip_ar_xform
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

    tok = TrieTokenizer(n_seq=64, **get_vocab("mar"))
    sp = _sidecar(tmp_path, SMILES)
    ds = SynthCorpusDataset(SMILES, epoch_rows=4,
                            conformers=load_conformer_sidecar(sp))
    before = dict(xf.EMBED_FAIL_COUNTS)
    batch = next(ds.get_data_pipe(
        batch_size=4,
        xform_routine=lambda b: clip_ar_xform(
            b, tok, p_dataset=0.0, p_formula=0.0, p_fim=0.0, p_graph=0.0,
            p_clip=1.0, p_clip_cut=0.0, p_randsmiles=0.0),
    ))
    assert batch["tokens"].shape[0] == 4
    assert (np.asarray(batch["atoms"]) > 0).any(axis=-1).all()
    # no synthesis attempts were made for sidecar-covered rows
    assert xf.EMBED_FAIL_COUNTS["attempted"] == before["attempted"]
