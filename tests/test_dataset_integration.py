"""End-to-end dataset pipeline test: synthetic pickle shards -> shuffled
rows -> hash-sharded partitioned batches -> clip_ar_xform -> device-ready
arrays, exercising COATI_dataset exactly as the trainer does."""

import os
import pickle

import numpy as np
import pytest

from coati_tpu.data.batch_pipe import get_mod_from_str
from coati_tpu.data.dataset import COATI_dataset, S3_PATH, prefetch
from coati_tpu.data.xform import clip_ar_xform
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

SMILES = ["C", "CC", "CCO", "c1ccccc1", "CCN", "CC(=O)O", "CCCC", "CCOC"]


@pytest.fixture()
def shard_dir(tmp_path):
    rng = np.random.default_rng(0)
    shard_root = tmp_path / S3_PATH
    os.makedirs(shard_root)
    rows = []
    for i in range(400):
        smi = SMILES[i % len(SMILES)] + "C" * (i % 3)
        n = 3 + i % 5
        rows.append(
            {
                "smiles": smi,
                "source_collection": "geom_drugs",
                "atoms": rng.integers(1, 9, size=(n,)).astype(np.float64),
                "coords": rng.normal(size=(n, 3)),
            }
        )
    for s in range(4):
        with open(shard_root / f"{s}.pkl", "wb") as f:
            pickle.dump(rows[s * 100 : (s + 1) * 100], f)
    return str(tmp_path)


def test_pipeline_end_to_end(shard_dir):
    tok = TrieTokenizer(n_seq=48, **get_vocab("mar"))
    ds = COATI_dataset(cache_dir=shard_dir, test_frac=0.1, valid_frac=0.1)

    def xform(batch):
        return clip_ar_xform(batch, tok, p_clip=0.9, p_randsmiles=0.0)

    batches = list(
        prefetch(
            ds.get_data_pipe(
                batch_size=16,
                partition="train",
                xform_routine=xform,
                shuffle_seed=0,
                row_buffer=64,
            )
        )
    )
    assert batches, "pipeline yielded no batches"
    total = 0
    for b in batches:
        assert b["tokens"].shape[0] == 16
        assert b["tokens"].dtype == np.int32
        assert b["atoms"].shape[0] == 16 and b["coords"].shape[2] == 3
        assert b["y_next"].shape == b["tokens"].shape
        # every row in the train partition must satisfy the hash split
        for smi, mod in zip(b["smiles"], b["mod_molecule"]):
            assert mod == get_mod_from_str(str(smi))
            assert mod % 100 >= 20  # (test+valid)*100
        total += 16
    assert total > 100


def test_partitions_are_disjoint_and_exhaustive(shard_dir):
    ds = COATI_dataset(cache_dir=shard_dir, test_frac=0.1, valid_frac=0.1)
    seen = {}
    for part in ("train", "valid", "test"):
        for b in ds.get_data_pipe(
            batch_size=4, partition=part, shuffle_seed=1, row_buffer=16
        ):
            for smi in b["smiles"]:
                key = str(smi)
                assert seen.get(key, part) == part, f"{key} in two partitions"
                seen[key] = part
    # all three partitions appear for this corpus
    assert set(seen.values()) == {"train", "valid", "test"}


def test_prefetch_propagates_worker_exceptions():
    """A corrupt shard mid-stream must fail the epoch, not silently end
    it (the worker used to swallow the exception and enqueue _END)."""
    from coati_tpu.data.dataset import prefetch

    def bad_iter():
        yield 1
        yield 2
        raise RuntimeError("corrupt shard")

    it = prefetch(bad_iter(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="corrupt shard"):
        next(it)
