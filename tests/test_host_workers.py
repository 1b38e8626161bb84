"""Multiprocess xform pool test."""

import numpy as np

from coati_tpu.data.host_workers import XformWorkerPool


def make_raw_batch(i):
    smiles = ["C", "CCO", "c1ccccc1", "CC(=O)O"]
    return {
        "smiles": smiles,
        "source_collection": ["geom_drugs"] * len(smiles),
        "atoms": np.ones((len(smiles), 4)) * 6,
        "coords": np.zeros((len(smiles), 4, 3)),
        "index": i,
    }


def test_pool_transforms_batches():
    with XformWorkerPool(
        "mar", 48, xform_kwargs=dict(p_clip=0.9, p_randsmiles=0.0), n_workers=2
    ) as pool:
        out = list(pool.map(make_raw_batch(i) for i in range(6)))
    assert len(out) == 6
    # ordered streaming
    assert [b["index"] for b in out] == list(range(6))
    for b in out:
        assert b["tokens"].shape[0] == 4
        assert "y_next" in b and "raw_tokens" in b
