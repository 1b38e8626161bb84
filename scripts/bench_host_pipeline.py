"""Host input-pipeline throughput vs device consumption (VERDICT item 5).

The pretrain loop consumes device batches at 1577-1828 samples/s/chip
(PERF.md); this measures whether the host side — clip_ar_xform
augmentation + trie tokenization over real molecules, fanned out by
data/host_workers.XformWorkerPool — can sustain that rate, and how many
host cores it takes.

Corpus: the 566 real ChEMBL molecules shipped in-tree
(reference examples/metadynamics/chembl_pic50.pkl), tiled to the batch
size, with synthetic conformer fields (atoms/coords enter the xform as
passthrough arrays; their generation belongs to dataset preprocessing,
not the per-step path). Measured at the grande recipe shapes
(n_seq 80, per-device batch 160, p_clip 0.9 / p_dataset 0.2 /
p_formula 0.2 — training/config.py grande_config).

Canonicalization note: without rdkit, canonicalize_or_self now runs the
in-tree graph canonicalizer (chem/graph_canon.py, ~3.6 ms/molecule cold
but LRU-cached — repeated epochs over a corpus pay it once), so the
numbers include real canonicalization after the first pass over the
corpus. With rdkit present the same script measures the full reference
cost (canonicalize=True exercises it).

Usage: python scripts/bench_host_pipeline.py [--batch 160] [--n-batches 30]
Prints per-config samples/s and the core count needed to feed one chip.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHEMBL_PKL = "/root/reference/examples/metadynamics/chembl_pic50.pkl"
DEVICE_RATE = 1828.0  # samples/s/chip, PERF.md grande train step


def corpus_smiles():
    if os.path.exists(CHEMBL_PKL):
        with open(CHEMBL_PKL, "rb") as f:
            rows = pickle.load(f)
        out = [r["smiles"] for r in rows if isinstance(r.get("smiles"), str)]
        if out:
            return out
    return ["CC(=O)Oc1ccccc1C(=O)O", "CN1C=NC2=C1C(=O)N(C(=O)N2C)C"]


def raw_batches(smiles, batch, n_batches, seed=0):
    rng = np.random.default_rng(seed)
    n_atoms = 64
    for i in range(n_batches):
        idx = rng.integers(0, len(smiles), size=batch)
        yield {
            "smiles": [smiles[j] for j in idx],
            "atoms": rng.integers(1, 9, size=(batch, n_atoms)).astype(np.int32),
            "coords": rng.normal(size=(batch, n_atoms, 3)).astype(np.float32),
            "source_collection": ["bench"] * batch,
            "mod_molecule": rng.integers(0, 100000, size=batch),
        }


GRANDE_XFORM = dict(p_dataset=0.2, p_formula=0.2, p_fim=0.0, p_graph=0.0,
                    p_clip=0.9, p_clip_cut=0.3, p_randsmiles=0.0)


def bench_single(smiles, batch, n_batches, n_seq):
    import random

    from coati_tpu.data.xform import clip_ar_xform
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

    tokenizer = TrieTokenizer(n_seq=n_seq, **get_vocab("mar"))
    rng = random.Random(0)
    batches = list(raw_batches(smiles, batch, n_batches))
    # warmup (vocab caches etc.)
    clip_ar_xform(batches[0], tokenizer=tokenizer, rng=rng, **GRANDE_XFORM)
    t0 = time.perf_counter()
    n = 0
    for b in batches:
        out = clip_ar_xform(b, tokenizer=tokenizer, rng=rng, **GRANDE_XFORM)
        n += out["tokens"].shape[0]
    dt = time.perf_counter() - t0
    return n / dt


def bench_pool(smiles, batch, n_batches, n_seq, n_workers):
    from coati_tpu.data.host_workers import XformWorkerPool

    batches = list(raw_batches(smiles, batch, n_batches))
    with XformWorkerPool(
        vocab_name="mar", n_seq=n_seq, xform_kwargs=GRANDE_XFORM,
        n_workers=n_workers,
    ) as pool:
        it = pool.map(iter(batches))
        first = next(it)  # absorb worker start + first dispatch
        t0 = time.perf_counter()
        n = 0
        for out in it:
            n += out["tokens"].shape[0]
        dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=160)
    ap.add_argument("--n-batches", type=int, default=30)
    ap.add_argument("--n-seq", type=int, default=80)
    args = ap.parse_args()

    smiles = corpus_smiles()
    cores = os.cpu_count() or 1
    try:
        import rdkit  # noqa: F401

        rdkit_note = "rdkit PRESENT (full canonicalization cost measured)"
    except ImportError:
        rdkit_note = (
            "rdkit ABSENT (in-tree chemistry: graph_canon canonicalization "
            "+ stereo-safe permutation measured)"
        )
    print(f"host cores: {cores}; corpus: {len(smiles)} ChEMBL molecules; {rdkit_note}")

    single = bench_single(smiles, args.batch, args.n_batches, args.n_seq)
    need = DEVICE_RATE / single
    print(
        f"single-core xform: {single:.0f} samples/s "
        f"(device needs {DEVICE_RATE:.0f}/chip -> {need:.2f} cores/chip)"
    )
    for w in sorted({1, min(2, cores), max(1, cores - 2)}):
        rate = bench_pool(smiles, args.batch, args.n_batches, args.n_seq, w)
        print(
            f"XformWorkerPool n_workers={w}: {rate:.0f} samples/s "
            f"({rate / DEVICE_RATE:.2f} chips fed)"
        )


if __name__ == "__main__":
    main()
