"""The reference's generation-quality acceptance protocol, end to end
(VERDICT r3 item 1).

Reference protocol (examples/simple_mol_generation/chembl_analysis.ipynb
cells 24-26): draw 10 x 1024 samples via
`complete_batch(["[SET][chembl_mols][SMILES]"]*1024, k=10_000,
inv_temp=1.75)`, then report fraction-valid, #unique-valid and
fraction-unique. This script (1) trains a grande-config COATI through
the REAL pretraining stack until its embeddings actually invert
(round 3's model greedy-round-tripped 1/554 for TWO now-fixed reasons:
stack_batch handed the xform empty (B, 0) atom columns so the EGNN saw
zero atoms and the 13.7x-weighted CLIP noise collapsed the encoder —
see data/xform.py _conformers_missing — and the eval compared decoded
CANONICAL strings against raw corpus strings; this run pins
EVAL_P_SMI=1, EVAL_P_RAND=0, EVAL_LR=1e-3 and trains longer),
(2) measures greedy embed->decode round-trip on train AND held-out
molecules, (3) runs the bulk protocol with validity/uniqueness computed
by the IN-TREE chemistry (chem/selfies_lite parse for validity — the
offline stand-in for Chem.MolFromSmiles — and chem/graph_canon
canonical SMILES for molecule-level uniqueness, stricter than the
notebook's raw-string set()).

Corpus honesty: the only offline molecule corpus is the 554-molecule
chembl_pic50 set (the reference trains on millions), so #unique-valid
is CAPPED near the corpus size in this memorization regime; the JSON
records the cap and a novelty rate (valid molecules outside the
training set) so the number is interpretable. tests/test_aux.py pins
the committed artifact's floors.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    EVAL_P_SMI=1.0 EVAL_P_RAND=0.0 EVAL_LR=1e-3 EVAL_STEPS=10000 \
    python scripts/eval_generation_quality.py
Knobs: EVAL_STEPS (default 10000), QUAL_BATCHES (10), QUAL_BATCH (1024),
    QUAL_K (10000), QUAL_INV_TEMP (1.75), --doc (skip training), --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eval_trained_decode import chembl_smiles, train_model, _valid_proxy  # noqa: E402

N_BATCHES = int(os.environ.get("QUAL_BATCHES", 10))
BATCH = int(os.environ.get("QUAL_BATCH", 1024))
TOP_K = int(os.environ.get("QUAL_K", 10_000))
INV_TEMP = float(os.environ.get("QUAL_INV_TEMP", 1.75))
HOLDOUT_FRAC = 0.1


def split_corpus(smiles):
    rng = np.random.default_rng(20260819)
    idx = rng.permutation(len(smiles))
    n_hold = max(1, int(len(smiles) * HOLDOUT_FRAC))
    hold = [smiles[i] for i in idx[:n_hold]]
    train = [smiles[i] for i in idx[n_hold:]]
    return train, hold


def greedy_roundtrip(model, tok, smiles):
    """fraction of molecules whose SMILES-clip embedding greedy-decodes
    back to the SAME MOLECULE (inv_temp 20, k 2 — the established
    greedy regime from eval_trained_decode.py). Two writing-invariance
    traps, both hit and fixed in round 4: (1) identity must be
    graph-level (canonical SMILES equality, the reference's
    identical_canonsmi semantics, rdkit_utils.py:88-96) because the
    model emits the canonical writing while the corpus stores an
    arbitrary one; (2) the ENCODE side must tokenize the CANONICAL
    writing — the training xform canonicalizes every row
    (clip_ar_xform <= clip_e2e.py:101), so h(canonical) is the key the
    decoder memorized; encoding the raw corpus writing produced a
    near-but-wrong key and 9% round-trip on a model whose
    teacher-forced inversion was 90%."""
    from coati_tpu.chem.rdkit_support import canon_smiles

    keep, enc = [], []
    for s in smiles:
        if not _valid_proxy(s, tok):
            continue
        try:
            c = canon_smiles(s)
        except Exception:  # noqa: BLE001
            continue
        if len(tok.tokenize_text("[SMILES]" + c + "[STOP]", pad=False)) \
                <= tok.n_seq:
            keep.append(s)
            enc.append(c)
    if not keep:
        return 0.0, 0
    toks = np.asarray(
        [tok.tokenize_text("[SMILES]" + c + "[STOP]", pad=True) for c in enc],
        np.int32,
    )
    from eval_trained_decode import _same_mol

    # chunked: one 2048-row decode compiles a ~31 GB KV/logit footprint
    # (4x the r4 499-row eval) and OOMs the 16 GB chip — measured
    # "Used 30.79G of 15.75G hbm" on the round-5 synth-corpus eval.
    # 512 rows is the bulk protocol's known-good decode scale x2.
    CHUNK = 512
    dec = []
    for lo in range(0, len(toks), CHUNK):
        part = toks[lo:lo + CHUNK]
        n_real = part.shape[0]
        if n_real < CHUNK:  # pad ragged tail: one compiled shape only
            part = np.concatenate(
                [part, np.repeat(part[-1:], CHUNK - n_real, axis=0)])
        h = model.encode_tokens(part, tok)
        dec.extend(model.hclip_to_2d_batch(h, tok, inv_temp=20.0,
                                           k=2)[:n_real])
    hits = sum(1 for a, b in zip(dec, keep) if _same_mol(a, b))
    return hits / len(keep), len(keep)


def _property_stats(smiles_list, max_n=4000):
    """Mean/std QED and Crippen MolLogP over a molecule set via the
    in-tree chemistry (chem/qed.py, chem/crippen.py) — the reference
    notebook scores its generations with rdkit.Chem.QED.qed and
    Crippen.MolLogP (chembl_analysis.ipynb 'properties' cell).
    Sets beyond `max_n` are scored on a seeded subsample (the SMARTS
    scorers run ~10^2/s on this one-core host; 10^5-molecule corpora
    would take an hour for a summary statistic)."""
    from coati_tpu.chem.crippen import mol_logp
    from coati_tpu.chem.qed import qed

    smiles_list = list(smiles_list)
    if len(smiles_list) > max_n:
        rng = np.random.default_rng(7)
        smiles_list = [smiles_list[i]
                       for i in rng.permutation(len(smiles_list))[:max_n]]
    qeds, logps = [], []
    for s in smiles_list:
        try:
            qeds.append(qed(s))
            logps.append(mol_logp(s))
        except Exception:  # noqa: BLE001
            pass
    if not qeds:
        return {"n_scored": 0}
    return {
        "n_scored": len(qeds),
        "qed_mean": float(np.mean(qeds)),
        "qed_std": float(np.std(qeds)),
        "logp_mean": float(np.mean(logps)),
        "logp_std": float(np.std(logps)),
    }


def bulk_protocol(model, tok, train_canonical, corpus_canonical=None):
    """`train_canonical` defines novelty for n_novel_canonical (the
    notebook's train-set novelty); `corpus_canonical` (train+holdout),
    when given, adds n_novel_vs_corpus — molecules outside EVERYTHING
    the enumerator wrote, the strictest novelty available offline."""
    from coati_tpu.chem.graph_canon import canonical_smiles
    from coati_tpu.chem.selfies_lite import parse_smiles

    drawn = []
    for i in range(N_BATCHES):
        print(f"batch: {i}/{N_BATCHES}", flush=True)
        drawn.extend(
            model.complete_batch(
                ["[SET][chembl_mols][SMILES]" for _ in range(BATCH)],
                tok,
                k=TOP_K,
                inv_temp=INV_TEMP,
            )
        )

    valid_drawn = []
    for d in drawn:
        try:
            parse_smiles(d)  # in-tree stand-in for Chem.MolFromSmiles
            valid_drawn.append(d)
        except Exception:  # noqa: BLE001
            pass

    canon = []
    for d in valid_drawn:
        try:
            canon.append(canonical_smiles(d))
        except Exception:  # noqa: BLE001
            pass
    unique_canon = set(canon)
    novel = unique_canon - train_canonical

    extra = {}
    if corpus_canonical is not None:
        extra["n_novel_vs_corpus"] = len(unique_canon - corpus_canonical)

    return {
        **extra,
        "n_samples": len(drawn),
        "fraction_valid": len(valid_drawn) / max(len(drawn), 1),
        # generated-set property profile vs the training corpus (the
        # reference notebook's QED/MolLogP analysis, in-tree chemistry)
        "properties_generated": _property_stats(sorted(unique_canon)),
        "properties_corpus": _property_stats(sorted(train_canonical)),
        # the notebook's metrics (cell 26): raw-string uniqueness
        "n_unique_valid": len(set(valid_drawn)),
        "fraction_unique": len(set(valid_drawn)) / max(len(valid_drawn), 1),
        # in-tree molecule-level (canonical) uniqueness — stricter
        "n_unique_canonical": len(unique_canon),
        "n_novel_canonical": len(novel),
        "mean_len": float(np.mean([len(d) for d in drawn])),
        "example_samples": sorted(unique_canon)[:10],
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="docs/eval_generation_quality.json")
    parser.add_argument("--doc", default=None,
                        help="skip training, evaluate this document")
    parser.add_argument("--corpus", default=None,
                        help="synthesized corpus (.smi[.gz], one canonical "
                             "SMILES/line from scripts/make_corpus.py) — "
                             "replaces the 554-molecule chembl_pic50 set; "
                             "the GENERALIZATION regime (VERDICT r4 item 1)")
    parser.add_argument("--conformers", default=None,
                        help="precomputed conformer sidecar .npz for --corpus")
    parser.add_argument("--rt_sample", type=int, default=2048,
                        help="round-trip eval subsample per split for large "
                             "corpora (the 554-molecule regime evaluates all)")
    parser.add_argument("--steps_trained", type=int, default=None,
                        help="with --doc: the step count the document was "
                             "actually trained for (EVAL_STEPS describes a "
                             "training run this invocation did not do)")
    args = parser.parse_args()

    # inversion-capable recipe unless the caller overrides
    os.environ.setdefault("EVAL_P_SMI", "1.0")
    os.environ.setdefault("EVAL_P_RAND", "0.0")
    os.environ.setdefault("EVAL_LR", "1e-3")
    steps = int(os.environ.get("EVAL_STEPS", 10_000))

    synth_ds = None
    if args.corpus:
        from coati_tpu.data.synth import SynthCorpusDataset

        synth_ds = SynthCorpusDataset.from_files(
            args.corpus, epoch_rows=0, conformers_path=args.conformers,
            collection="chembl_mols")
        print(f"synth corpus: {synth_ds.summary}", flush=True)
        smiles = synth_ds.smiles
        train, hold = synth_ds.split(HOLDOUT_FRAC)
    else:
        smiles = chembl_smiles()
        train, hold = split_corpus(smiles)
    if args.doc:
        doc = args.doc
    else:
        tmpdir = tempfile.mkdtemp(prefix="coati_qual_")
        doc, _ = train_model(
            tmpdir, smiles=train, collection="chembl_mols", steps=steps,
            dataset=synth_ds.subset(train) if synth_ds is not None else None)
        print(f"trained document: {doc}", flush=True)

    from coati_tpu.chem.graph_canon import canonical_smiles
    from coati_tpu.models.io import load_e3gnn_smiles_clip_e2e

    model, tok = load_e3gnn_smiles_clip_e2e(doc)

    def rt_subset(split):
        if len(split) <= args.rt_sample:
            return split
        rng = np.random.default_rng(11)
        return [split[i]
                for i in rng.permutation(len(split))[:args.rt_sample]]

    rt_train, n_train = greedy_roundtrip(model, tok, rt_subset(train))
    rt_hold, n_hold = greedy_roundtrip(model, tok, rt_subset(hold))
    print(f"greedy round-trip: train {rt_train:.1%} ({n_train}), "
          f"holdout {rt_hold:.1%} ({n_hold})", flush=True)

    def canon_set(split):
        out = set()
        for s in split:
            try:
                out.add(canonical_smiles(s))
            except Exception:  # noqa: BLE001
                pass
        return out

    train_canonical = canon_set(train)
    corpus_canonical = (train_canonical | canon_set(hold)) if args.corpus \
        else None
    bulk = bulk_protocol(model, tok, train_canonical,
                         corpus_canonical=corpus_canonical)

    verdict = {
        "doc": doc,
        "recipe": {
            "steps": (args.steps_trained
                      if args.doc and args.steps_trained else steps),
            "p_clip_emb_smi": float(os.environ["EVAL_P_SMI"]),
            "p_randsmiles": float(os.environ["EVAL_P_RAND"]),
            "lr": float(os.environ["EVAL_LR"]),
            "corpus_train": len(train),
            "corpus_holdout": len(hold),
            "corpus": args.corpus or "chembl_pic50 (554 molecules)",
            "rt_sample": args.rt_sample,
            "corpus_cap_note": (
                "synthesized corpus (scripts/make_corpus.py fragment "
                "recombination of the 554 chembl_pic50 seeds) — large "
                "enough that holdout round-trip and novelty measure "
                "GENERALIZATION, not memorization"
            ) if args.corpus else (
                "only 554 unique molecules exist offline (chembl_pic50); "
                "#unique-valid is corpus-capped in this memorization "
                "regime — the reference trains on millions"
            ),
        },
        "protocol": {
            "batches": N_BATCHES, "batch_size": BATCH,
            "k": TOP_K, "inv_temp": INV_TEMP,
            "reference": "chembl_analysis.ipynb cells 24-26",
        },
        "greedy_roundtrip_train": rt_train,
        "greedy_roundtrip_holdout": rt_hold,
        "bulk": bulk,
        # regime-aware acceptance. Memorization regime (554-molecule
        # offline corpus): the r4 floors — near-perfect train inversion
        # and bulk validity. Generalization regime (--corpus): holdout
        # inversion and NOVEL valid molecules are the product
        # (clip_e2e.py:544-588 noise decoding; chembl_analysis.ipynb
        # cell 26); floors are the round-5 measured result minus slack
        # (regression guards, not aspirations — the honest numbers are
        # the fields above, and tests/test_aux.py pins them).
        "ok": bool(
            (rt_hold >= 0.15 and rt_train >= 0.35
             and bulk["fraction_valid"] >= 0.50
             and bulk.get("n_novel_canonical", 0) >= 1000)
            if args.corpus else
            (rt_train >= 0.90 and bulk["fraction_valid"] >= 0.85)
        ),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(verdict, f, indent=2)
        f.write("\n")
    print(json.dumps({k: v for k, v in verdict.items()
                      if k not in ("recipe", "protocol")}, indent=2))
    print(f"verdict ok={verdict['ok']} -> {args.out}")
    sys.exit(0 if verdict["ok"] else 1)


if __name__ == "__main__":
    main()
