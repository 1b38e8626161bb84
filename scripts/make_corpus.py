"""Synthesize the offline training corpus (VERDICT r4 item 1).

Enumerates fragment-recombination products of the 554 chembl_pic50 seed
molecules (chem/enumerate.py), filtered to tokenize within the grande
training seq budget, and writes:

  corpora/chembl_synth_v1.smi.gz   one canonical SMILES per line
                                   (committed — the corpus is a few
                                   hundred KB gzipped and makes every
                                   downstream eval reproducible)
  docs/corpus_synth_v1.json        enumeration stats + a property
                                   profile (heavy atoms, token length,
                                   QED, MolLogP) of a corpus sample vs
                                   the seeds — evidence the synthetic
                                   distribution tracks the real one

  --conformers PATH (optional): precompute distance-geometry conformers
  for every corpus molecule into an .npz (atoms/coords ragged arrays,
  ~1 KB/molecule — NOT committed; regenerate on demand). The reference
  datasets ship precomputed ETKDG columns the same way
  (reference coati/containers/rdkit_utils.py:162-219; dataset rows in
  coati/data/dataset.py carry atoms/coords tensors).

Usage: python scripts/make_corpus.py [--n 120000] [--seed 1]
           [--conformers /tmp/corpus_conf_v1.npz]
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHEMBL_PKL = "/root/reference/examples/metadynamics/chembl_pic50.pkl"
MAX_TOKENS = 76  # [SMILES] + body + [STOP] + clip slot < n_seq 80


def seed_smiles():
    with open(CHEMBL_PKL, "rb") as f:
        rows = pickle.load(f)
    out = set()
    for r in rows:
        s = r.get("SMILES") or r.get("smiles")
        if isinstance(s, str) and s:
            out.add(s)
    return sorted(out)


def profile(smiles, tok, n_props=2000, rng=None):
    """Distribution summary used to compare corpus vs seeds."""
    from coati_tpu.chem.crippen import mol_logp
    from coati_tpu.chem.qed import qed
    from coati_tpu.chem.selfies_lite import parse_smiles

    rng = rng or np.random.default_rng(0)
    heavy, toklen = [], []
    for s in smiles:
        heavy.append(len(parse_smiles(s).atoms))
        toklen.append(len(tok.tokenize_text("[SMILES]" + s + "[STOP]",
                                            pad=False)))
    idx = rng.permutation(len(smiles))[:n_props]
    qeds, logps = [], []
    for i in idx:
        try:
            logps.append(mol_logp(smiles[i]))
            qeds.append(qed(smiles[i]))
        except Exception:  # noqa: BLE001 - profile is best-effort
            continue
    def q(v):
        v = np.asarray(v, np.float64)
        return {
            "mean": round(float(v.mean()), 4),
            "p10": round(float(np.percentile(v, 10)), 4),
            "p50": round(float(np.percentile(v, 50)), 4),
            "p90": round(float(np.percentile(v, 90)), 4),
        }
    return {
        "n": len(smiles),
        "heavy_atoms": q(heavy),
        "token_len": q(toklen),
        "qed": q(qeds),
        "mol_logp": q(logps),
        "n_property_sample": len(qeds),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=120_000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--out", default="corpora/chembl_synth_v1.smi.gz")
    ap.add_argument("--stats", default="docs/corpus_synth_v1.json")
    ap.add_argument("--conformers", default=None)
    args = ap.parse_args()

    from coati_tpu.chem.enumerate import enumerate_corpus
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

    tok = TrieTokenizer(n_seq=80, **get_vocab("mar"))

    def accept(s: str) -> bool:
        try:
            return len(tok.tokenize_text(
                "[SMILES]" + s + "[STOP]", pad=False)) <= MAX_TOKENS
        except (KeyError, ValueError):
            return False

    seeds = seed_smiles()
    t0 = time.time()
    out = enumerate_corpus(seeds, n_target=args.n, seed=args.seed,
                           accept=accept)
    corpus, stats = out["corpus"], out["stats"]
    stats["enumerate_seconds"] = round(time.time() - t0, 1)
    print(f"enumerated {stats['n_corpus']} molecules "
          f"({stats['n_novel']} novel) in {stats['enumerate_seconds']}s; "
          f"{stats}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with gzip.open(args.out, "wt") as f:
        f.write("\n".join(corpus) + "\n")
    print(f"wrote {args.out}")

    rng = np.random.default_rng(args.seed)
    doc = {
        "generator": "coati_tpu.chem.enumerate (single-cut fragment "
                     "recombination, join pairs restricted to seed cut "
                     "chemistry)",
        "seed": args.seed,
        "stats": stats,
        "profile_corpus": profile(corpus, tok, rng=rng),
        "profile_seeds": profile(out["seeds"], tok, rng=rng),
    }
    with open(args.stats, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.stats}")

    if args.conformers:
        from coati_tpu.chem.conformers import embed_smiles_to_atoms_coords

        t0 = time.time()
        atoms_list, coords_list, ok = [], [], 0
        for i, s in enumerate(corpus):
            try:
                a, c = embed_smiles_to_atoms_coords(s)
                atoms_list.append(np.asarray(a, np.int32))
                coords_list.append(np.asarray(c, np.float32))
                ok += 1
            except Exception:  # noqa: BLE001 - row trains atom-free
                atoms_list.append(np.zeros((0,), np.int32))
                coords_list.append(np.zeros((0, 3), np.float32))
            if (i + 1) % 10_000 == 0:
                rate = (i + 1) / (time.time() - t0)
                print(f"  conformers {i+1}/{len(corpus)} "
                      f"({rate:.0f}/s, eta {(len(corpus)-i-1)/rate/60:.0f}m)",
                      flush=True)
        np.savez_compressed(
            args.conformers,
            smiles=np.array(corpus),
            atoms=np.array(atoms_list, dtype=object),
            coords=np.array(coords_list, dtype=object),
        )
        print(f"wrote {args.conformers}: {ok}/{len(corpus)} embedded "
              f"in {(time.time()-t0)/60:.0f}m")


if __name__ == "__main__":
    main()
