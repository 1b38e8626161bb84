"""Likelihood + bulk-generation analysis (script form of
examples/simple_mol_generation/chembl_analysis.ipynb):

  1. s2s likelihoods: NLL that each molecule decodes back to itself;
  2. bulk unconditional sampling with validity / uniqueness fractions
     (reference protocol: k=10_000 inv_temp=1.75 over repeated batches);
  3. property-distribution comparison of generated vs input molecules
     (needs rdkit).

Run: python examples/chembl_analysis.py --doc_url <model document>
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coati_tpu.chem.rdkit_support import (
    HAS_RDKIT,
    canonicalize_or_self,
    is_valid_smiles,
    mol_properties,
)
from coati_tpu.models.io import load_e3gnn_smiles_clip_e2e

MOLS = [
    "CC(=O)Oc1ccccc1C(=O)O",
    "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "c1ccc2c(c1)cccn2",
    "OCC1OC(O)C(O)C(O)C1O",
    "CC(C)NCC(O)c1ccc(O)c(O)c1",
    "CCN(CC)CCNC(=O)c1ccc(N)cc1",
    "Nc1ccc(cc1)S(=O)(=O)N",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--doc_url", required=True)
    parser.add_argument("--batches", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=1024)
    parser.add_argument("--k", type=int, default=10_000)
    parser.add_argument("--inv_temp", type=float, default=1.75)
    args = parser.parse_args()
    model, tokenizer = load_e3gnn_smiles_clip_e2e(args.doc_url)

    # 1. self-decoding likelihoods
    nll, mask = model.batch_smiles_to_s2s_likelihood(MOLS, tokenizer)
    print("s2s negative log-likelihoods:")
    kept = [m for m, ok in zip(MOLS, mask) if ok]
    for s, v in zip(kept, np.asarray(nll)):
        print(f"   {v:8.2f}  {s}")

    # 2. bulk sampling validity / uniqueness (reference cell 24-26 protocol)
    all_gen = []
    for b in range(args.batches):
        gen = model.complete_batch(
            ["[SMILES]"] * args.batch_size, tokenizer,
            inv_temp=args.inv_temp, k=min(args.k, tokenizer.n_token),
        )
        all_gen.extend(gen)
        print(f"batch {b + 1}/{args.batches} done")
    valid = [canonicalize_or_self(s) for s in all_gen if is_valid_smiles(s)]
    counts = Counter(valid)
    n = len(all_gen)
    print(
        f"generated {n}: fraction valid {len(valid) / n:.3f}, "
        f"#unique {len(counts)}, fraction unique {len(counts) / max(len(valid), 1):.3f}"
    )

    # 3. property distributions
    if HAS_RDKIT and valid:
        gen_props = [mol_properties(s) for s in valid[:500]]
        ref_props = [mol_properties(s) for s in MOLS]
        for key in ("MolWt", "MolLogP", "TPSA"):
            g = np.array([p[key] for p in gen_props if p])
            r = np.array([p[key] for p in ref_props if p])
            print(f"{key}: generated {g.mean():.1f}+-{g.std():.1f} vs input {r.mean():.1f}")


if __name__ == "__main__":
    main()
