"""COATI2 tutorial (script form of examples/coati2/tutorial.ipynb):
load a COATI2 document, embed SMILES, decode with noise sweeps, and run
property-token-conditioned generation.

Run: python examples/coati2_tutorial.py --doc_url <coati2 document>
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from coati_tpu.chem.rdkit_support import is_valid_smiles
from coati_tpu.models.io import load_coati2
from coati_tpu.models.sampler import generate_prefix_batch

SEEDS = ["CC(=O)Oc1ccccc1C(=O)O", "CN1C=NC2=C1C(=O)N(C(=O)N2C)C"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--doc_url", required=True)
    parser.add_argument("--n_per_noise", type=int, default=16)
    args = parser.parse_args()
    model, tokenizer = load_coati2(args.doc_url)

    vecs = model.smiles_to_coati_vec(SEEDS, tokenizer)
    print(f"embedded -> {vecs.shape}")

    # noise sweep (the COATI1-vs-2 comparison protocol,
    # tutorial_simple_gen.ipynb)
    for noise in (0.0, 0.2, 0.4, 0.6):
        gen = model.hcoati_to_2d_batch(
            np.tile(vecs[:1], (args.n_per_noise, 1)),
            tokenizer,
            noise_scale=noise,
            inv_temp=2.0,
            k=100,
        )
        valid = [g for g in gen if is_valid_smiles(g)]
        print(
            f"noise {noise:.1f}: {len(valid)}/{args.n_per_noise} valid, "
            f"{len(set(valid))} unique; e.g. {valid[:2]}"
        )

    # property-conditioned generation with COATI2's [PROPS] vocabulary
    if "[PROPS]" in tokenizer.special_tokens:
        prefix = tokenizer.tokenize_text(
            "[PROPS][PercentQED][NUM8][ENDPROPS][SMILES]", pad=False
        )
        out = generate_prefix_batch(
            model.params.xformer,
            model.config.xformer_config,
            jax.random.PRNGKey(0),
            [prefix] * 8,
            stop_token=tokenizer.stop_token,
            k=100,
            inv_temp=2.0,
        )
        decoded = [tokenizer.decode(list(r), special=False) for r in np.asarray(out)]
        print("QED-conditioned samples:", decoded[:4])


if __name__ == "__main__":
    main()
