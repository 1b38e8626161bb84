"""Metadynamics multi-parameter optimization (reconstruction of the
missing examples/metadynamics/metadynamics.ipynb; see README.md:9 of the
reference and coati_tpu/generative/metadynamics.py).

Optimizes molecules for a weighted objective of DUE-predicted endpoints
(e.g. potency + QED + logP) while repulsive Gaussian hills at visited
embedding locations push the walker toward novel chemistry.

Run:
    python examples/metadynamics_example.py --doc_url <model document> \
        --due_qed due_qed.pkl [--due_potency due_pic50.pkl] --seed_smiles "CCO..."
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coati_tpu.generative.metadynamics import (
    MetadynamicsConfig,
    combined_objective,
    due_objective,
    run_metadynamics,
)
from coati_tpu.generative.purifications import embed_smiles
from coati_tpu.models.io import load_e3gnn_smiles_clip_e2e
from coati_tpu.regression.due_import import load_due

# the reference ships its trained DUE property models in-tree
# (examples/metadynamics/due_{qed,logp}_barlow.pt + due_hcaii_barlow_terray.pt);
# when visible, they are the defaults — .pt artifacts are converted on
# load (regression/due_import.py), .pkl paths load this framework's own
# trained models
_REF_META = "/root/reference/examples/metadynamics"


def _default_artifact(name: str):
    path = os.path.join(_REF_META, name)
    return path if os.path.exists(path) else None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--doc_url", required=True)
    parser.add_argument("--seed_smiles", default="CC(=O)Oc1ccccc1C(=O)O")
    parser.add_argument(
        "--due_qed", default=_default_artifact("due_qed_barlow.pt"),
        help="DUE model (.pt torch artifact or .pkl) for QED",
    )
    parser.add_argument(
        "--due_potency", default=_default_artifact("due_hcaii_barlow_terray.pt"),
        help="DUE model (.pt torch artifact or .pkl) for potency",
    )
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--hill_height", type=float, default=1.0)
    parser.add_argument("--hill_width", type=float, default=1.0)
    args = parser.parse_args()

    model, tokenizer = load_e3gnn_smiles_clip_e2e(args.doc_url)
    v0 = embed_smiles(args.seed_smiles, model, tokenizer)

    terms, weights = [], []
    for path, weight in ((args.due_qed, 1.0), (args.due_potency, 2.0)):
        if path:
            terms.append(due_objective(load_due(path)))
            weights.append(weight)
    if not terms:
        # without DUE artifacts: stay close to the seed (demo objective)
        import jax.numpy as jnp

        terms = [lambda v: -0.01 * jnp.sum(jnp.square(v - v0))]
        weights = [1.0]

    result = run_metadynamics(
        model,
        tokenizer,
        combined_objective(terms, weights),
        v0,
        MetadynamicsConfig(
            steps=args.steps,
            hill_height=args.hill_height,
            hill_width=args.hill_width,
        ),
    )
    print(f"discovered {len(result.smiles)} unique molecules")
    print("top 10 by objective:")
    for s, score in result.top(10):
        print(f"   {score:8.3f}  {s}")


if __name__ == "__main__":
    main()
