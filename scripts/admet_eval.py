"""ADMET evaluation workflow.

The reference publishes 33 processed ADMET datasets with cached
embeddings (README.md:86-118; pickles of record dicts carrying
'emb_smiles' and an endpoint column). This script trains a DUE regressor
on each dataset and reports test R^2 / MAE / predictive NLL — the
downstream-regression protocol of BASELINE.json config 2
(bace_regression / herg).

Usage:
    python scripts/admet_eval.py --datasets bace_regression.pkl herg.pkl \
        [--y_field <endpoint column>] [--x_field emb_smiles] [--steps 3000]

Datasets can be local paths or s3:// URIs (boto3 required for s3).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coati_tpu.common.artifacts import cache_read
from coati_tpu.regression.due import basic_due

CANDIDATE_Y_FIELDS = ("y", "pic50", "label", "target", "value", "activity")


def infer_y_field(records) -> str:
    keys = set(records[0].keys())
    for cand in CANDIDATE_Y_FIELDS:
        if cand in keys:
            return cand
    numeric = [
        k
        for k, v in records[0].items()
        if np.isscalar(v) and not isinstance(v, str) and not k.startswith("emb")
    ]
    if len(numeric) == 1:
        return numeric[0]
    raise ValueError(f"cannot infer endpoint column from keys {sorted(keys)}")


def gaussian_nll(y, mean, std):
    std = np.maximum(std, 1e-6)
    return float(
        np.mean(0.5 * np.log(2 * np.pi * std**2) + (y - mean) ** 2 / (2 * std**2))
    )


def evaluate(path: str, x_field: str, y_field: str | None, steps: int, seed: int):
    with cache_read(path, "rb") as f:
        records = pickle.load(f)
    y_field = y_field or infer_y_field(records)
    records = [r for r in records if x_field in r and r.get(y_field) is not None]
    name = os.path.basename(path)
    print(f"== {name}: {len(records)} records, endpoint '{y_field}'")
    model, (y_test, mean, std) = basic_due(
        records,
        x_field=x_field,
        y_field=y_field,
        save_as=f"/tmp/due_{name}.pkl",
        steps=steps,
        test_frac=0.15,
        random_seed=seed,
    )
    y_test = np.asarray(y_test, np.float64).reshape(-1)
    # true R^2 (residual SS over total SS) — np.var(y - pred) would
    # subtract the mean residual and forgive systematic bias
    r2 = 1.0 - np.mean((y_test - mean) ** 2) / max(np.var(y_test), 1e-12)
    mae = float(np.mean(np.abs(y_test - mean)))
    nll = gaussian_nll(y_test, mean, std)
    print(f"   R^2 {r2:.3f}  MAE {mae:.3f}  NLL {nll:.3f}  (n_test {len(y_test)})")
    return {"dataset": name, "r2": r2, "mae": mae, "nll": nll}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--datasets", nargs="+", required=True)
    parser.add_argument("--x_field", default="emb_smiles")
    parser.add_argument("--y_field", default=None)
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--seed", type=int, default=510)
    args = parser.parse_args()
    results = [
        evaluate(p, args.x_field, args.y_field, args.steps, args.seed)
        for p in args.datasets
    ]
    print("\nsummary:")
    for r in results:
        print(f"   {r['dataset']}: R^2 {r['r2']:.3f}, MAE {r['mae']:.3f}")


if __name__ == "__main__":
    main()
