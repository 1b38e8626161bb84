"""Golden-vector parity check against a published reference checkpoint.

Given a reference model document (torch pickle, e.g. grande_closed), this
script runs BOTH implementations on the same SMILES list and reports the
max embedding deviation — the BASELINE.json north-star (<= 1e-4 on
delaney). Requires torch + the reference repo for the oracle side.

Usage:
    python scripts/parity_check.py --doc_url <pickle> \
        [--smiles_file delaney_smiles.txt] [--reference_dir /root/reference]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SMILES = [
    "CC(=O)Oc1ccccc1C(=O)O",
    "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "c1ccc2c(c1)cccn2",
    "OCC1OC(O)C(O)C(O)C1O",
    "CC(C)NCC(O)c1ccc(O)c(O)c1",
    "Clc1ccccc1",
    "CCN(CC)CCNC(=O)c1ccc(N)cc1",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--doc_url", required=True)
    parser.add_argument("--smiles_file", default=None)
    parser.add_argument("--reference_dir", default="/root/reference")
    parser.add_argument("--tolerance", type=float, default=1e-4)
    args = parser.parse_args()

    smiles = DEFAULT_SMILES
    if args.smiles_file:
        with open(args.smiles_file) as f:
            smiles = [line.strip() for line in f if line.strip()]

    # ---- coati_tpu side (fp32, highest matmul precision for parity)
    from coati_tpu.models.api import COATI
    from coati_tpu.models.io import load_e3gnn_smiles_clip_e2e

    model, tokenizer = load_e3gnn_smiles_clip_e2e(args.doc_url)
    model = COATI(model.params, model.config.replace(precision="highest"))
    tokens = np.asarray(
        [
            tokenizer.tokenize_text("[SMILES]" + s + "[STOP]", pad=True)
            for s in smiles
        ],
        np.int32,
    )
    ours = np.asarray(model.encode_tokens(tokens, tokenizer))

    # ---- reference torch side
    import torch

    sys.path.insert(0, args.reference_dir)
    from coati.models.io.coati import load_e3gnn_smiles_clip_e2e as ref_load

    ref_model, ref_tok = ref_load(args.doc_url, device="cpu")
    ref_model.eval()
    with torch.no_grad():
        theirs = ref_model.encode_tokens(
            torch.tensor(tokens, dtype=torch.long), ref_tok
        ).numpy()

    abs_dev = np.abs(ours - theirs)
    rel_dev = abs_dev / (np.abs(theirs).max() + 1e-12)
    print(f"molecules: {len(smiles)}  embed dim: {ours.shape[1]}")
    print(f"max abs deviation: {abs_dev.max():.3e}")
    print(f"max rel deviation: {rel_dev.max():.3e}")
    status = "PASS" if abs_dev.max() <= args.tolerance else "FAIL"
    print(f"parity ({args.tolerance:g}): {status}")
    sys.exit(0 if status == "PASS" else 1)


if __name__ == "__main__":
    main()
