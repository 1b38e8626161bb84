"""Golden-vector parity check against published reference checkpoints.

Single-model mode: given a reference model document (torch pickle, e.g.
grande_closed), runs BOTH implementations on the same SMILES list and
reports the max embedding deviation — the BASELINE.json north-star
(<= 1e-4 on delaney). Requires torch + the reference repo for the
oracle side.

    python scripts/parity_check.py --doc_url <pickle> \
        [--smiles_file delaney_smiles.txt] [--reference_dir /root/reference]

--all mode (the north-star runbook, VERDICT r2 item 10): the day this
machine gains egress, ONE command lands the whole parity table —

    python scripts/parity_check.py --all [--dry_run]

For each of the 9 published pickles (/root/reference/README.md:71-82):
fetch via the cached s3 reader (coati_tpu.common.artifacts.cache_read —
needs boto3 + egress), load through models/io (torch->JAX conversion),
run embedding parity on the delaney SMILES (fetched from
s3://terray-public/datasets/delaney.pkl; offline fallback: the in-tree
8-molecule panel), and decode stats (greedy embed->decode round-trip
rate at the published-weights regime). Writes one JSON table to
--out (default PARITY_TABLE.json). --dry_run exercises the full
machinery offline: enumerates the fetch plan, checks each URI against
the local cache, and runs the convert->parity->decode legs on any
already-cached documents (none cached => the plan is printed and the
run exits 0 without network IO).
"""

from __future__ import annotations

import argparse
import json
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


PUBLISHED_MODELS = [
    # /root/reference/README.md:71-82 (recommended: grande_closed)
    "s3://terray-public/models/tall_closed.pkl",
    "s3://terray-public/models/grande_closed.pkl",
    "s3://terray-public/models/grade_closed_fp.pkl",
    "s3://terray-public/models/barlow_closed_fp.pkl",
    "s3://terray-public/models/barlow_closed.pkl",
    "s3://terray-public/models/autoreg_only.pkl",
    "s3://terray-public/models/barlow_venti.pkl",
    "s3://terray-public/models/grande_open.pkl",
    "s3://terray-public/models/selfies_barlow.pkl",
]
DELANEY_URI = "s3://terray-public/datasets/delaney.pkl"


def _delaney_smiles(dry_run):
    """Delaney SMILES via the cached s3 reader; offline fallback: the
    in-tree 8-molecule panel (clearly marked in the output)."""
    import pickle

    from coati_tpu.common.artifacts import cache_read, local_cache_path

    if dry_run and not os.path.exists(local_cache_path(DELANEY_URI)):
        return DEFAULT_SMILES, "default-panel (delaney not cached)"
    try:
        with cache_read(DELANEY_URI) as f:
            rows = pickle.load(f)
        smiles = [
            r.get("smiles") or r.get("SMILES")
            for r in rows
            if isinstance(r, dict)
        ]
        smiles = [s for s in smiles if isinstance(s, str) and s]
        if smiles:
            return smiles, "delaney"
    except Exception as e:  # no egress / no boto3: fall back loudly
        print(f"  delaney fetch unavailable ({type(e).__name__}: {e})")
    return DEFAULT_SMILES, "default-panel (delaney unavailable)"


class _oracle_dep_stubs:
    """Scoped sys.meta_path stubs for the reference loader's optional
    deps (pytz/boto3/botocore/tqdm/selfies/rdkit — import-time only;
    the loader never exercises them for local documents). Appended at
    the END of meta_path so real installations always win; stub modules
    are evicted on exit (same contract as
    coati_tpu.regression.due_import._stubs_installed)."""

    PREFIXES = ("pytz", "boto3", "botocore", "tqdm", "selfies", "rdkit")

    def __enter__(self):
        import importlib.machinery
        import types

        # pandas probes pytz/tqdm versions on first import — let it see
        # the real environment before the stub finder exists
        import pandas  # noqa: F401

        class AnyAttr:
            """Recursively self-faking attribute chain (Chem.Mol,
            pytz.utc, ...); subclassable via __mro_entries__."""

            def __init__(self, name):
                self._name = name

            def __getattr__(self, a):
                if a.startswith("__"):
                    raise AttributeError(a)
                return AnyAttr(f"{self._name}.{a}")

            def __call__(self, *a, **k):
                return AnyAttr(self._name + "()")

            def __mro_entries__(self, bases):
                return (object,)

        def fake_module(name):
            mod = types.ModuleType(name)
            mod.__coati_stub__ = True
            mod.__path__ = []
            mod.__getattr__ = lambda a: (
                (_ for _ in ()).throw(AttributeError(a))
                if a.startswith("__")
                else AnyAttr(f"{name}.{a}")
            )
            return mod

        prefixes = self.PREFIXES

        class Finder:
            def find_spec(self, fullname, path=None, target=None):
                if fullname.split(".")[0] not in prefixes:
                    return None
                return importlib.machinery.ModuleSpec(
                    fullname, self, is_package=True
                )

            def create_module(self, spec):
                return fake_module(spec.name)

            def exec_module(self, module):
                pass

        self._finder = Finder()
        sys.meta_path.append(self._finder)
        return self

    def __exit__(self, *exc):
        sys.meta_path.remove(self._finder)
        for name in [
            n for n in sys.modules
            if n.split(".")[0] in self.PREFIXES
            and getattr(sys.modules[n], "__coati_stub__", False)
        ]:
            del sys.modules[name]


def _check_one(local_path, smiles, reference_dir, tolerance, decode_n=32):
    """Convert + embedding parity + decode stats for one document.
    Returns a JSON-able dict."""
    import jax.numpy as jnp  # noqa: F401  (ensures jax is importable)

    from coati_tpu.models.api import COATI
    from coati_tpu.models.io import load_e3gnn_smiles_clip_e2e

    model, tokenizer = load_e3gnn_smiles_clip_e2e(local_path)
    pmodel = COATI(model.params, model.config.replace(precision="highest"))
    tokens = np.asarray(
        [
            tokenizer.tokenize_text("[SMILES]" + s + "[STOP]", pad=True)
            for s in smiles
        ],
        np.int32,
    )
    ours = np.asarray(pmodel.encode_tokens(tokens, tokenizer))

    entry = {"embed_dim": int(ours.shape[1]), "n_smiles": len(smiles)}
    try:
        import torch

        if reference_dir not in sys.path:
            sys.path.insert(0, reference_dir)
        with _oracle_dep_stubs():
            from coati.models.io.coati import (
                load_e3gnn_smiles_clip_e2e as ref_load,
            )

            ref_model, ref_tok = ref_load(local_path, device="cpu")
        ref_model.eval()
        with torch.no_grad():
            theirs = ref_model.encode_tokens(
                torch.tensor(tokens, dtype=torch.long), ref_tok
            ).numpy()
        dev = float(np.abs(ours - theirs).max())
        entry["max_abs_dev"] = dev
        entry["parity"] = "PASS" if dev <= tolerance else "FAIL"
    except Exception as e:
        entry["parity"] = f"oracle unavailable ({type(e).__name__}: {e})"

    # decode stats: greedy embed->decode round-trip at trained weights
    sub = smiles[:decode_n]
    decoded = pmodel.hclip_to_2d_batch(
        ours[: len(sub)], tokenizer, inv_temp=20.0, k=2
    )
    entry["greedy_roundtrip"] = float(
        np.mean([a == b for a, b in zip(decoded, sub)])
    )
    return entry


def self_test(args):
    """Offline proof of the --all machinery: fabricate a REFERENCE-format
    document (export_coati state dict + reference envelope), park it in
    a temp cache as grande_closed.pkl, and run the exact _check_one leg
    — the torch oracle must load it and parity must PASS (~1e-5), so
    the only untested step on egress day is the s3 fetch itself."""
    import pickle
    import tempfile

    import jax
    import torch

    from coati_tpu.models.coati import CoatiConfig, init_coati
    from coati_tpu.models.convert import export_coati
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

    tok = TrieTokenizer(n_seq=64, **get_vocab("mar"))
    kw = dict(
        n_layer_e3gnn=2, n_layer_xformer=3, n_hidden_xformer=128,
        n_hidden_e3nn=64, n_embd_common=128, n_head=8, n_seq=64,
        n_tok=tok.n_token, biases=True, torch_emb=False, norm_clips=True,
        norm_embed=False, token_mlp=True, use_point_encoder=True,
    )
    cfg = CoatiConfig(**kw)
    params = init_coati(jax.random.PRNGKey(0), cfg)
    sd = {k: torch.tensor(v) for k, v in export_coati(params, cfg).items()}
    doc = {
        "train_args": {"tokenizer_vocab": "mar"},
        "dataset_summary": {},
        "model": sd,
        "model_kwargs": kw,
    }
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "grande_closed.pkl")
        with open(path, "wb") as f:
            pickle.dump(doc, f)
        entry = _check_one(
            path, DEFAULT_SMILES, args.reference_dir, args.tolerance
        )
    print(json.dumps(entry, indent=2))
    ok = entry.get("parity") == "PASS"
    print("self-test:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


def run_all(args):
    from coati_tpu.common.artifacts import local_cache_path

    smiles, smiles_src = _delaney_smiles(args.dry_run)
    print(f"parity SMILES set: {smiles_src} ({len(smiles)} molecules)")
    table = {"smiles_source": smiles_src, "models": {}}
    for uri in PUBLISHED_MODELS:
        name = os.path.basename(uri)
        cached = local_cache_path(uri)
        if os.path.exists(cached):
            print(f"[{name}] cached at {cached}: checking ...")
            try:
                table["models"][name] = _check_one(
                    cached, smiles, args.reference_dir, args.tolerance
                )
            except Exception as e:
                table["models"][name] = {
                    "error": f"{type(e).__name__}: {e}"
                }
        elif args.dry_run:
            print(f"[{name}] would fetch {uri} -> {cached}")
            table["models"][name] = {"plan": f"fetch {uri}"}
        else:
            print(f"[{name}] fetching {uri} ...")
            try:
                from coati_tpu.common.artifacts import download_from_s3

                table["models"][name] = _check_one(
                    download_from_s3(uri), smiles,
                    args.reference_dir, args.tolerance,
                )
            except Exception as e:
                table["models"][name] = {"error": f"{type(e).__name__}: {e}"}
        print(f"  {json.dumps(table['models'][name])[:200]}")

    checked = [
        m for m in table["models"].values() if "parity" in m or "error" in m
    ]
    table["ok"] = bool(checked) and all(
        m.get("parity") == "PASS" for m in checked
    )
    if args.dry_run and not checked:
        table["ok"] = None  # plan-only run: nothing to judge offline
    with open(args.out, "w") as f:
        json.dump(table, f, indent=2)
        f.write("\n")
    print(f"table written to {args.out} (ok={table['ok']})")
    sys.exit(0 if table["ok"] in (True, None) else 1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--doc_url", default=None)
    parser.add_argument("--all", action="store_true")
    parser.add_argument("--dry_run", action="store_true")
    parser.add_argument("--self_test", action="store_true")
    parser.add_argument("--out", default="PARITY_TABLE.json")
    parser.add_argument("--smiles_file", default=None)
    parser.add_argument("--reference_dir", default="/root/reference")
    parser.add_argument("--tolerance", type=float, default=1e-4)
    args = parser.parse_args()

    if args.self_test:
        self_test(args)
        return
    if args.all:
        run_all(args)
        return
    if not args.doc_url:
        parser.error("--doc_url is required without --all")

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
