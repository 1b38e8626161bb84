"""Mixed-length serving A/B: drain-the-batch vs continuous batching
(VERDICT r2 item 4 "done" criterion -> SERVING.md).

Load: N requests arriving at t=0, each conditioning generation on a
different real-molecule embedding from a TRAINED model (mixed molecule
lengths => mixed generation lengths — the regime where one long
molecule makes drain-batch co-passengers wait). Two servers, same
sampling config (k=100, inv_temp=2, production decode defaults):

  drain-batch   requests processed in fixed cohorts of `slots` rows
                through the fused sampler; every request in a cohort
                completes when the cohort's LONGEST row stops.
  continuous    ContinuousDecoder with `slots` slots: finished rows
                harvest at segment boundaries and their slots admit
                queued requests immediately.

Reported per server: total wall (throughput) and per-request latency
p50/p99. Requires a trained document (scripts/eval_trained_decode.py
prints one); falls back to random weights (uniform long generations —
documents the no-variance regime where continuous is expected neutral).

Usage: PYTHONPATH=/root/.axon_site:/root/repo \\
    python scripts/bench_continuous.py --doc <model.pkl> \\
        [--n 256] [--slots 64] [--out docs/bench_continuous.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--doc", required=True)
    parser.add_argument("--n", type=int, default=256)
    parser.add_argument("--slots", type=int, default=64)
    parser.add_argument("--segment", type=int, default=16)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from coati_tpu.models.api import COATI
    from coati_tpu.models.coati import clip_to_special_token
    from coati_tpu.models.io import load_e3gnn_smiles_clip_e2e
    from coati_tpu.models.sampler import generate_tokens
    from coati_tpu.ops.layers import cast_floats
    from coati_tpu.serving.continuous import ContinuousDecoder

    model, tok = load_e3gnn_smiles_clip_e2e(args.doc)
    cfg = model.config.replace(dtype="bfloat16")
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        model.params,
    )
    xcfg = cfg.xformer_config

    # request payloads: clip tokens of real corpus molecules (mixed
    # lengths), tiled to N
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "eval_trained_decode",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "eval_trained_decode.py"),
    )
    etd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(etd)
    _valid_proxy, chembl_smiles = etd._valid_proxy, etd.chembl_smiles

    smiles = [
        s for s in chembl_smiles()
        if _valid_proxy(s, tok)
        and len(tok.tokenize_text("[SMILES]" + s + "[STOP]", pad=False))
        <= tok.n_seq
    ]
    rng = np.random.default_rng(0)
    pick = rng.integers(0, len(smiles), size=args.n)
    toks = np.asarray(
        [
            tok.tokenize_text("[SMILES]" + smiles[i] + "[STOP]", pad=True)
            for i in pick
        ],
        np.int32,
    )
    h = np.asarray(COATI(params, cfg).encode_tokens(toks, tok))
    inj = np.asarray(
        clip_to_special_token(
            cast_floats(params, xcfg.compute_dtype),
            jnp.asarray(h, xcfg.compute_dtype),
        ),
        np.float32,
    )
    prefix = list(tok.tokenize_text("[CLIP][UNK][SMILES]", pad=False))
    print(f"{args.n} requests over {len(smiles)} molecules "
          f"(len p10/p50/p90: "
          f"{np.percentile([len(smiles[i]) for i in pick], [10, 50, 90])})")

    # ---------------------------------------------------- drain-batch
    def drain_batch():
        lat = np.zeros(args.n)
        t0 = time.perf_counter()
        for start in range(0, args.n, args.slots):
            rows = slice(start, min(start + args.slots, args.n))
            g = inj[rows]
            pad_to = args.slots - g.shape[0]
            if pad_to:
                g = np.concatenate([g, np.zeros((pad_to, g.shape[1]), g.dtype)])
            t0s = np.zeros((args.slots, tok.n_seq), np.int32)
            t0s[:, : len(prefix)] = prefix
            out = generate_tokens(
                params.xformer, xcfg, jax.random.PRNGKey(start),
                jnp.asarray(t0s),
                jnp.full((args.slots,), len(prefix), jnp.int32),
                prefill_len=len(prefix), total_len=tok.n_seq,
                stop_token=tok.stop_token, pad_token=tok.pad_token,
                k=100, inv_temp=2.0,
                inj_payload=jnp.asarray(g, xcfg.compute_dtype),
                inject_token=tok.unk_token,
            )
            np.asarray(out)  # forced sync
            lat[rows] = time.perf_counter() - t0
        return time.perf_counter() - t0, lat

    # ----------------------------------------------------- continuous
    def continuous():
        eng = ContinuousDecoder(
            params.xformer, xcfg, prefix, n_slots=args.slots,
            total_len=tok.n_seq, stop_token=tok.stop_token,
            pad_token=tok.pad_token, inject_token=tok.unk_token,
            k=100, inv_temp=2.0, segment_len=args.segment,
        )
        rids = [eng.submit(inj[i]) for i in range(args.n)]
        done_at = {}
        t0 = time.perf_counter()
        guard = 0
        while (eng._pending or eng.n_active) and guard < 20000:
            eng.step()
            now = time.perf_counter() - t0
            for rid in eng.results():
                done_at.setdefault(rid, now)
            guard += 1
        total = time.perf_counter() - t0
        lat = np.asarray([done_at[r] for r in rids])
        return total, lat

    results = {}
    for name, fn in (("drain_batch", drain_batch), ("continuous", continuous)):
        fn()  # compile + warmup pass
        total, lat = fn()
        results[name] = {
            "total_s": round(total, 3),
            "throughput_mol_s": round(args.n / total, 1),
            "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
            "latency_p99_s": round(float(np.percentile(lat, 99)), 3),
        }
        print(f"{name:12s}: {json.dumps(results[name])}")

    results["speedup_throughput"] = round(
        results["continuous"]["throughput_mol_s"]
        / results["drain_batch"]["throughput_mol_s"], 3,
    )
    results["p50_ratio"] = round(
        results["continuous"]["latency_p50_s"]
        / results["drain_batch"]["latency_p50_s"], 3,
    )
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
