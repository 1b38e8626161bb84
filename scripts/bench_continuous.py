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
from coati_tpu.common.util import enable_persistent_compilation_cache
enable_persistent_compilation_cache()

import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--doc", required=True)
    parser.add_argument("--n", type=int, default=256)
    parser.add_argument("--slots", type=int, default=64)
    parser.add_argument("--segment", type=int, default=48)
    parser.add_argument("--out", default=None)
    parser.add_argument("--corpus", default=None,
                        help="draw request molecules from this .smi[.gz] "
                             "(e.g. corpora/chembl_synth_v1.smi.gz) instead "
                             "of the 554-molecule chembl_pic50 set")
    args = parser.parse_args()

    from coati_tpu.models.api import COATI
    from coati_tpu.models.coati import clip_to_special_token
    from coati_tpu.models.io import load_e3gnn_smiles_clip_e2e
    from coati_tpu.models.sampler import generate_tokens
    from coati_tpu.ops.layers import cast_floats
    from coati_tpu.serving.continuous import ContinuousDecoder

    model, tok = load_e3gnn_smiles_clip_e2e(args.doc)
    cfg = model.config.replace(dtype="bfloat16")
    # DEVICE arrays, not numpy: doc-loaded params are numpy, and numpy
    # params re-upload ~the full model per jit call — this hobbled the
    # drain leg 15x in an early run of this bench (engine unaffected:
    # it converts internally)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x).astype(jnp.bfloat16)
        if jnp.asarray(x).dtype == jnp.float32 else jnp.asarray(x),
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

    if args.corpus:
        # synthesized corpus (scripts/make_corpus.py): a realistic
        # molecule-length TAIL (token p90 ~22 vs the 554-seed set's ~14
        # — VERDICT r4 item 7: the memorization corpus's tight length
        # distribution flatters drain-batching)
        from coati_tpu.data.synth import load_corpus

        pool = load_corpus(args.corpus)
    else:
        pool = chembl_smiles()

    smiles = [
        s for s in pool
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

    def _best_of(fn, reps):
        """Repeat a sub-second measurement and keep the fastest run —
        single timings on this tunnel drift up to ~25% (CLAUDE.md);
        best-of-N compares the runtimes' FLOORS, which is the honest
        A/B for dispatch-overhead questions."""
        best = None
        for _ in range(reps):
            out = fn()
            if best is None or out[0] < best[0]:
                best = out
        return best

    def drain_batch(inv_temp):
        lat = np.zeros(args.n)
        lens = []
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
                k=100, inv_temp=inv_temp,
                inj_payload=jnp.asarray(g, xcfg.compute_dtype),
                inject_token=tok.unk_token,
            )
            arr = np.asarray(out)  # forced sync
            lat[rows] = time.perf_counter() - t0
            stops = np.where(
                (arr == tok.stop_token).any(1),
                np.argmax(arr == tok.stop_token, 1), tok.n_seq,
            )
            lens.extend((stops - len(prefix) + 1).tolist())
        return time.perf_counter() - t0, lat, np.asarray(lens[: args.n])

    def continuous(eng):
        rids = [eng.submit(inj[i]) for i in range(args.n)]
        done_at, lens = {}, {}
        t0 = time.perf_counter()
        guard = 0
        while len(done_at) < len(rids) and guard < 20000:
            eng.step()
            now = time.perf_counter() - t0
            for rid, toks in eng.pop_results().items():
                done_at.setdefault(rid, now)
                lens[rid] = len(toks) - len(prefix)
            guard += 1
        total = time.perf_counter() - t0
        lat = np.asarray([done_at[r] for r in rids])
        return total, lat, np.asarray([lens[r] for r in rids])

    # Two load scenarios: the production sampling temperature (tight
    # trained-SMILES lengths — the regime where drain-batch's cohort
    # max ~= mean) and hot exploration sampling (inv_temp 1.0, the
    # analogs/noise regime — dispersed lengths with a long tail, where
    # one rambler pins each drain cohort).
    results = {}
    for scen, inv_temp in (("inv_temp_2.0", 2.0), ("inv_temp_1.0", 1.0)):
        # ONE warmed engine per scenario across warmup + measurement:
        # segment/admission programs compile 15-20 s each and production
        # serving warms them before traffic (ContinuousDecoder.warmup) —
        # a cold engine inside the timed region would measure compiles
        eng = ContinuousDecoder(
            params.xformer, xcfg, prefix, n_slots=args.slots,
            total_len=tok.n_seq, stop_token=tok.stop_token,
            pad_token=tok.pad_token, inject_token=tok.unk_token,
            k=100, inv_temp=inv_temp, segment_len=args.segment,
        )
        print(f"[{scen}] warming continuous engine ...")
        eng.warmup()
        scen_res = {}
        for name, fn in (
            ("drain_batch", lambda: drain_batch(inv_temp)),
            ("continuous", lambda: continuous(eng)),
        ):
            fn()  # compile + steady-state warmup pass
            total, lat, lens = _best_of(fn, 3)
            scen_res[name] = {
                "total_s": round(total, 3),
                "throughput_mol_s": round(args.n / total, 1),
                "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
                "latency_p99_s": round(float(np.percentile(lat, 99)), 3),
                # the two servers must sample the SAME length
                # distribution (sanity that the engine isn't "fast" by
                # truncating); the max shows what pins drain cohorts
                "gen_len_mean": round(float(lens.mean()), 1),
                "gen_len_p99": float(np.percentile(lens, 99)),
                "gen_len_max": int(lens.max()),
            }
            print(f"[{scen}] {name:12s}: {json.dumps(scen_res[name])}")
        scen_res["speedup_throughput"] = round(
            scen_res["continuous"]["throughput_mol_s"]
            / scen_res["drain_batch"]["throughput_mol_s"], 3,
        )
        scen_res["p50_ratio"] = round(
            scen_res["continuous"]["latency_p50_s"]
            / scen_res["drain_batch"]["latency_p50_s"], 3,
        )
        results[scen] = scen_res
    # Third scenario: BUDGET-DISPERSED load — per-request
    # max_new_tokens of 16 (80%) / 224 (20%), on random-reinit weights
    # (no natural [STOP], so budgets bind exactly). The drain baseline
    # cannot honor per-row budgets: every 64-cohort almost surely
    # contains a 224 and runs to the cohort max; the engine retires
    # each row at ITS budget and recycles the slot. This is the
    # long-tail regime continuous batching exists for (mixed decode
    # budgets are a standard serving pattern).
    from coati_tpu.models.transformer import init_transformer

    rparams = init_transformer(jax.random.PRNGKey(0), xcfg)
    rparams = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        rparams,
    )
    budgets = np.where(rng.random(args.n) < 0.8, 16, 224)
    max_budget = int(budgets.max())

    def drain_budgeted():
        lat = np.zeros(args.n)
        lens = []
        t0 = time.perf_counter()
        for start in range(0, args.n, args.slots):
            rows = slice(start, min(start + args.slots, args.n))
            g = inj[rows]
            t0s = np.zeros((args.slots, len(prefix) + max_budget), np.int32)
            t0s[:, : len(prefix)] = prefix
            out = generate_tokens(
                rparams, xcfg, jax.random.PRNGKey(start),
                jnp.asarray(t0s),
                jnp.full((args.slots,), len(prefix), jnp.int32),
                prefill_len=len(prefix),
                total_len=len(prefix) + max_budget,
                stop_token=tok.stop_token, pad_token=tok.pad_token,
                k=100, inv_temp=2.0,
                inj_payload=jnp.asarray(g, xcfg.compute_dtype),
                inject_token=tok.unk_token,
            )
            np.asarray(out)
            lat[rows] = time.perf_counter() - t0
            lens.extend(np.minimum(budgets[rows], max_budget).tolist())
        return time.perf_counter() - t0, lat, np.asarray(lens[: args.n])

    def make_engine(adaptive):
        e = ContinuousDecoder(
            rparams, xcfg, prefix, n_slots=args.slots,
            total_len=len(prefix) + max_budget, stop_token=tok.stop_token,
            pad_token=tok.pad_token, inject_token=tok.unk_token,
            k=100, inv_temp=2.0, segment_len=args.segment,
            adaptive=adaptive,
        )
        e.warmup()
        return e

    print("[budget_longtail] warming continuous engines ...")
    eng = make_engine(adaptive=True)
    eng_pipe = make_engine(adaptive=False)

    def continuous_budgeted(eng):
        rids = [
            eng.submit(inj[i], max_new_tokens=int(budgets[i]))
            for i in range(args.n)
        ]
        done_at, lens = {}, {}
        t0 = time.perf_counter()
        guard = 0
        while len(done_at) < len(rids) and guard < 20000:
            eng.step()
            now = time.perf_counter() - t0
            for rid, toks in eng.pop_results().items():
                done_at.setdefault(rid, now)
                lens[rid] = len(toks) - len(prefix)
            guard += 1
        total = time.perf_counter() - t0
        lat = np.asarray([done_at[r] for r in rids])
        return total, lat, np.asarray([lens[r] for r in rids])

    scen_res = {}
    for name, fn in (
        ("drain_batch", drain_budgeted),
        ("continuous", lambda: continuous_budgeted(eng)),
        # same-process mode A/B: pipelined harvest with the adaptive
        # harvest-first escape disabled (the two modes differ only in
        # WHEN finished slots recycle; see serving/continuous.py step())
        ("continuous_pipeline_only", lambda: continuous_budgeted(eng_pipe)),
    ):
        fn()
        total, lat, lens = _best_of(fn, 3)
        scen_res[name] = {
            "total_s": round(total, 3),
            "throughput_mol_s": round(args.n / total, 1),
            "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
            "latency_p99_s": round(float(np.percentile(lat, 99)), 3),
            "gen_len_mean": round(float(lens.mean()), 1),
            "gen_len_max": int(lens.max()),
        }
        print(f"[budget_longtail] {name:12s}: {json.dumps(scen_res[name])}")
    scen_res["speedup_throughput"] = round(
        scen_res["continuous"]["throughput_mol_s"]
        / scen_res["drain_batch"]["throughput_mol_s"], 3,
    )
    scen_res["p50_ratio"] = round(
        scen_res["continuous"]["latency_p50_s"]
        / scen_res["drain_batch"]["latency_p50_s"], 3,
    )
    results["budget_longtail"] = scen_res

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
