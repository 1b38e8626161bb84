"""Metadynamics optimization evidence on the published DUE artifacts.

VERDICT r2 item 8: assert the MPO loop OPTIMIZES, not just runs. For
each published property model (due_qed_barlow.pt, due_logp_barlow.pt,
due_hcaii_barlow_terray.pt — the artifacts of the reference's missing
metadynamics notebook, README.md:9) plus a combined QED+logP MPO
objective, this script runs the pure embedding-space walk
(generative/metadynamics.walk_embedding_space — the exact ascend/hill
dynamics under run_metadynamics) and measures:

  * ascent:   with hills OFF and noise OFF, the objective trace must be
              non-decreasing (pure gradient ascent) and strictly improve
              overall;
  * escape:   with hills ON (same start), the walker must keep moving
              once the unbiased walk has stalled at an optimum —
              measured as mean consecutive-step displacement over the
              trailing half of the walk, biased vs unbiased;
  * spread:   hills must displace successive SAMPLES — the mean distance
              between consecutive visited positions across the whole
              biased walk exceeds the unbiased one.

Writes one JSON verdict to stdout and (with --out) to disk; the
committed copy lives at docs/eval_metadynamics.json.

Usage: python scripts/eval_metadynamics.py [--steps 120] [--out path]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Host-side eval: hundreds of tiny (256-d) jit calls, each under the
# ~29 ms tunnel floor on the axon TPU — CPU is faster AND deterministic.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

ARTIFACT_DIR = "/root/reference/examples/metadynamics"


def eval_objective(name, objective, dim, steps):
    from coati_tpu.generative.metadynamics import (
        MetadynamicsConfig,
        walk_embedding_space,
    )

    rng = np.random.default_rng(0)
    v0 = rng.normal(scale=0.5, size=(dim,)).astype(np.float32)

    base = dict(steps=steps, step_size=0.02, noise_scale=0.0, seed=0)
    _, obj_ascent = walk_embedding_space(
        objective, v0, MetadynamicsConfig(**base, hill_height=0.0)
    )
    pos_un, _ = walk_embedding_space(
        objective, v0, MetadynamicsConfig(**base, hill_height=0.0)
    )
    pos_bi, obj_bi = walk_embedding_space(
        objective, v0,
        MetadynamicsConfig(**base, hill_height=0.5, hill_width=1.0),
    )

    increments = np.diff(obj_ascent)
    tail = steps // 2
    step_disp = lambda p: np.linalg.norm(np.diff(p, axis=0), axis=1)  # noqa: E731
    disp_un, disp_bi = step_disp(pos_un), step_disp(pos_bi)
    result = {
        "objective": name,
        "steps": steps,
        "ascent_start": float(obj_ascent[0]),
        "ascent_final": float(obj_ascent[-1]),
        "ascent_monotone": bool(np.all(increments >= -1e-5)),
        "ascent_improved": bool(obj_ascent[-1] > obj_ascent[0] + 1e-4),
        "tail_disp_unbiased": float(disp_un[-tail:].mean()),
        "tail_disp_biased": float(disp_bi[-tail:].mean()),
        "mean_disp_unbiased": float(disp_un.mean()),
        "mean_disp_biased": float(disp_bi.mean()),
        "biased_final_objective": float(obj_bi[-1]),
    }
    result["escapes_hills"] = bool(
        result["tail_disp_biased"] > 3.0 * max(result["tail_disp_unbiased"], 1e-9)
    )
    result["displaces_samples"] = bool(
        result["mean_disp_biased"] > result["mean_disp_unbiased"]
    )
    result["ok"] = bool(
        result["ascent_monotone"]
        and result["ascent_improved"]
        and result["escapes_hills"]
        and result["displaces_samples"]
    )
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=120)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from coati_tpu.generative.metadynamics import (
        combined_objective,
        due_objective,
    )
    from coati_tpu.regression.due_import import load_torch_due

    artifacts = sorted(glob.glob(os.path.join(ARTIFACT_DIR, "due_*.pt")))
    if not artifacts:
        print(json.dumps({"ok": False, "error": "no published artifacts"}))
        sys.exit(1)

    models = {os.path.basename(p): load_torch_due(p) for p in artifacts}
    results = []
    for name, model in models.items():
        results.append(
            eval_objective(
                name, due_objective(model), model.config.input_dim, args.steps
            )
        )
    # combined MPO objective (the reference workflow: several property
    # terms at once)
    if len(models) >= 2:
        pair = list(models.values())[:2]
        names = "+".join(list(models)[:2])
        obj = combined_objective(
            [due_objective(m) for m in pair], [1.0, 0.25]
        )
        results.append(
            eval_objective(names, obj, pair[0].config.input_dim, args.steps)
        )

    verdict = {"ok": all(r["ok"] for r in results), "results": results}
    out = json.dumps(verdict, indent=2)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    sys.exit(0 if verdict["ok"] else 1)


if __name__ == "__main__":
    main()
