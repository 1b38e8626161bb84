"""One-command TPU verification lane (VERDICT r2 item 5).

Runs every TPU-only validation/quality gate and emits ONE JSON verdict:

  pallas_egnn     fused EGNN message kernel parity (validate_pallas.py)
  pallas_decode   masked-read decode kernel parity (validate_pallas_decode.py)
  pallas_prefill  flash prefill parity + trunk A/B (validate_pallas_prefill.py)
  pallas_packed   head-packed attention parity fwd+grad (validate_pallas_packed.py)
  int8_decode     decode-config quality gates on a trained model
                  (eval_int8_decode.py: round-trip/token-agreement/mass)
  bench_smoke     bench.py with BENCH_SKIP_REF=1 (floor thresholds only —
                  the tunnel drifts up to ~25%, so this is a regression
                  tripwire, not a perf measurement)
  bench_seq250    bench.py at BENCH_SEQ=250 BENCH_BATCH=512 — guards the
                  long-sequence round trip (flash-prefill path) the
                  driver bench (seq 96) never exercises; PERF.md
                  reference 608 mol/s, floor 400 (drift band)
  coati2_step     bench_train_coati2.py — one real COATI2 grande train
                  step on TPU; PERF.md reference 687 samples/s/chip,
                  floor 450 (drift band)

Usage:
    python scripts/verify_tpu.py [--out TPUCHECK.json] [--skip name,...]
Knobs: VERIFY_TIMEOUT (s/check, default 2400), EVAL_STEPS (int8 training).

Exit 0 iff every non-skipped check passes. Cited from
.claude/skills/verify/SKILL.md; the committed verdict for round N lives
at TPUCHECK_r{N}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIMEOUT = int(os.environ.get("VERIFY_TIMEOUT", 2400))


def run(script, env_extra=None, args=()):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site:" + REPO
    # children warm-start their remote compiles from the shared
    # persistent cache (common/util.enable_persistent_compilation_cache)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_comp"))
    env.update(env_extra or {})
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, script), *args],
            capture_output=True, text=True, timeout=TIMEOUT, env=env,
            cwd=REPO,
        )
        out = proc.stdout + proc.stderr
        code = proc.returncode
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or "") + (e.stderr or "") + "\nTIMEOUT"
        code = -1
    return code, out, time.time() - t0


def floats(pattern, text):
    return [float(m) for m in re.findall(pattern, text)]


def check_egnn():
    code, out, dt = run("scripts/validate_pallas.py")
    fwd_rel = floats(r"rel: ([0-9.e+-]+)", out)
    grad_rel = floats(r"rel diff ([0-9.e+-]+)", out)
    ok = (
        code == 0
        and len(fwd_rel) >= 1 and all(r <= 1e-4 for r in fwd_rel)
        and len(grad_rel) >= 6 and all(r <= 1e-3 for r in grad_rel)
    )
    return ok, {"fwd_rel": fwd_rel, "grad_rel_max": max(grad_rel or [1])}, out, dt


def check_decode():
    code, out, dt = run("scripts/validate_pallas_decode.py")
    diffs = floats(r"max diff ([0-9.e+-]+)", out)
    # ~7e-3 logit deviation is expected bf16 MXU-pass rounding (see
    # tests/test_pallas_decode.py header) — the gate catches breakage,
    # not rounding
    ok = code == 0 and len(diffs) >= 2 and all(d <= 2e-2 for d in diffs)
    return ok, {"max_diff": max(diffs or [1])}, out, dt


def check_prefill():
    code, out, dt = run("scripts/validate_pallas_prefill.py")
    f32 = floats(r"parity float32: max rel diff ([0-9.e+-]+)", out)
    bf16 = floats(r"parity bfloat16: max rel diff ([0-9.e+-]+)", out)
    ratio = floats(r"pallas/xla: ([0-9.]+)x", out)
    ok = (
        code == 0
        and f32 and f32[0] <= 1e-4
        and bf16 and bf16[0] <= 2e-2
    )
    return ok, {"f32_rel": f32, "bf16_rel": bf16, "trunk_ratio": ratio}, out, dt


def check_packed():
    code, out, dt = run("scripts/validate_pallas_packed.py")
    ok = code == 0 and "all parity checks ok" in out
    ms = {
        m.group(1).strip(): float(m.group(2))
        for m in re.finditer(r"^(\S[^:]*?)\s*:\s*([0-9.]+) ms/iter", out, re.M)
    }
    return ok, {"layer_ms": ms}, out, dt


def check_int8():
    code, out, dt = run("scripts/eval_int8_decode.py")
    rows = re.findall(
        r"^(\S+)\s+round-trip\s+([0-9.]+)%\s+token-agreement-vs-fp32\s+([0-9.]+)%",
        out, re.M,
    )
    masses = floats(r"recall_target [0-9.]+: mean mass ([0-9.]+)", out)
    ok = (
        code == 0
        and len(rows) >= 5
        and all(float(rt) >= 97.0 and float(ag) >= 97.0 for _, rt, ag in rows)
        and masses and all(m >= 0.999 for m in masses)
    )
    return ok, {"rows": rows, "masses": masses}, out, dt


def check_bench():
    code, out, dt = run("bench.py", env_extra={"BENCH_SKIP_REF": "1"})
    result = None
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                result = json.loads(line)
            except json.JSONDecodeError:
                pass
    ok = (
        code == 0
        and result is not None
        and result.get("value", 0) >= 1200
        and result.get("vs_baseline", 0) >= 1000
    )
    return ok, {"bench": result}, out, dt


def check_bench_seq250():
    code, out, dt = run(
        "bench.py",
        env_extra={"BENCH_SKIP_REF": "1", "BENCH_SEQ": "250",
                   "BENCH_BATCH": "512"},
    )
    result = None
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                result = json.loads(line)
            except json.JSONDecodeError:
                pass
    ok = code == 0 and result is not None and result.get("value", 0) >= 400
    return ok, {"bench": result}, out, dt


def check_coati2_step():
    code, out, dt = run("scripts/bench_train_coati2.py")
    per_chip = floats(r"\(([0-9.]+) samples/s/chip", out)
    ok = code == 0 and per_chip and per_chip[0] >= 450
    return ok, {"samples_per_s_chip": per_chip}, out, dt


CHECKS = {
    "pallas_egnn": check_egnn,
    "pallas_decode": check_decode,
    "pallas_prefill": check_prefill,
    "pallas_packed": check_packed,
    "int8_decode": check_int8,
    "bench_smoke": check_bench,
    "bench_seq250": check_bench_seq250,
    "coati2_step": check_coati2_step,
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=None)
    parser.add_argument("--skip", default="")
    args = parser.parse_args()
    skip = {s for s in args.skip.split(",") if s}

    verdict = {"ok": True, "checks": {}}
    for name, fn in CHECKS.items():
        if name in skip:
            verdict["checks"][name] = {"skipped": True}
            continue
        print(f"[verify_tpu] {name} ...", flush=True)
        ok, metrics, out, dt = fn()
        entry = {"ok": ok, "seconds": round(dt, 1), **metrics}
        if not ok:
            entry["tail"] = out[-2000:]
            verdict["ok"] = False
        verdict["checks"][name] = entry
        print(f"[verify_tpu] {name}: {'ok' if ok else 'FAIL'} ({dt:.0f}s)",
              flush=True)

    text = json.dumps(verdict, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    sys.exit(0 if verdict["ok"] else 1)


if __name__ == "__main__":
    main()
