"""Tracing / profiling / numerical-guard utilities.

The reference has no profiling or sanitizers (SURVEY.md §5.1-5.2: only
wall-clock prints and runtime isfinite asserts). TPU-native equivalents:

  * `profile_trace(...)` — jax.profiler context writing a TensorBoard-
    loadable trace of the train step;
  * `step_timer` — per-step wall-clock accounting for the JSONL logger;
  * `finite_check` / `checkify_nan_guard` — batch/param NaN detection
    replacing the reference's in-forward asserts (e3gnn_clip.py:126-128).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


@contextmanager
def profile_trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class step_timer:
    """Accumulates step wall-clock stats; emit() -> metrics dict."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def emit(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "step_time_mean_s": float(arr.mean()),
            "step_time_p50_s": float(np.percentile(arr, 50)),
            "step_time_p95_s": float(np.percentile(arr, 95)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }


def compiled_cost(jitted_fn, *args):
    """AOT-compile a jitted function and return (compiled, cost_dict).

    `compiled` is callable with the same args (so benchmarks pay ONE
    compile and still get the XLA cost model); `cost_dict` holds
    "flops" and "bytes accessed" when the backend reports them, else
    NaN. FLOPs are *executed* FLOPs — rematerialization recompute is
    included — which is the honest numerator for a hardware-utilization
    roofline (model-FLOPs MFU needs a no-remat compile of the same
    step; see scripts/bench_train.py TRAIN_MODEL_FLOPS).
    """
    compiled = jitted_fn.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older JAX: one dict per device
        ca = ca[0] if ca else {}
    ca = ca or {}
    cost = {
        "flops": float(ca.get("flops", float("nan"))),
        "bytes_accessed": float(ca.get("bytes accessed", float("nan"))),
    }
    return compiled, cost


def finite_check(tree, name: str = "tree") -> None:
    """Host-side NaN/Inf audit of a pytree; raises with the bad paths."""
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def checkify_nan_guard(fn: Callable) -> Callable:
    """Wrap a jittable function with jax.experimental.checkify float
    checks; the wrapper raises on NaN inside jit instead of propagating."""
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapped
