"""Component breakdown of the grande CLIP+AR train step.

Times fwd-only and fwd+grad of each slice of the train step with the
only method that resolves sub-step components on this tunneled runtime
(PERF.md "Benchmarking"): repeat the op ITERS times inside ONE jit via
lax.fori_loop with loop-varying inputs (rolled tokens / fold_in rng —
otherwise XLA hoists the whole body), reduce to a scalar on device,
sync with np.asarray. Single-call timings sit on the ~26-29 ms tunnel
floor and cannot resolve anything.

Slices (grande config, B=160 seq 80 N=96 bf16 by default; knobs as in
bench_train.py plus BREAKDOWN_ITERS):
  pts   = encode_points (EGNN + projection)
  smi   = encode_tokens (trunk encode pass + stop gather + projection)
  ar    = full training forward + AR loss (includes pts + smi: the AR
          decoder pass with clip-token injection is ar - pts - smi)
  full  = ar + clip_loss (the local_loss the real step differentiates)
  opt   = AdamW update + apply_updates on a grads-shaped tree
Grad variants reduce the WHOLE grads tree to a scalar (anything less
lets XLA dead-code-eliminate most of the backward).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from coati_tpu.models import coati as M
from coati_tpu.models.coati import init_coati
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer
from coati_tpu.training.config import grande_config
from coati_tpu.training.train import (
    make_optimizer,
    model_config_from_train_config,
)

ITERS = int(os.environ.get("BREAKDOWN_ITERS", 8))


def tree_scalar(tree) -> jnp.ndarray:
    leaves = [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(tree)]
    return jnp.sum(jnp.stack(leaves))


def timed(name: str, make_body, *args):
    """make_body(i, s, *args) -> scalar; loop it ITERS times in one jit."""

    def looped(*args):
        def body(i, s):
            return make_body(i, s, *args)

        return lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    j = jax.jit(looped)
    np.asarray(j(*args))  # compile + first exec
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(j(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1000
    print(f"{name:18s}: {ms:7.2f} ms/iter (best wall {best:.3f}s for {ITERS})")
    return ms


def main():
    batch = int(os.environ.get("TRAIN_BATCH", 160))
    seq = int(os.environ.get("TRAIN_SEQ", 80))
    n_atoms = int(os.environ.get("TRAIN_ATOMS", 96))
    dtype = os.environ.get("TRAIN_DTYPE", "bfloat16")
    packed = os.environ.get("TRAIN_PACKED", "0") == "1"

    print(
        f"device: {jax.devices()[0]}, batch {batch}, seq {seq}, "
        f"atoms {n_atoms}, {dtype}, packed={packed}, iters={ITERS}"
    )
    tok = TrieTokenizer(n_seq=seq, **get_vocab("mar"))
    config = grande_config(n_seq=seq, max_n_seq=seq, batch_size=batch, dtype=dtype)
    cfg = model_config_from_train_config(config, tok.n_token)
    params = init_coati(jax.random.PRNGKey(0), cfg)
    token_entropy_unit = float(np.log2(tok.n_token))

    rng = np.random.default_rng(0)
    tokens = rng.integers(100, tok.n_token, size=(batch, seq)).astype(np.int32)
    tokens[:, 0] = tok.smiles_token
    tokens[:, -2] = tok.stop_token
    tokens[:, -1] = tok.pad_token
    y_next = np.zeros_like(tokens)
    y_next[:, :-1] = tokens[:, 1:]
    y_next[y_next == tok.pad_token] = -1
    atoms = rng.integers(1, 9, size=(batch, n_atoms)).astype(np.int32)
    if packed:
        natoms = rng.integers(24, n_atoms + 1, size=(batch,))
        atoms[np.arange(n_atoms)[None, :] >= natoms[:, None]] = 0
    coords = rng.normal(size=(batch, n_atoms, 3)).astype(np.float32)

    tokens = jnp.asarray(tokens)
    y_next = jnp.asarray(y_next)
    atoms = jnp.asarray(atoms)
    coords = jnp.asarray(coords)
    key = jax.random.PRNGKey(1)

    # ---- loss slices (each takes loop-varied inputs) -----------------
    def pts_loss(p, at, co):
        return jnp.sum(M.encode_points(p, cfg, at, co).astype(jnp.float32))

    def smi_loss(p, tk):
        return jnp.sum(
            M.encode_tokens(p, cfg, tk, tok.stop_token).astype(jnp.float32)
        )

    def ar_loss(p, k, tk, yn, at, co):
        _, _, logits, _ = M.forward(
            p, cfg, k, tk, tk, at, co, tok.stop_token, tok.unk_token,
            config.p_clip_emb_smi,
        )
        return M.ar_loss_fn(logits, yn)

    def full_loss(p, k, tk, yn, at, co):
        he, hs, logits, bad = M.forward(
            p, cfg, k, tk, tk, at, co, tok.stop_token, tok.unk_token,
            config.p_clip_emb_smi,
        )
        ar = M.ar_loss_fn(logits, yn)
        return ar + M.clip_loss(hs, he, bad) * token_entropy_unit

    # loop-varying views: roll int inputs by i, fold i into the rng, and
    # nudge coords by the carry (s is data-dependent, unhoistable)
    def vary(i, s):
        tk = jnp.roll(tokens, i, axis=0)
        yn = jnp.roll(y_next, i, axis=0)
        at = jnp.roll(atoms, i, axis=0)
        co = jnp.roll(coords, i, axis=0) * (1.0 + 0.0 * s)
        return tk, yn, at, co, jax.random.fold_in(key, i)

    def fwd(loss_fn, pick):
        def body(i, s, p):
            tk, yn, at, co, k = vary(i, s)
            return s + loss_fn(p, *pick(k, tk, yn, at, co))

        return body

    def fwdgrad(loss_fn, pick):
        def body(i, s, p):
            tk, yn, at, co, k = vary(i, s)
            val, grads = jax.value_and_grad(loss_fn)(p, *pick(k, tk, yn, at, co))
            return s + val + tree_scalar(grads)

        return body

    pick_pts = lambda k, tk, yn, at, co: (at, co)
    pick_smi = lambda k, tk, yn, at, co: (tk,)
    pick_ar = lambda k, tk, yn, at, co: (k, tk, yn, at, co)

    t = {}
    t["pts fwd"] = timed("pts fwd", fwd(pts_loss, pick_pts), params)
    t["pts f+g"] = timed("pts fwd+grad", fwdgrad(pts_loss, pick_pts), params)
    t["smi fwd"] = timed("smi fwd", fwd(smi_loss, pick_smi), params)
    t["smi f+g"] = timed("smi fwd+grad", fwdgrad(smi_loss, pick_smi), params)
    t["ar fwd"] = timed("ar fwd", fwd(ar_loss, pick_ar), params)
    t["ar f+g"] = timed("ar fwd+grad", fwdgrad(ar_loss, pick_ar), params)
    t["full fwd"] = timed("full fwd", fwd(full_loss, pick_ar), params)
    t["full f+g"] = timed("full fwd+grad", fwdgrad(full_loss, pick_ar), params)

    # ---- optimizer slice --------------------------------------------
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)

    def opt_body(i, s, p, st):
        # grads shaped like params, loop-varied through s so the update
        # chain cannot be hoisted; reduce updated params to a scalar
        grads = jax.tree.map(lambda x: x * (1e-30 * (s + i)), p)
        updates, st2 = optimizer.update(grads, st, p)
        import optax

        p2 = optax.apply_updates(p, updates)
        return s + tree_scalar(p2) * 1e-30 + tree_scalar(jax.tree.leaves(st2)[0])

    t["opt"] = timed("opt update", opt_body, params, opt_state)

    print("\nderived:")
    print(f"  AR decoder pass f+g  ~ {t['ar f+g'] - t['pts f+g'] - t['smi f+g']:.2f} ms"
          " (ar - pts - smi)")
    print(f"  clip loss f+g        ~ {t['full f+g'] - t['ar f+g']:.2f} ms (full - ar)")
    print(f"  backward/forward     ~ {t['full f+g'] / max(t['full fwd'], 1e-9):.2f}x")
    print("  NOTE: the grads-tree reduction adds ~0.3-0.5 ms to every f+g "
          "slice; opt_body builds a grads tree per iter (~1 param pass) "
          "so 'opt update' overstates the real AdamW cost by ~25%.")


if __name__ == "__main__":
    main()
