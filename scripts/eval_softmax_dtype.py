"""Training-quality validation of softmax_dtype="compute" (PERF.md
journal item 9 — the grande/COATI2 recipe default).

The bf16-softmax fast path changes training numerics (~0.4% attention
prob error), so this trains the SAME small COATI three ways from the
same init on the eval_int8_decode corpus:

  * f32 compute (parity control)
  * bf16 compute, f32 softmax (the old bf16 default)
  * bf16 compute, compute-dtype softmax (the new recipe default)

and reports the loss trajectory plus the final embed -> decode
round-trip rate for each. The claim under test: the bf16-softmax run
converges like the f32-softmax run and reaches the same round-trip
quality.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/eval_softmax_dtype.py
Env knobs: EVAL_STEPS (default 2500), EVAL_MOLS (default 192).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from coati_tpu.models import coati as F
from coati_tpu.models.api import COATI
from coati_tpu.models.coati import CoatiConfig, init_coati
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

from eval_int8_decode import make_corpus  # noqa: E402 - same dir


def train_one(cfg, tok, corpus, n_steps: int):
    params = init_coati(jax.random.PRNGKey(0), cfg)
    raw, aug = [], []
    for s in corpus:
        raw.append(tok.tokenize_text("[SMILES]" + s + "[STOP]", pad=True))
        aug.append(tok.tokenize_text("[CLIP][UNK][SMILES]" + s + "[STOP]", pad=True))
    raw = np.asarray(raw, np.int32)
    aug = np.asarray(aug, np.int32)
    y_next = np.zeros_like(aug)
    y_next[:, :-1] = aug[:, 1:]
    for t in (tok.clip_token, tok.pad_token, tok.unk_token):
        y_next[y_next == t] = -1

    optimizer = optax.adamw(2e-3, b1=0.9, b2=0.99, weight_decay=1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, raw_t, aug_t, y_t):
        def loss_fn(p):
            h = F.encode_tokens(p, cfg, raw_t, tok.stop_token)
            inj = F.clip_to_special_token(p, h)
            from coati_tpu.models.transformer import forward_logits

            logits = forward_logits(
                p.xformer, cfg.xformer_config, aug_t, inj, tok.unk_token
            )
            return F.ar_loss_fn(logits, y_t)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(1)
    curve = []
    for i in range(n_steps):
        idx = rng.integers(0, len(corpus), size=64)
        params, opt_state, loss = step(
            params, opt_state, raw[idx], aug[idx], y_next[idx]
        )
        if i % 500 == 0 or i == n_steps - 1:
            curve.append((i, float(loss)))
    return params, curve


def round_trip_rate(params, cfg, tok, corpus) -> float:
    model = COATI(params, cfg)
    toks = np.asarray(
        [tok.tokenize_text("[SMILES]" + s + "[STOP]", pad=True) for s in corpus],
        np.int32,
    )
    h = model.encode_tokens(toks, tok)
    out = model.hclip_to_2d_batch(np.asarray(h), tok, k=1, inv_temp=1.0)
    return float(np.mean([o == s for o, s in zip(out, corpus)]))


def main():
    n_steps = int(os.environ.get("EVAL_STEPS", 2500))
    n_mols = int(os.environ.get("EVAL_MOLS", 192))
    corpus = make_corpus(n_mols)
    n_seq = 48
    tok = TrieTokenizer(n_seq=n_seq, **get_vocab("mar_verysimple"))
    base = CoatiConfig(
        n_layer_e3gnn=1, n_layer_xformer=4, n_hidden_xformer=128,
        n_hidden_e3nn=16, n_embd_common=128, n_head=4, n_seq=n_seq,
        n_tok=tok.n_token, norm_clips=True, token_mlp=True,
        use_point_encoder=False,
    )
    modes = (
        ("f32 compute (control)", base),
        ("bf16 + f32 softmax", base.replace(dtype="bfloat16")),
        ("bf16 + compute softmax", base.replace(
            dtype="bfloat16", softmax_dtype="compute"
        )),
    )
    for name, cfg in modes:
        t0 = time.time()
        params, curve = train_one(cfg, tok, corpus, n_steps)
        rt = round_trip_rate(params, cfg, tok, corpus)
        pts = "  ".join(f"{i}:{l:.3f}" for i, l in curve)
        print(f"{name:26s} round-trip {rt*100:5.1f}%  loss[{pts}] "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
