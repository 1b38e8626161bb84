"""int8 KV-cache quality evaluation on a TRAINED model (ROADMAP #7).

The published reference weights are unreachable offline, so this trains a
small COATI from scratch until the embed -> decode round-trip works, then
compares decode quality across cache configurations:

  * bf16 KV cache (production default)
  * int8 KV cache (kv_dtype="int8", half the decode bandwidth)
  * bf16 + Pallas masked-read kernel (decode_kernel="pallas"; the
    kernel supports non-quantized caches only — decode_step rejects
    the int8 combination)

Reported per config: exact round-trip rate (decode(embed(s)) == s) and
token-level agreement with the fp32 decode. Synthetic corpus of simple
acyclic SMILES (no rdkit needed: strings are their own canonical form
here, so exact match is the correct metric).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/eval_int8_decode.py
Env knobs: EVAL_STEPS (default 3000), EVAL_MOLS (default 192).
"""

from __future__ import annotations

import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from coati_tpu.models import coati as F
from coati_tpu.models.api import COATI
from coati_tpu.models.coati import CoatiConfig, init_coati
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer


def make_corpus(n: int) -> list:
    """Simple acyclic SMILES over C/N/O with branches — tokenizable by
    every vocab, valid without rdkit."""
    atoms = ["C", "N", "O"]
    rng = np.random.default_rng(0)
    out = []
    for length in itertools.count(3):
        for _ in range(max(8, n // 12)):
            s = ""
            for i in range(length):
                s += atoms[rng.integers(0, 3)] if i else "C"
                if i > 0 and i < length - 1 and rng.random() < 0.25:
                    s += "(" + atoms[rng.integers(0, 3)] + ")"
            out.append(s)
            if len(set(out)) >= n:
                return sorted(set(out))[:n]


def main():
    n_steps = int(os.environ.get("EVAL_STEPS", 3000))
    n_mols = int(os.environ.get("EVAL_MOLS", 192))
    corpus = make_corpus(n_mols)
    print(f"corpus: {len(corpus)} molecules, e.g. {corpus[:3]}")

    n_seq = 48
    tok = TrieTokenizer(n_seq=n_seq, **get_vocab("mar_verysimple"))
    cfg = CoatiConfig(
        n_layer_e3gnn=1, n_layer_xformer=4, n_hidden_xformer=128,
        n_hidden_e3nn=16, n_embd_common=128, n_head=4, n_seq=n_seq,
        n_tok=tok.n_token, norm_clips=True, token_mlp=True,
        use_point_encoder=False,
        # pin the BASELINE rows above the production default (0.8) so
        # the explicit recall0.8 row isolates the knob — otherwise the
        # fp32 reference itself runs at 0.8 and the A/B is vacuous
        topk_recall=0.95,
    )
    params = init_coati(jax.random.PRNGKey(0), cfg)

    # training rows: "[CLIP][UNK][SMILES]s[STOP]" with the smiles-clip
    # token injected over [UNK] — exactly the generation-time conditioning
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

    import optax

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
    t0 = time.time()
    for i in range(n_steps):
        idx = rng.integers(0, len(corpus), size=64)
        params, opt_state, loss = step(params, opt_state, raw[idx], aug[idx], y_next[idx])
        if i % 500 == 0:
            print(f"step {i}: loss {float(loss):.4f} ({time.time() - t0:.0f}s)")
    print(f"final loss {float(loss):.4f}")

    # ------------------------------------------------------- evaluation
    fp32_tokens = None
    results = {}
    for name, axes in (
        ("fp32", {"dtype": "float32"}),
        # explicit "compute": a bf16 cache row (kv_dtype="auto" under
        # bf16 now resolves to int8, the production default)
        ("bf16", {"dtype": "bfloat16", "kv_dtype": "compute"}),
        ("bf16+int8kv", {"dtype": "bfloat16", "kv_dtype": "int8"}),
        ("bf16+int8kv+bf16scale", {"dtype": "bfloat16", "kv_dtype": "int8",
                                   "kv_scale_dtype": "bfloat16"}),
        # kv_dtype left "auto" => int8: since round 3 the pallas
        # masked-read kernel streams the int8+scales cache directly,
        # so this row gates the full production decode config through it
        ("bf16+int8kv+pallas", {"dtype": "bfloat16",
                                "decode_kernel": "pallas"}),
        # lowered approx_max_k recall target (decode throughput knob,
        # see TransformerConfig.topk_recall): per-block maxima always
        # survive, so near-greedy round-trip must be unaffected
        ("bf16+int8kv+recall0.8", {"dtype": "bfloat16", "kv_dtype": "int8",
                                   "topk_recall": 0.8}),
    ):
        eval_cfg = cfg.replace(**axes)
        p = params
        if axes.get("dtype") == "bfloat16":
            p = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
        model = COATI(p, eval_cfg, seed=7)
        h = model.encode_tokens(raw, tok)
        smiles, toks = model.hclip_to_2d_batch(
            np.asarray(h, np.float32), tok, inv_temp=20.0, k=2,
            return_tokens=True,
        )
        toks = np.asarray(toks)
        if fp32_tokens is None:
            fp32_tokens = toks
        roundtrip = float(np.mean([a == b for a, b in zip(smiles, corpus)]))
        agree = float(np.mean(toks == fp32_tokens))
        results[name] = (roundtrip, agree)
        print(f"{name:22s} round-trip {roundtrip:6.1%}   "
              f"token-agreement-vs-fp32 {agree:6.1%}")

    # ---- candidate-mass fidelity of the lowered recall target -------
    # On TRAINED logits (first-step AR distribution over the corpus):
    # report sum softmax(inv_temp * logits) over each candidate set.
    # NOTE on interpretation: lowering recall only matters when mass
    # drops visibly below the exact top-k's — with both masses ~1.0 the
    # truncated-and-renormalized sampling distributions are essentially
    # the same; when masses diverge (flat-logit models) this report
    # does NOT bound the distortion and the recall target should stay
    # high. (Production sampling additionally uses the k-th value as a
    # THRESHOLD, ops/sampling.py — a superset of the true top-k — so a
    # missed member is re-admitted; the mass here is the conservative
    # candidate-set-only view.)
    from coati_tpu.models.transformer import forward_logits

    logits = forward_logits(params.xformer, cfg.xformer_config, jnp.asarray(raw))
    last = logits[jnp.arange(len(raw)), jnp.sum(jnp.asarray(raw) > 0, axis=1) - 1]
    for inv_temp, k in ((2.0, 100),):
        probs = jax.nn.softmax(inv_temp * last.astype(jnp.float32), axis=-1)
        _, exact_idx = jax.lax.top_k(last, k)
        exact_mass = jnp.take_along_axis(probs, exact_idx, axis=-1).sum(-1)
        print(f"candidate softmax mass at inv_temp={inv_temp} k={k} "
              f"(exact top-k): {float(exact_mass.mean()):.6f}")
        for rt in (0.95, 0.8, 0.7):
            _, idxs = jax.lax.approx_max_k(last, k, recall_target=rt)
            mass = jnp.take_along_axis(probs, idxs, axis=-1).sum(-1)
            print(f"  recall_target {rt}: mean mass {float(mass.mean()):.6f} "
                  f"(min {float(mass.min()):.6f}; vs exact "
                  f"{float((exact_mass - mass).mean()):.2e})")

    return results


if __name__ == "__main__":
    main()
