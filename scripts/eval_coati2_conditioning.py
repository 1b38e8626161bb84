"""Property-conditioning efficacy evaluation for the COATI2 recipe.

Trains a small COATI2 with the real training stack (coati2_ar_xform +
train step) on a synthetic corpus where one property is fully
determined by the molecule: heavy-atom count (= SMILES length for the
unbranched C/N/O chains used here), fed through the [NumRotatableBonds]
token channel with precomputed 'properties' columns. Then generates with
the prefix '[PROPS][NumRotatableBonds][NUM<n>][ENDPROPS][CLIP][UNK][SMILES]'
for several n and measures whether the generated molecule length tracks
the conditioning value — a direct, rdkit-free test that the conditioning
curriculum actually steers generation.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/eval_coati2_conditioning.py
Env knobs: EVAL_STEPS (default 3000).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from coati_tpu.data.xform_coati2 import coati2_ar_xform
from coati_tpu.models.coati2 import COATI2, init_coati2
from coati_tpu.parallel.mesh import make_mesh, replicate_params, shard_batch
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer
from coati_tpu.training.config import TrainConfig
from coati_tpu.training.train import make_optimizer
from coati_tpu.training.train_coati2 import (
    Coati2TrainConfig,
    make_coati2_train_step,
)


def make_corpus(n_per_len: int = 24, lengths=range(4, 17)):
    """Unbranched C/N/O chains: heavy-atom count == len(smiles)."""
    rng = np.random.default_rng(0)
    atoms = ["C", "N", "O"]
    corpus = []
    for length in lengths:
        seen = set()
        while len(seen) < n_per_len:
            s = "C" + "".join(atoms[rng.integers(0, 3)] for _ in range(length - 1))
            seen.add(s)
        corpus.extend(sorted(seen))
    return corpus


def main():
    n_steps = int(os.environ.get("EVAL_STEPS", 3000))
    corpus = make_corpus()
    print(f"corpus: {len(corpus)} chains, lengths 4-16")

    tok = TrieTokenizer(n_seq=48, **get_vocab("coati2_12_12"))
    config = Coati2TrainConfig(
        n_layer_xformer=3,
        n_hidden_xformer=96,
        embed_dim=96,
        n_head=4,
        n_seq=48,
        n_direct_clr=16,
        p_props=0.9,
        p_prop_each=1.0,
        # half the rows train WITHOUT the [CLIP][UNK] embedding injection:
        # when every row carries the (fully-informative) embedding, the
        # property tokens are redundant and the model learns to ignore
        # them — p_clip<1 is what makes pure property conditioning work
        p_clip=0.5,
        lr=2e-3,
        remat=False,
    )
    model_cfg = config.model_config(tok.n_token)
    mesh = make_mesh(1)
    optimizer = make_optimizer(TrainConfig(lr=config.lr, weight_decay=1e-3))
    params = replicate_params(mesh, init_coati2(jax.random.PRNGKey(0), model_cfg))
    opt_state = optimizer.init(params)
    step = make_coati2_train_step(
        mesh, model_cfg, optimizer,
        stop_token=tok.stop_token,
        unk_token=tok.unk_token,
        pad_token=tok.pad_token,
        token_entropy_unit=float(np.log2(tok.n_token)),
        do_clr=True,
        clr_inv_temp=config.clr_inv_temp,
    )

    # the conditioning channel: NumRotatableBonds token carries the
    # heavy-atom count (precomputed 'properties' column, no rdkit)
    def props_for(s):
        return {"NumRotatableBonds": len(s)}

    import random as _random

    rng_py = _random.Random(0)
    rng = jax.random.PRNGKey(1)
    np_rng = np.random.default_rng(2)
    t0 = time.time()
    for i in range(n_steps):
        idx = np_rng.integers(0, len(corpus), size=64)
        rows = [corpus[j] for j in idx]
        batch = coati2_ar_xform(
            {"smiles": rows, "properties": [props_for(s) for s in rows]},
            tok, p_props=config.p_props, p_prop_each=1.0,
            p_clip=config.p_clip, rng=rng_py,
        )
        device_batch = shard_batch(
            mesh,
            {k: batch[k] for k in ("tokens", "raw_tokens", "rand_tokens", "y_next")},
        )
        rng, step_rng = jax.random.split(rng)
        params, opt_state, metrics = step(params, opt_state, step_rng, device_batch)
        if i % 500 == 0:
            print(f"step {i}: loss {float(metrics['loss']):.4f} "
                  f"({time.time() - t0:.0f}s)")
    print(f"final loss {float(metrics['loss']):.4f}")

    # ---------------------------------------------------- conditioning test
    # PURE property-conditioned sampling: '[PROPS]...[ENDPROPS][SMILES]'
    # prefix, NO embedding injection — the controlled-generation mode the
    # coati2_12_12 vocabulary exists for
    from coati_tpu.models.sampler import auto_stage_widths, generate_tokens
    import jax.numpy as jnp

    final = COATI2(jax.device_get(params), model_cfg, seed=11)
    n_samples = 64
    print("\nprefix-conditioned generation (target -> mean generated length):")
    results = {}
    for target in (5, 8, 11, 14):
        prefix = tok.tokenize_text(
            f"[PROPS][NumRotatableBonds][NUM{target}][ENDPROPS][SMILES]",
            pad=False,
        )
        total_len = model_cfg.n_seq
        tokens0 = np.zeros((n_samples, total_len), np.int32)
        tokens0[:, : len(prefix)] = prefix
        out = generate_tokens(
            final.params.xformer,
            model_cfg.xformer_config,
            jax.random.PRNGKey(100 + target),
            jnp.asarray(tokens0),
            jnp.full((n_samples,), len(prefix), jnp.int32),
            prefill_len=len(prefix),
            total_len=total_len,
            stop_token=tok.stop_token,
            pad_token=tok.pad_token,
            k=4,
            inv_temp=2.0,
            stage_widths=auto_stage_widths(len(prefix), total_len),
        )
        decoded = [tok.decode(list(r), special=False) for r in np.asarray(out)]
        lengths = [len(s) for s in decoded if s and set(s) <= set("CNO")]
        mean_len = float(np.mean(lengths)) if lengths else float("nan")
        results[target] = mean_len
        print(f"  NUM{target}: mean length {mean_len:.1f} "
              f"({len(lengths)}/{n_samples} clean chains)")

    targets = sorted(results)
    means = [results[t] for t in targets]
    monotone = all(
        means[i] < means[i + 1] for i in range(len(means) - 1)
        if not (np.isnan(means[i]) or np.isnan(means[i + 1]))
    )
    corr = float(np.corrcoef(targets, means)[0, 1])
    print(f"\nlength/target correlation: {corr:.3f} (monotone: {monotone})")
    return results


if __name__ == "__main__":
    main()
