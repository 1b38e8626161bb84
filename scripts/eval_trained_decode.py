"""Decode-defaults evidence on a REAL-pipeline-trained grande model
(VERDICT r2 item 2).

Round 2 promoted int8 KV + topk_recall 0.8 to production defaults on the
strength of ONE tiny trained model (192 synthetic molecules,
eval_int8_decode.py). This script broadens the evidence base: it trains
a GRANDE-config COATI (16x256/16h, the published-checkpoint geometry)
on the 566 in-tree real ChEMBL molecules through the REAL pretraining
stack — train_autoencoder + clip_ar_xform + trie tokenization, the
exact production path (train_coati.py:60-439 semantics) — then measures
each decode configuration against the {fp32, exact top-k} reference:

  * embed->decode greedy round-trip rate (inv_temp 20, k 2);
  * full-sequence SAMPLING statistics at the production regime
    (inv_temp 2, k 100, N samples/config from the same embeddings):
    unigram token-histogram total-variation distance vs the reference
    config, mean generated length, stop rate, and a validity proxy
    (tokenizer round-trip + balanced rings/brackets — rdkit absent);
  * configs: fp32+exact | bf16 | bf16+int8 | bf16+int8+recall0.8
    (production default) | production+pallas-decode.

Together with eval_int8_decode.py (tiny model) the defaults rest on two
trained models of different scales, one through the real pipeline on
real molecules. Writes one JSON verdict (--out, committed at
docs/eval_trained_decode.json).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/eval_trained_decode.py
Knobs: EVAL_STEPS (default 2500), EVAL_SAMPLE_B (default 512), --out.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import pickle
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from coati_tpu.common.util import enable_persistent_compilation_cache
enable_persistent_compilation_cache()

import jax.numpy as jnp

CHEMBL_PKL = "/root/reference/examples/metadynamics/chembl_pic50.pkl"
STEPS = int(os.environ.get("EVAL_STEPS", 2500))
SAMPLE_B = int(os.environ.get("EVAL_SAMPLE_B", 512))


def chembl_smiles():
    with open(CHEMBL_PKL, "rb") as f:
        rows = pickle.load(f)
    out = []
    for r in rows:
        s = r.get("SMILES") or r.get("smiles")
        if isinstance(s, str) and s:
            out.append(s)
    return sorted(set(out))


class ChemblDataset:
    """566 real ChEMBL molecules through the real batch pipe. Rows carry
    SMILES only; the xform synthesizes REAL conformers via the in-tree
    distance-geometry embedder (data/xform.py _synthesize_conformers,
    LRU-cached per unique molecule — round 4). The round-3 1/554
    greedy-round-trip had two causes, both fixed in round 4: (1) this
    dataset fabricated random atoms/coords, so the point-encoder side
    of the CLIP pair was pure noise and the contrastive loss sat at
    chance (ln B) for the whole run (the SMILES-only replacement then
    exposed a second form of the same defect: stack_batch emits EMPTY
    (B, 0) atom columns which the xform's old key-presence guard
    missed — see _conformers_missing); (2) the round-trip compare was
    raw-string while the model correctly emits CANONICAL SMILES — see
    _same_mol.

    Sampling is without replacement per epoch (shuffled corpus passes):
    with-replacement batches of 160 from 499 molecules carry ~25
    duplicate pairs, which InfoNCE treats as false negatives. Each pass
    is also truncated to a multiple of the batch size so batches never
    STRADDLE two passes — a straddling batch draws its head from the
    tail of pass k and its body from a fresh permutation, re-sampling
    ~batch*tail/corpus molecules twice; duplicated rows have identical
    conformer embeddings, so InfoNCE is pushed above its ln(B) floor on
    every straddling batch (~1 in 3 at batch 160 over 499 molecules —
    the reference never sees this regime, its corpus is millions)."""

    summary = {"dataset_type": "chembl_pic50_566"}

    def __init__(self, smiles, epoch_rows, collection="geom_drugs"):
        self.smiles = smiles
        self.epoch_rows = epoch_rows
        self.collection = collection

    def get_data_pipe(self, batch_size=8, partition="train",
                      required_fields=(), xform_routine=lambda x: x, **kw):
        from coati_tpu.data.batch_pipe import batch_rows

        rng = np.random.default_rng(0 if partition == "train" else 1)
        smiles = self.smiles
        # rows per shuffled pass, rounded down to whole batches so no
        # batch straddles two passes (see class docstring); corpora
        # smaller than one batch can't avoid in-batch duplicates.
        per_pass = max(len(smiles) // batch_size, 1) * batch_size

        def rows():
            order = []
            for i in range(self.epoch_rows):
                if not order:
                    order = list(rng.permutation(len(smiles))[:per_pass])
                yield {
                    "smiles": smiles[order.pop()],
                    "source_collection": self.collection,
                }

        return batch_rows(
            rows(), batch_size=batch_size, partition="raw",
            xform_routine=xform_routine, required_fields=["smiles"],
        )


def train_model(tmpdir, smiles=None, collection="geom_drugs", steps=None,
                dataset=None):
    """Train a grande-config COATI through the real pretraining stack.
    `dataset` overrides the default ChemblDataset (any object with the
    COATI_dataset get_data_pipe contract — e.g. data/synth.py
    SynthCorpusDataset for the synthesized generalization corpus)."""
    from coati_tpu.training.config import grande_config
    from coati_tpu.training.logger import COATILogger
    from coati_tpu.training.train import train_autoencoder

    steps = STEPS if steps is None else steps
    config = grande_config(
        data_dir=tmpdir,
        output_dir=os.path.join(tmpdir, "logs"),
        model_dir=os.path.join(tmpdir, "ckpts"),
    )
    config.n_epochs = 1
    # rdkit is absent, so this corpus has NO real conformers — the
    # grande default p_clip_emb_smi=0.5 injects random-coords point
    # embeddings into half the AR rows, which caps how well embed->
    # decode conditioning can train. EVAL_P_SMI=1.0 injects the SMILES
    # clip token always (the signal generation actually conditions on),
    # trading recipe fidelity for a decode-quality-evaluable model.
    config.p_clip_emb_smi = float(
        os.environ.get("EVAL_P_SMI", config.p_clip_emb_smi)
    )
    # likewise, p_randsmiles=0.3 trains the decoder to emit RANDOM
    # valid SMILES forms of each molecule; without rdkit to canonicalize
    # the decode, exact-string round-trip is then capped well below 100%
    # even under perfect conditioning. EVAL_P_RAND=0 makes exact match
    # a meaningful metric on this image.
    config.p_randsmiles = float(
        os.environ.get("EVAL_P_RAND", config.p_randsmiles)
    )
    # embed->decode conditioning on a 566-molecule corpus is a
    # memorization regime: the recipe's 5e-4 plateaus at ar_l ~1.3 by
    # 3k steps; the small-model eval (eval_int8_decode.py) conditions
    # fully at 2e-3
    config.lr = float(os.environ.get("EVAL_LR", config.lr))
    # memorization-regime knob: the recipe's wd=0.1 shrinks weights by
    # ~e^-1 over a 10k-step inversion run; EVAL_WD=0 removes the cap
    config.weight_decay = float(
        os.environ.get("EVAL_WD", config.weight_decay)
    )
    # InfoNCE init-saddle guard (the reference recipe has no warmup —
    # at its million-molecule scale the first steps see so much data
    # diversity the saddle never binds; at grande geometry a full-lr
    # first step measurably collapses the embeddings onto the ln(B)
    # floor for ~75 steps and escape is erratic, see train.py)
    config.lr_warmup_steps = int(os.environ.get("EVAL_WARMUP", 300))
    if smiles is None:
        smiles = chembl_smiles()
    print(f"corpus: {len(smiles)} molecules; grande config "
          f"{config.n_layer_xformer}x{config.n_hidden_xformer}/"
          f"{config.n_head}h, {steps} steps x batch {config.batch_size}")
    if dataset is None:
        dataset = ChemblDataset(
            smiles, epoch_rows=(steps + 2) * config.batch_size,
            collection=collection)
    else:
        dataset.epoch_rows = (steps + 2) * config.batch_size
    logger = COATILogger(
        model_name="e3gnn_smiles_clip_e2e", output_path=config.output_dir,
        model_path=config.model_dir, args=config.as_dict(), dataset="chembl",
    )
    logger.start()
    t0 = time.time()
    train_autoencoder(
        config, dataset, logger=logger, max_steps_per_epoch=steps
    )
    logger.stop()
    print(f"training took {time.time() - t0:.0f}s")
    docs = sorted(glob.glob(os.path.join(config.model_dir, "*")))
    assert docs, "no checkpoint written"
    return docs[-1], smiles


def _valid_proxy(s: str, tokenizer) -> bool:
    """rdkit-free validity proxy: tokenizer round-trips it AND
    rings/brackets balance."""
    try:
        tokenizer.tokenize_text("[SMILES]" + s + "[STOP]", pad=True)
    except (KeyError, ValueError):
        return False
    if s.count("(") != s.count(")") or s.count("[") != s.count("]"):
        return False
    digits = [c for c in s if c.isdigit()]
    return all(digits.count(d) % 2 == 0 for d in set(digits))


def _same_mol(a: str, b: str) -> bool:
    """Graph-level identity (canonical SMILES equality, the reference's
    identical_canonsmi); unparseable decodes count as misses."""
    from coati_tpu.chem.rdkit_support import identical_canonsmi

    try:
        return bool(identical_canonsmi(a, b))
    except Exception:  # noqa: BLE001 - garbage decode
        return a == b


def evaluate(doc_path, smiles, out_path):
    from coati_tpu.models.api import COATI
    from coati_tpu.models.coati import clip_to_special_token
    from coati_tpu.models.io import load_e3gnn_smiles_clip_e2e
    from coati_tpu.models.sampler import generate_tokens
    from coati_tpu.ops.layers import cast_floats

    model, tok = load_e3gnn_smiles_clip_e2e(doc_path)
    base_cfg = model.config

    # embed the corpus once (fp32 highest for a clean reference h).
    # ENCODE the canonical writing: the training xform canonicalizes
    # every row, so h(canonical) is the key the decoder learned —
    # encoding the raw corpus writing hands it a near-but-wrong key
    # (measured: 9% vs 89% greedy round-trip on the same model).
    from coati_tpu.chem.rdkit_support import canon_smiles

    keep, enc = [], []
    for s in smiles:
        if not _valid_proxy(s, tok):
            continue
        try:
            c = canon_smiles(s)
        except Exception:  # noqa: BLE001
            continue
        if len(tok.tokenize_text("[SMILES]" + c + "[STOP]", pad=False)) <= tok.n_seq:
            keep.append(s)
            enc.append(c)
    toks = np.asarray(
        [tok.tokenize_text("[SMILES]" + c + "[STOP]", pad=True) for c in enc],
        np.int32,
    )
    h = np.asarray(COATI(model.params, base_cfg).encode_tokens(toks, tok))
    print(f"eval corpus: {len(keep)} tokenizable molecules")

    prefix = tok.tokenize_text("[CLIP][UNK][SMILES]", pad=False)
    rng_h = np.random.default_rng(0)
    sample_idx = rng_h.integers(0, len(keep), size=SAMPLE_B)

    def run_config(name, repl, approx, greedy):
        cfg = base_cfg.replace(**repl)
        params = model.params
        if cfg.dtype == "bfloat16":
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, model.params)
        xcfg = cfg.xformer_config
        inj = clip_to_special_token(
            cast_floats(params, xcfg.compute_dtype),
            jnp.asarray(h, xcfg.compute_dtype),
        )
        b = inj.shape[0]
        tokens0 = np.zeros((b, tok.n_seq), np.int32)
        tokens0[:, : len(prefix)] = prefix

        def gen(inj_rows, seed, k, inv_temp):
            n = inj_rows.shape[0]
            t0 = np.zeros((n, tok.n_seq), np.int32)
            t0[:, : len(prefix)] = prefix
            out = generate_tokens(
                params.xformer, xcfg, jax.random.PRNGKey(seed),
                jnp.asarray(t0), jnp.full((n,), len(prefix), jnp.int32),
                prefill_len=len(prefix), total_len=tok.n_seq,
                stop_token=tok.stop_token, pad_token=tok.pad_token,
                k=k, inv_temp=inv_temp, inj_payload=inj_rows,
                inject_token=tok.unk_token, approx_top_k=approx,
            )
            return np.asarray(out)

        # greedy round-trip — graph-level identity (canonical SMILES
        # equality): the model is trained on canonicalized targets, so
        # it emits the canonical writing while the corpus stores an
        # arbitrary one; a raw string compare scores those inversions 0
        out = gen(inj, 7, k=2, inv_temp=20.0)
        dec = tok.decode_batch(out[:, len(prefix):], special=False)
        roundtrip = float(np.mean([_same_mol(a, b_)
                                   for a, b_ in zip(dec, keep)]))

        # production-regime sampling statistics
        sout = gen(inj[jnp.asarray(sample_idx)], 11, k=100, inv_temp=2.0)
        gen_region = sout[:, len(prefix):]
        sdec = tok.decode_batch(gen_region, special=False)
        lengths = [len(s) for s in sdec]
        stop_rate = float(np.mean([(r == tok.stop_token).any()
                                   for r in gen_region]))
        valid = float(np.mean([_valid_proxy(s, tok) for s in sdec]))
        hist = np.bincount(gen_region.reshape(-1), minlength=tok.n_token)
        hist = hist / max(hist.sum(), 1)
        return {
            "greedy_roundtrip": roundtrip,
            "mean_len": float(np.mean(lengths)),
            "stop_rate": stop_rate,
            "validity_proxy": valid,
            "_hist": hist,
        }

    configs = [
        ("fp32+exact_topk", {"dtype": "float32"}, False, True),
        ("bf16", {"dtype": "bfloat16", "kv_dtype": "compute",
                  "topk_recall": 0.95}, True, True),
        ("bf16+int8", {"dtype": "bfloat16", "kv_dtype": "int8",
                       "topk_recall": 0.95}, True, True),
        ("bf16+int8+recall0.8 (default)", {"dtype": "bfloat16"}, True, True),
        ("default+pallas_decode", {"dtype": "bfloat16",
                                   "decode_kernel": "pallas"}, True, True),
    ]
    results = {}
    ref_hist = None
    for name, repl, approx, greedy in configs:
        r = run_config(name, repl, approx, greedy)
        if ref_hist is None:
            ref_hist = r["_hist"]
            r["hist_tv_vs_ref"] = 0.0
        else:
            r["hist_tv_vs_ref"] = float(
                0.5 * np.abs(r["_hist"] - ref_hist).sum()
            )
        del r["_hist"]
        results[name] = r
        print(f"{name:32s} rt {r['greedy_roundtrip']:6.1%}  "
              f"len {r['mean_len']:5.1f}  stop {r['stop_rate']:5.1%}  "
              f"valid {r['validity_proxy']:5.1%}  "
              f"TV {r['hist_tv_vs_ref']:.4f}")

    ref_rt = results["fp32+exact_topk"]["greedy_roundtrip"]
    verdict = {
        "model": "grande-config 16x256/16h on 566 real ChEMBL molecules "
                 f"via the real pipeline, {STEPS} steps",
        "eval_molecules": len(keep),
        "sample_batch": SAMPLE_B,
        "results": results,
        # defaults stand iff the production config matches the reference
        # within sampling noise on every axis
        "ok": bool(
            results["bf16+int8+recall0.8 (default)"]["greedy_roundtrip"]
            >= ref_rt - 0.02
            and results["bf16+int8+recall0.8 (default)"]["hist_tv_vs_ref"]
            <= 0.05
        ),
    }
    with open(out_path, "w") as f:
        json.dump(verdict, f, indent=2)
        f.write("\n")
    print(f"verdict ok={verdict['ok']} -> {out_path}")
    return verdict


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="docs/eval_trained_decode.json")
    parser.add_argument("--doc", default=None,
                        help="skip training, evaluate this document")
    args = parser.parse_args()
    if args.doc:
        doc, smiles = args.doc, chembl_smiles()
    else:
        tmpdir = tempfile.mkdtemp(prefix="coati_eval_")
        doc, smiles = train_model(tmpdir)
        print(f"trained document: {doc}")
    verdict = evaluate(doc, smiles, args.out)
    sys.exit(0 if verdict["ok"] else 1)


if __name__ == "__main__":
    main()
