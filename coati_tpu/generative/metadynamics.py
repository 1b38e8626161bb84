"""Metadynamics generative optimization in COATI embedding space.

Reconstruction of the reference's metadynamics MPO workflow
(examples/metadynamics/metadynamics.ipynb — the notebook blob is absent
upstream, but README.md:9 describes it and its DUE artifacts remain:
due_qed_barlow.pt / due_logp_barlow.pt / due_hcaii_barlow_terray.pt):
design molecules satisfying a multi-parameter objective (potency,
solubility, druglikeness) by walking the invertible embedding space
under property objectives plus a REPULSIVE HISTORY BIAS — Gaussian hills
dropped at visited points, metadynamics-style — so the walker keeps
discovering new molecules instead of re-sampling one optimum.

All objective terms are JAX functions of the embedding vector, so the
walk uses exact gradients and is jitted end to end; candidate molecules
are realized with the batched KV-cache decoder + validity filtering.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from coati_tpu.chem.rdkit_support import canonicalize_or_self, is_valid_smiles
from coati_tpu.generative.purifications import embed_smiles_batch
from coati_tpu.models.api import COATI
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer


@dataclass
class MetadynamicsConfig:
    steps: int = 50
    step_size: float = 0.05  # gradient-ascent step on the objective
    hill_height: float = 1.0  # repulsive bias amplitude
    hill_width: float = 1.0  # gaussian hill sigma in embedding space
    noise_scale: float = 0.05  # exploration noise per step
    decode_batch: int = 32  # decodes per step to realize molecules
    inv_temp: float = 2.0
    k: int = 100
    re_embed: bool = True  # snap the walker to embed(decode(v)) each step
    seed: int = 0


@dataclass
class MetadynamicsResult:
    smiles: List[str]
    scores: List[float]
    vectors: np.ndarray
    history: List[Dict]
    best_smiles: str = ""
    best_score: float = -np.inf

    def top(self, n: int = 10):
        order = np.argsort(self.scores)[::-1][:n]
        return [(self.smiles[i], self.scores[i]) for i in order]


def gaussian_hills_bias(
    v: jnp.ndarray, centers: jnp.ndarray, height: float, width: float
) -> jnp.ndarray:
    """Sum of repulsive Gaussian hills at visited centers (the
    metadynamics history bias). centers: (H, D); v: (D,)."""
    d2 = jnp.sum(jnp.square(v[None, :] - centers), axis=-1)
    return height * jnp.sum(jnp.exp(-0.5 * d2 / width**2))


def _make_ascend(
    objective_fn: Callable[[jnp.ndarray], jnp.ndarray],
    cfg: "MetadynamicsConfig",
    max_hills: int,
):
    """Jitted one-step gradient ascent on objective - history bias."""

    @jax.jit
    def ascend(v, centers, n_hills):
        def total(v):
            mask = jnp.arange(max_hills) < n_hills
            d2 = jnp.sum(jnp.square(v[None, :] - centers), axis=-1)
            bias = cfg.hill_height * jnp.sum(
                jnp.where(mask, jnp.exp(-0.5 * d2 / cfg.hill_width**2), 0.0)
            )
            return objective_fn(v) - bias

        score, grad = jax.value_and_grad(total)(v)
        return v + cfg.step_size * grad, score

    return ascend


def walk_embedding_space(
    objective_fn: Callable[[jnp.ndarray], jnp.ndarray],
    v0: np.ndarray,
    config: Optional[MetadynamicsConfig] = None,
):
    """Pure embedding-space metadynamics walk — the exact ascend/hill
    dynamics of run_metadynamics with the decode/re-embed machinery
    stripped (no molecules realized).

    Returns (positions (steps+1, D), objectives (steps+1,)): position 0
    is v0 and objectives[i] = objective_fn(positions[i]) (WITHOUT the
    bias term, so the trace measures real objective progress). Used by
    scripts/eval_metadynamics.py and tests to assert the walk optimizes
    (objective non-decreasing under pure ascent) and that the history
    bias measurably displaces successive samples."""
    cfg = config or MetadynamicsConfig()
    rng = np.random.default_rng(cfg.seed)
    v = jnp.asarray(np.asarray(v0, np.float32).reshape(-1))
    dim = v.shape[0]
    max_hills = max(cfg.steps, 1)
    centers = np.zeros((max_hills, dim), np.float32)
    n_hills = 0
    ascend = _make_ascend(objective_fn, cfg, max_hills)

    positions = [np.asarray(v)]
    objectives = [float(objective_fn(v))]
    for _ in range(cfg.steps):
        v, _ = ascend(v, jnp.asarray(centers), jnp.asarray(n_hills))
        if cfg.noise_scale > 0:
            v = v + jnp.asarray(
                rng.normal(scale=cfg.noise_scale, size=(dim,)).astype(np.float32)
            )
        centers[n_hills % max_hills] = np.asarray(v)
        n_hills = min(n_hills + 1, max_hills)
        positions.append(np.asarray(v))
        objectives.append(float(objective_fn(v)))
    return np.stack(positions, 0), np.asarray(objectives)


def run_metadynamics(
    encoder: COATI,
    tokenizer: TrieTokenizer,
    objective_fn: Callable[[jnp.ndarray], jnp.ndarray],
    v0: np.ndarray,
    config: Optional[MetadynamicsConfig] = None,
) -> MetadynamicsResult:
    """Metadynamics walk maximizing objective_fn(v) - history_bias(v).

    objective_fn maps a (D,) embedding to a scalar score (e.g. a weighted
    sum of DUE predictive means); it must be JAX-differentiable.
    """
    cfg = config or MetadynamicsConfig()
    rng = np.random.default_rng(cfg.seed)
    dim = encoder.embed_dim
    v = jnp.asarray(np.asarray(v0, np.float32).reshape(dim))
    max_hills = cfg.steps
    centers = np.zeros((max_hills, dim), np.float32)
    n_hills = 0
    ascend = _make_ascend(objective_fn, cfg, max_hills)

    all_smiles: List[str] = []
    all_scores: List[float] = []
    all_vectors: List[np.ndarray] = []
    history: List[Dict] = []
    best_smiles, best_score = "", -np.inf
    seen = set()

    for step in range(cfg.steps):
        v, _ = ascend(v, jnp.asarray(centers), jnp.asarray(n_hills))
        v = v + jnp.asarray(
            rng.normal(scale=cfg.noise_scale, size=(dim,)).astype(np.float32)
        )

        # realize molecules at the walker position
        decoded = encoder.hclip_to_2d_batch(
            np.tile(np.asarray(v)[None, :], (cfg.decode_batch, 1)),
            tokenizer,
            inv_temp=cfg.inv_temp,
            k=cfg.k,
        )
        valid = [canonicalize_or_self(s) for s in decoded if is_valid_smiles(s)]
        # drop molecules the tokenizer can't round-trip (oversized/foreign)
        uniq = []
        for s in sorted(set(valid)):
            try:
                tokenizer.tokenize_text("[SMILES]" + s + "[STOP]", pad=True)
                uniq.append(s)
            except (KeyError, ValueError):
                continue
        valid = uniq
        step_best, step_vec = None, None
        n_new = 0
        if valid:
            embs = embed_smiles_batch(uniq, encoder, tokenizer)
            scores = [float(objective_fn(jnp.asarray(e))) for e in embs]
            for s, sc, e in zip(uniq, scores, embs):
                if s not in seen:
                    seen.add(s)
                    all_smiles.append(s)
                    all_scores.append(sc)
                    all_vectors.append(np.asarray(e))
                    n_new += 1
                if sc > best_score:
                    best_score, best_smiles = sc, s
            j = int(np.argmax(scores))
            step_best, step_vec = uniq[j], np.asarray(embs[j])

        # drop a repulsive hill at the visited location
        centers[n_hills % max_hills] = np.asarray(v)
        n_hills = min(n_hills + 1, max_hills)

        # snap the walker back onto the molecule manifold
        if cfg.re_embed and step_vec is not None:
            v = jnp.asarray(step_vec)

        history.append(
            {
                "step": step,
                "walker_norm": float(jnp.linalg.norm(v)),
                # NEWLY DISCOVERED molecules this step (seen-set
                # admissions) — a converged walker re-decoding known
                # molecules reads 0 here, not len(valid)
                "n_new": n_new,
                "n_valid": len(valid),
                "best_smiles": best_smiles,
                "best_score": best_score,
            }
        )

    return MetadynamicsResult(
        smiles=all_smiles,
        scores=all_scores,
        vectors=np.stack(all_vectors, 0) if all_vectors else np.zeros((0, dim)),
        history=history,
        best_smiles=best_smiles,
        best_score=best_score,
    )


def combined_objective(
    terms: Sequence[Callable[[jnp.ndarray], jnp.ndarray]],
    weights: Optional[Sequence[float]] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Weighted multi-parameter objective, e.g. potency + QED + logP
    terms from DUE regressors (the reference MPO: potency, solubility,
    druglikeness)."""
    weights = list(weights or [1.0] * len(terms))

    def fn(v):
        total = jnp.zeros(())
        for w, t in zip(weights, terms):
            total = total + w * t(v)
        return total

    return fn


def due_objective(due_model, scale: float = 1.0):
    """Wrap a trained DueModel's predictive mean as a differentiable
    objective term over a single embedding vector."""
    from coati_tpu.regression.due import fc_resnet_apply, svgp_predict_f

    params, cfg = due_model.params, due_model.config
    d_in = int(params.net.first_w.shape[0])

    def fn(v):
        if v.shape[-1] != d_in:
            raise ValueError(
                f"DUE property model expects {d_in}-d embeddings but the "
                f"COATI model produced {v.shape[-1]}-d — the published "
                f"due_*_barlow.pt artifacts were trained on barlow_closed's "
                f"256-d space; pair them with a matching model document"
            )
        feats, _ = fc_resnet_apply(
            params.net, v[None, :], cfg.coeff,
            spectral_first=cfg.spectral_first,
            spectral_residuals=cfg.spectral_residuals,
        )
        mean, _ = svgp_predict_f(
            params.gp, feats, jitter=cfg.jitter, kxx_jitter=cfg.kxx_jitter
        )
        return scale * mean[0]

    return fn
