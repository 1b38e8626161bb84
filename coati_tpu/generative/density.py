"""Embedding-space density estimation.

Fits a full-covariance multivariate normal to COATI embeddings by SGD on
batch log-prob with Cholesky parameterization and an entropy-based stop —
parity target coati/generative/coati_density.py:13-76, rebuilt as a
jitted optax loop. The fitted density is the sampling prior for virtual
screens (generation_examples notebook).
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from coati_tpu.chem.rdkit_support import canonicalize_or_self
from coati_tpu.common.util import batch_indexable
from coati_tpu.models.api import COATI
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer


@struct.dataclass
class MvnDensity:
    """Multivariate normal with scale_tril Cholesky factor."""

    mean: jnp.ndarray  # (D,)
    scale_tril: jnp.ndarray  # (D, D) lower triangular

    @property
    def dim(self) -> int:
        return self.mean.shape[-1]

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        diff = x - self.mean
        # solve L z = diff  ->  z = L^-1 diff; logdet = sum log diag
        z = jax.scipy.linalg.solve_triangular(self.scale_tril, diff.T, lower=True).T
        logdet = jnp.sum(jnp.log(jnp.abs(jnp.diag(self.scale_tril))))
        d = self.dim
        return (
            -0.5 * jnp.sum(jnp.square(z), axis=-1)
            - logdet
            - 0.5 * d * jnp.log(2.0 * jnp.pi)
        )

    def sample(self, rng: jax.Array, shape=()) -> jnp.ndarray:
        eps = jax.random.normal(rng, tuple(shape) + (self.dim,))
        return self.mean + eps @ self.scale_tril.T


def _build_density(params) -> MvnDensity:
    sq_diag, lower, mean = params["sq_diag"], params["lower"], params["mean"]
    d = sq_diag.shape[0]
    tril = jnp.diag(sq_diag * sq_diag)
    idx = jnp.tril_indices(d, k=-1)
    tril = tril.at[idx].set(lower)
    return MvnDensity(mean=mean, scale_tril=tril)


@jax.jit
def _density_step(params, opt_state, embeds):
    def loss_fn(p):
        return -jnp.mean(_build_density(p).log_prob(embeds))

    entropy, grads = jax.value_and_grad(loss_fn)(params)
    # mean is frozen, matching the reference optimizer param list
    grads["mean"] = jnp.zeros_like(grads["mean"])
    updates, opt_state = _SGD.update(grads, opt_state)
    return optax.apply_updates(params, updates), opt_state, entropy


_SGD = optax.sgd(5e-3)


def estimate_density_batchwise(
    iterable: Iterable[str],
    encoder: COATI,
    tokenizer: TrieTokenizer,
    batch_size: int = 1024,
    epochs: int = 10,
    entropy_limit: float = -100.0,
    verbose: bool = True,
) -> Optional[MvnDensity]:
    """SGD-fit an MVN to the embeddings of `iterable` SMILES. Returns the
    density once mean negative log-prob crosses entropy_limit, else None
    (reference semantics)."""
    d = encoder.embed_dim
    params = {
        "mean": jnp.zeros((d,), jnp.float32),
        "sq_diag": 0.5 * jnp.ones((d,), jnp.float32),
        "lower": jnp.zeros((d * (d - 1) // 2,), jnp.float32),
    }
    opt_state = _SGD.init(params)

    for _ in range(epochs):
        for batch in batch_indexable(list(iterable), batch_size):
            tokens = []
            for s in batch:
                try:
                    cs = canonicalize_or_self(s)
                    tokens.append(
                        tokenizer.tokenize_text("[SMILES]" + cs + "[STOP]", pad=True)
                    )
                except (KeyError, ValueError):
                    continue
            if not tokens:
                continue
            embeds = encoder.encode_tokens(np.asarray(tokens, np.int32), tokenizer)
            prev_params = params
            params, opt_state, entropy = _density_step(
                params, opt_state, jnp.asarray(embeds, jnp.float32)
            )
            if verbose:
                print(f"entropy: {float(entropy):.4f}")
            if float(entropy) < entropy_limit:
                # the entropy was measured on the PRE-step params; the
                # reference returns that distribution, not the one the
                # step just produced (coati_density.py:69-76)
                return _build_density(prev_params)
    return None


def fit_density_closed_form(embeds: np.ndarray, jitter: float = 1e-4) -> MvnDensity:
    """TPU-friendly extension: exact MLE fit (mean + Cholesky of the
    empirical covariance) — what the SGD loop converges to, in one step."""
    x = np.asarray(embeds, np.float64)
    mean = x.mean(0)
    cov = np.cov(x.T) + jitter * np.eye(x.shape[1])
    tril = np.linalg.cholesky(cov)
    return MvnDensity(
        mean=jnp.asarray(mean, jnp.float32), scale_tril=jnp.asarray(tril, jnp.float32)
    )
