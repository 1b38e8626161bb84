"""Token sampling primitives (top-k + inverse-temperature categorical).

The reference samples multinomial(softmax(topk_logits * inv_temp))
(coati/models/encoding/smiles_xformer.py:305-311). Masking logits outside
the top-k to -inf and drawing jax.random.categorical(inv_temp * logits)
yields the identical distribution, with fixed shapes (no gather of a
dynamic index set).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def top_k_filter(logits: jnp.ndarray, k: int, approx: bool = False) -> jnp.ndarray:
    """Mask everything below the per-row k-th largest logit to -inf.

    With approx=True the threshold comes from `lax.approx_max_k` — the
    TPU-native partial-reduction (~4-5x faster than the full-sort
    lax.top_k, which otherwise dominates decode time at SMILES vocab
    sizes). Its recall<1 can only LOWER the threshold, i.e. admit a few
    extra candidates beyond k — a negligible softening of top-k sampling.
    """
    if approx:
        kth = jax.lax.approx_max_k(logits, k)[0][..., -1:]
    else:
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
    neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
    return jnp.where(logits >= kth, logits, neg_inf)


def top_p_filter(
    logits: jnp.ndarray, top_p: float, k: int, approx: bool = False
) -> jnp.ndarray:  # noqa: D401 - approx kept for signature stability
    """Nucleus filter over ALREADY top-k-masked logits: mask tokens
    outside the smallest set whose cumulative probability reaches
    `top_p` (beyond-parity serving feature; the reference samples pure
    top-k). The highest-probability token always survives.

    The cumulative mass is computed over the k candidate VALUES only —
    everything else in the row is already -inf, so softmax over the k
    extracted values equals softmax over the full row. This requires an
    EXACT candidate set: `sample_top_k` switches the threshold filter
    to exact top-k whenever top_p is active (approx_max_k's recall<1
    admits extra sub-threshold candidates the value extraction here
    would miss, silently loosening the nucleus). top_p requests
    therefore pay the full-sort cost the approx path avoids."""
    del approx  # candidates must be exact; see docstring
    vals = jax.lax.top_k(logits, k)[0]
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # a candidate stays when the mass BEFORE it is still < top_p
    keep = (cum - probs) < top_p
    kept_vals = jnp.where(keep, vals, jnp.inf)
    thresh = jnp.min(kept_vals, axis=-1, keepdims=True)  # >=1 kept always
    neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
    return jnp.where(logits >= thresh, logits, neg_inf)


def sample_top_k(
    rng: jax.Array,
    logits: jnp.ndarray,
    k: int,
    inv_temp: float,
    approx: bool = False,
    top_p: float | None = None,
    recall_target: float = 0.95,
) -> jnp.ndarray:
    """Draw token ids (...,) from the top-k filtered distribution;
    optional nucleus (top-p) truncation applied within the top-k
    candidates AFTER temperature, mirroring common serving stacks.

    Exact path (approx=False, and always under nucleus): sampling runs
    in the (..., k) CANDIDATE space — the categorical draw happens over
    the k extracted values and the winner maps back through the
    candidate indices. Distribution-identical to masking the full row
    to -inf and drawing vocab-wide (the masked row's softmax support IS
    the candidate set; top_k_filter / top_p_filter keep that reference
    formulation for the tests). Tie semantics: lax.top_k keeps EXACTLY
    k candidates (boundary ties broken by lower index) — the same
    semantics as the reference's torch.topk + multinomial
    (smiles_xformer.py:305-311); a value-threshold mask would instead
    admit every token tied at the k-th value.

    Approx path: the k-th value from lax.approx_max_k (per-element
    recall `recall_target`; cost scales steeply with the target on TPU
    — B=1024 x 13,603: 1.06 ms at 0.95, 0.45 at 0.80, PERF.md decode
    decomposition) is used as a THRESHOLD over the full row, exactly
    the old top_k_filter formulation. The threshold set is a SUPERSET
    of the true top-k whenever approx_max_k under-reaches (a missed
    true member's logit necessarily clears the lowered threshold), so
    lowering recall_target can only ADMIT extra near-threshold
    candidates, never silence a true top-k token — the property that
    makes recall a safe throughput knob even on flat logits. The
    full-vocab categorical this requires measured ~free next to the
    reduction itself (1.068 vs 1.041 ms/step)."""
    nucleus = top_p is not None and top_p < 1.0
    lf = logits.astype(jnp.float32)
    if approx and not nucleus:
        kth = jax.lax.approx_max_k(lf, k, recall_target=recall_target)[0][
            ..., -1:
        ]
        masked = jnp.where(lf >= kth, lf, -jnp.inf) * inv_temp
        return jax.random.categorical(rng, masked, axis=-1)
    # nucleus needs the EXACT candidate set (see top_p_filter)
    vals, idxs = jax.lax.top_k(lf, k)
    scaled = vals * inv_temp  # sorted descending
    if nucleus:
        probs = jax.nn.softmax(scaled, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # a candidate stays when the mass BEFORE it is still < top_p;
        # the argmax always survives (its "before" mass is 0)
        keep = (cum - probs) < top_p
        scaled = jnp.where(keep, scaled, -jnp.inf)
    choice = jax.random.categorical(rng, scaled, axis=-1)
    return jnp.take_along_axis(idxs, choice[..., None], axis=-1)[..., 0]
