"""Fused autoregressive sampler with KV cache.

Replaces all five reference generation methods (generate_greedy /
generate_topk / generate_topk_batch / generate_topk_with_inj /
generate_top_k_with_inj_batch — coati/models/encoding/smiles_xformer.py:
114-351) with ONE jit-compiled loop:

  * prefix is forwarded once (`prefill`) into a KV cache; each new token
    costs O(T) attention against the cache instead of the reference's
    O(T^2 * layers) full-prefix re-run per token;
  * `lax.while_loop` gives data-dependent early exit the moment every row
    has emitted [STOP] (the common case stops at ~30-60 of 250 positions);
  * per-row semantics match the reference: stopped rows keep emitting
    [PAD]; rows that never stop get [STOP] forced at the final generated
    position (smiles_xformer.py:323-337); variable-length prefixes are
    honored by overriding sampled tokens with prefix tokens until each
    row's own prefix is exhausted (the `prefix_t > 0` overwrite trick at
    smiles_xformer.py:181-199);
  * ClipCap-style payload injection over [UNK] happens in the prefill.

Sampling distribution: multinomial(softmax(top-k logits * inv_temp)),
identical to the reference.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from coati_tpu.models.transformer import (
    TransformerConfig,
    TransformerParams,
    decode_step,
    make_empty_cache,
    prefill,
)
from coati_tpu.ops.sampling import sample_top_k


def auto_stage_widths(prefill_len: int, total_len: int) -> Optional[tuple]:
    """Default staged-decode schedule: ~6 stages in multiples of 16, so
    average cache-read width ≈ 7/12 of total. Same-process A/B at
    B=1024/seq 96 (PERF.md): 6 stages beat thirds (+4.5%) and beat a
    12-stage schedule (stage-transition copies start to dominate).
    Staging is semantically exact bar bf16 tie-flips (verified in fp32)."""
    if total_len < 64:
        return None
    step = max(16, ((total_len + 5) // 6 + 15) // 16 * 16)
    widths = [w for w in range(step, total_len, step) if w > prefill_len]
    widths.append(total_len)
    return tuple(widths) if len(widths) > 1 else None


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "prefill_len",
        "total_len",
        "stop_token",
        "pad_token",
        "k",
        "inject_token",
        "approx_top_k",
        "stage_widths",
        "top_p",
    ),
)
def generate_tokens(
    params: TransformerParams,
    cfg: TransformerConfig,
    rng: jax.Array,
    prefix_tokens: jnp.ndarray,  # (B, T_total) prefix-initialized, 0-padded
    prefix_len: jnp.ndarray,  # (B,) per-row prefix lengths
    *,
    prefill_len: int,  # static: min prefix length (prefill region)
    total_len: int,  # static: output width (<= cfg.n_seq)
    stop_token: int,
    pad_token: int = 0,
    k: int = 100,
    inv_temp: float = 2.0,
    inj_payload: Optional[jnp.ndarray] = None,  # (B, D)
    inject_token: Optional[int] = None,
    approx_top_k: bool = True,  # TPU-fast threshold (see ops/sampling.py)
    stage_widths: Optional[tuple] = None,  # staged cache growth, see below
    top_p: Optional[float] = None,  # nucleus truncation within the top-k
) -> jnp.ndarray:
    """Returns (B, total_len) int32 tokens including the prefix.

    stage_widths (e.g. (32, 64, 96)): decode is bandwidth-bound on
    reading the full cache width every step, so the loop can run in
    STAGES with a growing cache — early tokens attend against a narrow
    cache, which is then copied into a wider buffer between stages (all
    inside this one jitted program). Average traffic scales with the
    mean stage width instead of total_len. Widths must be increasing and
    end >= total_len; None = single stage at total_len.
    """
    b = prefix_tokens.shape[0]
    assert 1 <= prefill_len <= total_len <= cfg.n_seq
    tokens = prefix_tokens.astype(jnp.int32)

    if stage_widths is None:
        stage_widths = (total_len,)
    stage_widths = tuple(min(w, total_len) for w in stage_widths)
    assert stage_widths[-1] == total_len and all(
        stage_widths[i] < stage_widths[i + 1] for i in range(len(stage_widths) - 1)
    ), f"stage_widths {stage_widths} must increase and end at {total_len}"
    assert prefill_len <= stage_widths[0]

    # size the cache to the first stage width: every decode step reads
    # the full cache width, so this directly scales step time
    cache = make_empty_cache(cfg, b, width=stage_widths[0])
    hidden, cache = prefill(
        params,
        cfg,
        tokens[:, :prefill_len],
        injection=inj_payload,
        inject_token=inject_token if inj_payload is not None else None,
        cache=cache,
    )
    # distribution for the token at position `prefill_len`
    last_logits = hidden[:, -1] @ params.lm_head

    # a row is "stopped" once any written token equals [STOP]
    stopped0 = jnp.any(tokens[:, :prefill_len] == stop_token, axis=1)

    def body(state):
        pos, tokens, stopped, cache, last_logits = state
        step_rng = jax.random.fold_in(rng, pos)
        sampled = sample_top_k(
            step_rng, last_logits, k, inv_temp, approx=approx_top_k,
            top_p=top_p, recall_target=cfg.topk_recall,
        ).astype(jnp.int32)
        sampled = jnp.where(stopped, pad_token, sampled)
        # rows whose own prefix extends past `pos` keep their prefix token
        in_prefix = pos < prefix_len
        tok = jnp.where(in_prefix, tokens[:, pos], sampled)
        tokens = jax.lax.dynamic_update_slice(tokens, tok[:, None], (0, pos))
        stopped = jnp.logical_or(stopped, tok == stop_token)
        new_logits, cache = decode_step(params, cfg, tok, pos, cache)
        return pos + 1, tokens, stopped, cache, new_logits.astype(jnp.float32)

    def widen(cache, width):
        wide = make_empty_cache(cfg, b, width=width)
        data = jax.lax.dynamic_update_slice(
            wide.data, cache.data, (0, 0, 0, 0, 0, 0)
        )
        scale = wide.scale
        if scale is not None:
            scale = jax.lax.dynamic_update_slice(
                scale, cache.scale, (0, 0, 0, 0, 0)
            )
        return wide.replace(data=data, scale=scale)

    state = (
        jnp.asarray(prefill_len, jnp.int32),
        tokens,
        stopped0,
        cache,
        last_logits.astype(jnp.float32),
    )
    for i, width in enumerate(stage_widths):
        if i > 0:
            pos, tokens, stopped, cache, last_logits = state
            state = (pos, tokens, stopped, widen(cache, width), last_logits)

        def cond(state, width=width):
            pos, _, stopped, _, _ = state
            return jnp.logical_and(pos < width, ~jnp.all(stopped))

        state = jax.lax.while_loop(cond, body, state)
    pos, tokens, stopped, _, _ = state

    # force [STOP] at the last written position for rows that never stopped
    last = jnp.maximum(pos - 1, 0)
    current_last = jax.lax.dynamic_slice(tokens, (0, last), (b, 1))
    forced = jnp.where(stopped[:, None], current_last, stop_token)
    tokens = jax.lax.dynamic_update_slice(tokens, forced.astype(jnp.int32), (0, last))
    return tokens


def generate_with_injection_batch(
    params: TransformerParams,
    cfg: TransformerConfig,
    rng: jax.Array,
    prefix: list[int],
    inj_payload: jnp.ndarray,  # (B, D)
    *,
    stop_token: int,
    pad_token: int = 0,
    unk_token: int,
    k: int = 100,
    inv_temp: float = 2.0,
    total_len: Optional[int] = None,
) -> jnp.ndarray:
    """Common-prefix batched generation with payload injection — the
    reference generate_top_k_with_inj_batch (smiles_xformer.py:272-351)."""
    b = inj_payload.shape[0]
    total_len = total_len or cfg.n_seq
    p = len(prefix)
    tokens = jnp.zeros((b, total_len), jnp.int32)
    tokens = tokens.at[:, :p].set(jnp.asarray(prefix, jnp.int32))
    prefix_len = jnp.full((b,), p, jnp.int32)
    return generate_tokens(
        params,
        cfg,
        rng,
        tokens,
        prefix_len,
        prefill_len=p,
        total_len=total_len,
        stop_token=stop_token,
        pad_token=pad_token,
        k=k,
        inv_temp=inv_temp,
        inj_payload=inj_payload,
        inject_token=unk_token,
    )


def generate_prefix_batch(
    params: TransformerParams,
    cfg: TransformerConfig,
    rng: jax.Array,
    prefixes: list[list[int]],
    *,
    stop_token: int,
    pad_token: int = 0,
    k: int = 100,
    inv_temp: float = 2.0,
    total_len: Optional[int] = None,
) -> jnp.ndarray:
    """Variable-length token-space prefixes — the reference
    generate_topk_batch (smiles_xformer.py:157-200)."""
    import numpy as np

    b = len(prefixes)
    total_len = total_len or cfg.n_seq
    lens = [len(pf) for pf in prefixes]
    tokens_np = np.zeros((b, total_len), np.int32)
    for i, pf in enumerate(prefixes):
        tokens_np[i, : len(pf)] = pf
    tokens = jnp.asarray(tokens_np)
    return generate_tokens(
        params,
        cfg,
        rng,
        tokens,
        jnp.asarray(lens, jnp.int32),
        prefill_len=max(1, min(lens)),
        total_len=total_len,
        stop_token=stop_token,
        pad_token=pad_token,
        k=k,
        inv_temp=inv_temp,
    )
