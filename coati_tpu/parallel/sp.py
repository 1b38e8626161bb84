"""Sequence parallelism: ring attention over a `seq` mesh axis
(BEYOND-PARITY).

The reference caps sequences at 250 tokens and has no sequence/context
parallelism anywhere (SURVEY §5.7 — dense causal attention with a tril
mask, basic_transformer.py:117-146). This module provides the seam for
long-context recipes the TPU-native way: activations sharded along the
SEQUENCE axis across a `seq` mesh axis, with attention computed by the
ring algorithm — K/V blocks rotate around the ring via nearest-neighbor
`ppermute` while each device streams them into a numerically-stable
flash-style accumulator (running max / rescaled partial sums). Per-step
traffic is one (B, T/S, H, Dh) block over ICI, fully overlappable with
the block matmuls; HBM never holds more than one remote block.

Causality across blocks: device s owns query block s (positions
[s*T/S, (s+1)*T/S)); a K/V block j contributes iff j < s (fully
visible), j == s (intra-block tril), and is skipped (masked) when j > s.

Everything outside attention (LN, MLP, embedding, logits) is elementwise
along the sequence, so it runs on the local shard unchanged — the
module reuses the exact block math of models/transformer.py and matches
its output to float tolerance (see tests/test_sequence_parallel.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from coati_tpu.models.transformer import (
    TransformerConfig,
    TransformerParams,
    embed_tokens,
    layer_norm,
)
from coati_tpu.ops.layers import cast_floats, gelu_tanh, linear
from coati_tpu.ops.rotary import apply_rotary, rotary_tables

_NEG_INF = -1e30


def make_sp_mesh(n_devices: Optional[int] = None, seq: int = 2) -> Mesh:
    """(data = n/seq) x (seq) mesh; the seq axis should map to
    neighboring ICI links (the ring permute is nearest-neighbor)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % seq == 0, (n, seq)
    return Mesh(np.asarray(devices).reshape(n // seq, seq), ("data", "seq"))


def ring_causal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_shards: int,
    seq_axis: str = "seq",
    precision=None,
) -> jnp.ndarray:
    """Causal attention with the sequence sharded over `seq_axis`.

    q, k, v: (B, T_local, H, Dh) — this device's sequence block, rotary
    already applied at absolute positions. Returns (B, T_local, H, Dh),
    equal to the corresponding slice of `causal_attention` on the full
    sequence (ops/attention.py:29 numerics: 1/sqrt(Dh) scale, float32
    softmax, -1e30 mask).
    """
    b, t, h, dh = q.shape
    s = jax.lax.axis_index(seq_axis)
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    tril = jnp.tril(jnp.ones((t, t), dtype=bool))

    def body(carry, r):
        k_cur, v_cur, m, l, o = carry
        j = (s - r) % n_shards  # block index currently held
        scores = jnp.einsum("bthd,bshd->bhts", q, k_cur, precision=precision)
        scores = scores.astype(jnp.float32) * scale
        # causal block mask
        block_mask = jnp.where(
            j < s, jnp.ones((t, t), bool), jnp.where(j == s, tril, False)
        )
        scores = jnp.where(block_mask[None, None], scores, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        corr = jnp.exp(m - m_new)
        # re-mask after exp: when m_new is still the -1e30 floor (a fully
        # masked j > s block before any real one), exp(0) would leak 1s
        p = jnp.where(
            block_mask[None, None], jnp.exp(scores - m_new[..., None]), 0.0
        )
        l = l * corr + jnp.sum(p, axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bhts,bshd->bhtd", p, v_cur.astype(jnp.float32), precision=precision
        )
        m = m_new
        # rotate K/V one device forward: after r rotations this device
        # holds block (s - r) mod S
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        k_cur = jax.lax.ppermute(k_cur, seq_axis, perm)
        v_cur = jax.lax.ppermute(v_cur, seq_axis, perm)
        return (k_cur, v_cur, m, l, o), None

    m0 = jnp.full((b, h, t), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, t), jnp.float32)
    o0 = jnp.zeros((b, h, t, dh), jnp.float32)
    (_, _, _, l, o), _ = jax.lax.scan(
        body, (k, v, m0, l0, o0), jnp.arange(n_shards)
    )
    out = o / jnp.maximum(l, 1e-30)[..., None]  # (B, H, T, Dh)
    return out.transpose(0, 2, 1, 3).astype(v.dtype)  # (B, T, H, Dh)


def _sp_block(x, blk, cfg: TransformerConfig, cos_loc, sin_loc, n_shards, seq_axis):
    """One transformer block over a local sequence shard — the math of
    models/transformer._block_full with ring attention substituted."""
    b, t, d = x.shape
    h, dh = cfg.n_head, cfg.head_dim
    prec = cfg.mm_precision

    y = layer_norm(x, blk.ln1_scale, blk.ln1_bias)
    qkv = linear(y, blk.w_attn, blk.b_attn, prec)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = apply_rotary(q.reshape(b, t, h, dh), cos_loc[:, None, :], sin_loc[:, None, :])
    k = apply_rotary(k.reshape(b, t, h, dh), cos_loc[:, None, :], sin_loc[:, None, :])
    v = v.reshape(b, t, h, dh)
    attn = ring_causal_attention(q, k, v, n_shards, seq_axis, prec).reshape(b, t, d)
    x = x + linear(attn, blk.w_proj, blk.b_proj, prec)

    y = layer_norm(x, blk.ln2_scale, blk.ln2_bias)
    y = gelu_tanh(linear(y, blk.w_fc, blk.b_fc, prec))
    return x + linear(y, blk.w_out, blk.b_out, prec)


def _sp_hidden(
    params: TransformerParams,
    cfg: TransformerConfig,
    tokens: jnp.ndarray,
    n_shards: int,
    injection: Optional[jnp.ndarray],
    inject_token: Optional[int],
    seq_axis: str,
) -> jnp.ndarray:
    """Local-shard forward: tokens (B, T_local) -> hidden (B, T_local, D)
    after the final LN. Rotary uses absolute positions via the shard
    offset."""
    b, t = tokens.shape
    params = cast_floats(params, cfg.compute_dtype)
    cos, sin = rotary_tables(cfg.n_seq, cfg.head_dim)
    off = jax.lax.axis_index(seq_axis) * t
    cos_loc = jax.lax.dynamic_slice_in_dim(cos, off, t, 0).astype(cfg.compute_dtype)
    sin_loc = jax.lax.dynamic_slice_in_dim(sin, off, t, 0).astype(cfg.compute_dtype)

    x = embed_tokens(params, cfg, tokens, injection, inject_token)

    def body(x, blk):
        return _sp_block(x, blk, cfg, cos_loc, sin_loc, n_shards, seq_axis), None

    if cfg.remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params.blocks)
    return layer_norm(x, params.lnf_scale, params.lnf_bias)


def make_sp_forward_logits(
    mesh: Mesh,
    cfg: TransformerConfig,
    inject_token: Optional[int] = None,
    data_axis: str = "data",
    seq_axis: str = "seq",
):
    """Build a jitted sequence-parallel forward: (params, tokens
    [, injection]) -> logits (B, T, V), tokens sharded (data, seq),
    numerically equal to transformer.forward_logits."""
    n_shards = mesh.shape[seq_axis]
    has_data = data_axis in mesh.axis_names and mesh.shape[data_axis] > 1
    d_ax = data_axis if has_data else None
    tok_spec = P(d_ax, seq_axis)
    inj_spec = P(d_ax)
    with_injection = inject_token is not None

    def fn(params, tokens, injection=None):
        hidden = _sp_hidden(
            params, cfg, tokens, n_shards, injection, inject_token, seq_axis
        )
        return linear(hidden, params.lm_head, None, cfg.mm_precision)

    if with_injection:
        mapped = shard_map(
            fn, mesh=mesh,
            in_specs=(P(), tok_spec, inj_spec),
            out_specs=P(d_ax, seq_axis),
            check_vma=False,
        )
    else:
        mapped = shard_map(
            lambda p, tok: fn(p, tok), mesh=mesh,
            in_specs=(P(), tok_spec),
            out_specs=P(d_ax, seq_axis),
            check_vma=False,
        )
    jitted = jax.jit(mapped)
    return _check_seq(jitted, cfg, n_shards)


def _check_seq(jitted, cfg: TransformerConfig, n_shards: int):
    """Guard the sharded call: the total length must split evenly over
    the seq axis AND fit the rotary tables — dynamic_slice would CLAMP
    an out-of-range shard offset and silently reuse the last cos/sin
    window (the dense path fails loudly instead)."""

    def wrapped(params, tokens, *rest):
        t = tokens.shape[1]
        assert t % n_shards == 0, (
            f"sequence length {t} must divide evenly into {n_shards} seq shards"
        )
        assert t <= cfg.n_seq, (
            f"sequence length {t} exceeds cfg.n_seq={cfg.n_seq}; rotary "
            "tables only cover n_seq positions"
        )
        return jitted(params, tokens, *rest)

    return wrapped


def make_sp_train_step(
    mesh: Mesh,
    cfg: TransformerConfig,
    optimizer,
    data_axis: str = "data",
    seq_axis: str = "seq",
):
    """Build a jitted sequence-parallel AR training step.

    (params, opt_state, tokens, y_next) -> (params, opt_state, loss):
    one optimizer step on the masked next-token cross-entropy
    (ignore_index -1, the reference loss at
    coati/training/train_coati.py:260-265), with activations sharded
    along the sequence axis and attention computed by the ring.

    Gradient flow: the local loss is the UNNORMALIZED per-shard CE sum
    (no psum inside — the ppermute transpose routes cross-shard K/V
    cotangents back around the ring, exactly as in
    tests/test_sequence_parallel.py); grads and the loss/count sums are
    then psum'd across the mesh and normalized by the global valid-token
    count, so the step is numerically the single-device step.
    """
    import optax

    n_shards = mesh.shape[seq_axis]
    has_data = data_axis in mesh.axis_names and mesh.shape[data_axis] > 1
    d_ax = data_axis if has_data else None
    axes = (seq_axis,) if d_ax is None else (d_ax, seq_axis)

    def local_loss_sum(params, tokens, y_next):
        hidden = _sp_hidden(params, cfg, tokens, n_shards, None, None, seq_axis)
        logits = linear(hidden, params.lm_head, None, cfg.mm_precision)
        mask = (y_next >= 0).astype(jnp.float32)
        labels = jnp.where(y_next >= 0, y_next, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return -jnp.sum(ll * mask), jnp.sum(mask)

    def step(params, opt_state, tokens, y_next):
        (loss_sum, count), grads = jax.value_and_grad(
            local_loss_sum, has_aux=True
        )(params, tokens, y_next)
        grads = jax.lax.psum(grads, axes)
        loss_sum = jax.lax.psum(loss_sum, axes)
        count = jnp.maximum(jax.lax.psum(count, axes), 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / count, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_sum / count

    mapped = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(d_ax, seq_axis), P(d_ax, seq_axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(mapped, donate_argnums=(0, 1))

    def wrapped(params, opt_state, tokens, y_next):
        t = tokens.shape[1]
        assert t % n_shards == 0, (
            f"sequence length {t} must divide evenly into {n_shards} seq shards"
        )
        assert t <= cfg.n_seq, (
            f"sequence length {t} exceeds cfg.n_seq={cfg.n_seq}"
        )
        return jitted(params, opt_state, tokens, y_next)

    return wrapped


def make_sp_encode(
    mesh: Mesh,
    cfg: TransformerConfig,
    stop_token: int,
    data_axis: str = "data",
    seq_axis: str = "seq",
):
    """Build a jitted sequence-parallel `encode`: (params, tokens) ->
    (B, D) hidden at the FIRST [STOP] position per row, matching
    transformer.stop_token_hidden exactly: a cross-shard pmin finds the
    globally-first stop (rows with several stops take the first, rows
    with none fall back to position 0 — argmax-over-all-false
    semantics), then the owning shard contributes via a one-hot
    contraction and the psum assembles the row."""
    n_shards = mesh.shape[seq_axis]
    has_data = data_axis in mesh.axis_names and mesh.shape[data_axis] > 1
    d_ax = data_axis if has_data else None
    big = np.int32(2**30)

    def fn(params, tokens):
        hidden = _sp_hidden(params, cfg, tokens, n_shards, None, None, seq_axis)
        t = tokens.shape[1]
        off = jax.lax.axis_index(seq_axis) * t
        is_stop = tokens == stop_token
        has = jnp.any(is_stop, axis=1)
        local_first = jnp.argmax(is_stop, axis=1)
        global_pos = jnp.where(has, off + local_first, big)
        global_first = jax.lax.pmin(global_pos, seq_axis)
        global_first = jnp.where(global_first >= big, 0, global_first)
        local_idx = global_first - off
        in_range = (local_idx >= 0) & (local_idx < t)
        onehot = jax.nn.one_hot(
            jnp.clip(local_idx, 0, t - 1), t, dtype=hidden.dtype
        ) * in_range[:, None].astype(hidden.dtype)
        local = jnp.einsum("bt,btd->bd", onehot, hidden)
        return jax.lax.psum(local, seq_axis)

    mapped = shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(d_ax, seq_axis)),
        out_specs=P(d_ax),
        check_vma=False,
    )
    return _check_seq(jax.jit(mapped), cfg, n_shards)
