"""Sequence-parallel / ring-attention tests (parallel/sp.py,
beyond-parity: the reference has no sequence parallelism, SURVEY §5.7).

On the 8-device CPU mesh: the ring accumulator is numerically equal to
dense causal attention, the full SP transformer forward matches the
single-device forward (with and without soft-token injection), gradients
flow through the ring, and SP encode reproduces the stop-token gather."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from coati_tpu.models import transformer as T
from coati_tpu.models.transformer import TransformerConfig, init_transformer
from coati_tpu.ops.attention import causal_attention
from coati_tpu.parallel.sp import (
    make_sp_encode,
    make_sp_forward_logits,
    make_sp_mesh,
    ring_causal_attention,
)


def small_cfg():
    return TransformerConfig(
        n_layer=3, n_embd=32, n_head=2, n_seq=32, n_tok=50, biases=True
    )


@pytest.mark.parametrize("seq_shards", [2, 4, 8])
def test_ring_attention_matches_dense(seq_shards):
    b, t, h, dh = 2, 32, 2, 8
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(kk, (b, t, h, dh), jnp.float32)
        for kk in jax.random.split(key, 3)
    )
    want = causal_attention(q, k, v)

    mesh = make_sp_mesh(seq_shards, seq=seq_shards)

    def fn(q, k, v):
        return ring_causal_attention(q, k, v, seq_shards)

    got = jax.jit(
        shard_map(
            fn, mesh=mesh,
            in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
            out_specs=P(None, "seq"),
            check_vma=False,
        )
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_ring_attention_grads_match_dense():
    b, t, h, dh, s = 2, 16, 2, 8, 4
    key = jax.random.PRNGKey(1)
    q, k, v = (
        jax.random.normal(kk, (b, t, h, dh), jnp.float32)
        for kk in jax.random.split(key, 3)
    )
    want = jax.grad(lambda q, k, v: jnp.sum(causal_attention(q, k, v) ** 2), (0, 1, 2))(
        q, k, v
    )

    mesh = make_sp_mesh(s, seq=s)

    def local_loss(q, k, v):
        # per-device local loss, no psum: the total loss is the implicit
        # sum of per-device seeds, and the ppermute transpose routes the
        # cross-device k/v cotangents back around the ring (psum'ing the
        # scalar under check_vma=False would S-fold the grads — its
        # transpose is psum)
        out = ring_causal_attention(q, k, v, s)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grad_fn = shard_map(
        jax.grad(local_loss, (0, 1, 2)), mesh=mesh,
        in_specs=(P(None, "seq"),) * 3,
        out_specs=(P(None, "seq"),) * 3,
        check_vma=False,
    )
    got = jax.jit(grad_fn)(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=5e-5)


@pytest.mark.parametrize("seq_shards", [2, 4])
def test_sp_forward_matches_single_device(seq_shards):
    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(0, cfg.n_tok, size=(8, cfg.n_seq)).astype(np.int32)
    )
    want = T.forward_logits(params, cfg, tokens)

    mesh = make_sp_mesh(8, seq=seq_shards)  # data x seq
    fwd = make_sp_forward_logits(mesh, cfg)
    got = fwd(params, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sp_forward_with_injection():
    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(
        rng.integers(0, cfg.n_tok, size=(8, cfg.n_seq)).astype(np.int32)
    )
    inject_token = 5
    injection = jax.random.normal(jax.random.PRNGKey(2), (8, cfg.n_embd))
    want = T.forward_logits(params, cfg, tokens, injection, inject_token)

    mesh = make_sp_mesh(8, seq=4)
    fwd = make_sp_forward_logits(mesh, cfg, inject_token=inject_token)
    got = fwd(params, tokens, injection)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sp_encode_matches_single_device():
    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    stop = 3
    rng = np.random.default_rng(3)
    tokens = rng.integers(4, cfg.n_tok, size=(8, cfg.n_seq)).astype(np.int32)
    # exactly one [STOP] per row, in assorted shards
    for i in range(8):
        tokens[i, rng.integers(0, cfg.n_seq)] = stop
    tokens = jnp.asarray(tokens)
    want = T.encode(params, cfg, tokens, stop)

    mesh = make_sp_mesh(8, seq=4)
    enc = make_sp_encode(mesh, cfg, stop)
    got = enc(params, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sp_encode_first_stop_and_no_stop_rows():
    """Rows with several [STOP]s must gather the FIRST (dense argmax
    semantics); rows with none fall back to position 0 — both matching
    stop_token_hidden exactly."""
    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(1), cfg)
    stop = 3
    rng = np.random.default_rng(5)
    tokens = rng.integers(4, cfg.n_tok, size=(8, cfg.n_seq)).astype(np.int32)
    tokens[0, [5, 20, 29]] = stop  # stops in multiple shards
    tokens[1, [12, 13]] = stop  # adjacent stops, same shard
    tokens[2, 31] = stop  # last position
    tokens[3, 0] = stop  # first position
    # rows 4..7: no stop at all -> dense falls back to position 0
    tokens = jnp.asarray(tokens)
    hidden = T.forward_hidden(params, cfg, tokens)
    want = T.stop_token_hidden(hidden, tokens, stop)

    mesh = make_sp_mesh(8, seq=4)
    got = make_sp_encode(mesh, cfg, stop)(params, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sp_train_step_matches_single_device():
    """One SP AR train step (grads through the ring, psum'd, optimizer
    applied) equals the single-device step: same loss, same updated
    params."""
    import optax

    from coati_tpu.parallel.sp import make_sp_train_step

    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    tokens = rng.integers(0, cfg.n_tok, size=(8, cfg.n_seq)).astype(np.int32)
    y_next = np.zeros_like(tokens)
    y_next[:, :-1] = tokens[:, 1:]
    y_next[rng.random(y_next.shape) < 0.2] = -1  # masked positions
    tokens, y_next = jnp.asarray(tokens), jnp.asarray(y_next)

    def dense_loss(p):
        logits = T.forward_logits(p, cfg, tokens)
        mask = (y_next >= 0).astype(jnp.float32)
        labels = jnp.where(y_next >= 0, y_next, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return -jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    opt = optax.adamw(1e-3)
    want_loss, grads = jax.value_and_grad(dense_loss)(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    want_params = optax.apply_updates(params, updates)

    mesh = make_sp_mesh(8, seq=4)
    step = make_sp_train_step(mesh, cfg, opt)
    got_params, _, got_loss = step(params, opt.init(params), tokens, y_next)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    for g, w in zip(
        jax.tree_util.tree_leaves(got_params),
        jax.tree_util.tree_leaves(want_params),
    ):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=5e-5)


def test_sp_rejects_overlong_sequences():
    cfg = small_cfg()  # n_seq = 32
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    mesh = make_sp_mesh(8, seq=4)
    fwd = make_sp_forward_logits(mesh, cfg)
    tokens = jnp.zeros((4, 64), jnp.int32)  # divisible by 4 but > n_seq
    with pytest.raises(AssertionError, match="exceeds cfg.n_seq"):
        fwd(params, tokens)
