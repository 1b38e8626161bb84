"""Pipeline-parallelism tests (parallel/pp.py, beyond-parity: the
reference is DDP-only, SURVEY §2.2).

On the 8-device CPU mesh: the GPipe schedule's forward is token-exact
vs the single-device transformer, injection rides stage 0, and the
DP x PP train step reproduces the single-device AdamW step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from coati_tpu.models import transformer as T
from coati_tpu.models.transformer import TransformerConfig, init_transformer
from coati_tpu.parallel.pp import (
    make_pp_ar_train_step,
    make_pp_forward_logits,
    make_pp_mesh,
    pp_param_specs,
    shard_params_pp,
)


def small_cfg(n_layer=8):
    return TransformerConfig(
        n_layer=n_layer, n_embd=32, n_head=2, n_seq=16, n_tok=50, biases=True
    )


def batch_tokens(cfg, batch=16, seed=0):
    rng = np.random.default_rng(seed)
    tokens = rng.integers(0, cfg.n_tok, size=(batch, cfg.n_seq)).astype(np.int32)
    y_next = np.zeros_like(tokens)
    y_next[:, :-1] = tokens[:, 1:]
    y_next[:, -1] = -1
    y_next[rng.random(y_next.shape) < 0.1] = -1  # some masked labels
    return jnp.asarray(tokens), jnp.asarray(y_next)


def test_pp_param_specs():
    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    specs = pp_param_specs(params)
    assert specs.blocks.w_attn == P("pipe")
    assert specs.blocks.ln1_scale == P("pipe")
    assert specs.tok_emb == P()
    assert specs.lm_head == P()
    assert specs.lnf_scale == P()


@pytest.mark.parametrize("pipe,micro", [(4, 4), (8, 2), (2, 1)])
def test_pp_forward_matches_single_device(pipe, micro):
    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    tokens, _ = batch_tokens(cfg)
    want = T.forward_logits(params, cfg, tokens)

    mesh = make_pp_mesh(8, pipe=pipe)
    fwd = make_pp_forward_logits(mesh, cfg, params, n_microbatches=micro)
    got = fwd(shard_params_pp(mesh, params), tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pp_forward_with_injection():
    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    tokens, _ = batch_tokens(cfg)
    inject_token = 7
    injection = jax.random.normal(jax.random.PRNGKey(3), (tokens.shape[0], cfg.n_embd))
    want = T.forward_logits(params, cfg, tokens, injection, inject_token)

    mesh = make_pp_mesh(8, pipe=4)
    fwd = make_pp_forward_logits(
        mesh, cfg, params, n_microbatches=2, inject_token=inject_token
    )
    got = fwd(shard_params_pp(mesh, params), tokens, injection)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def _single_device_step(cfg, params, optimizer, tokens, y_next):
    from coati_tpu.models.coati import cross_entropy_ignore

    def loss_fn(p):
        logits = T.forward_logits(p, cfg, tokens)
        return cross_entropy_ignore(
            logits.reshape(-1, cfg.n_tok), y_next.reshape(-1)
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    opt_state = optimizer.init(params)
    updates, _ = optimizer.update(grads, opt_state, params)
    return float(loss), optax.apply_updates(params, updates)


def test_pp_train_step_matches_single_device():
    """One DP x PP AdamW step == the single-device step (loss + params)."""
    cfg = small_cfg()
    params0 = jax.device_get(init_transformer(jax.random.PRNGKey(0), cfg))
    tokens, y_next = batch_tokens(cfg)
    optimizer = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(1e-3, b1=0.9, b2=0.99, weight_decay=0.1),
    )
    loss_ref, params_ref = _single_device_step(
        cfg, params0, optimizer, tokens, y_next
    )

    mesh = make_pp_mesh(8, pipe=4)  # data=2 x pipe=4
    params = shard_params_pp(mesh, params0)
    opt_state = optimizer.init(params)
    step = make_pp_ar_train_step(
        mesh, cfg, params, optimizer, n_microbatches=2
    )
    from coati_tpu.parallel.mesh import batch_sharding

    batch = {
        "tokens": jax.device_put(tokens, batch_sharding(mesh)),
        "y_next": jax.device_put(y_next, batch_sharding(mesh)),
    }
    params, opt_state, metrics = step(params, opt_state, batch)

    assert float(metrics["loss"]) == pytest.approx(loss_ref, rel=2e-5)
    # atol 1e-3: a fresh Adam step is ~lr*sign(g), so f32 summation-order
    # noise in near-zero grads can flip isolated elements by up to 2*lr
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(params_ref)),
        jax.tree_util.tree_leaves(jax.device_get(params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_pp_pure_pipe_mesh():
    """pipe=8 (no data axis) still reproduces the single-device forward."""
    cfg = small_cfg(n_layer=8)
    params = init_transformer(jax.random.PRNGKey(1), cfg)
    tokens, _ = batch_tokens(cfg, batch=8, seed=2)
    want = T.forward_logits(params, cfg, tokens)
    mesh = make_pp_mesh(8, pipe=8)
    fwd = make_pp_forward_logits(mesh, cfg, params, n_microbatches=4)
    got = fwd(shard_params_pp(mesh, params), tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pp_composite_coati_step_matches_single_device():
    """The COMPOSITE COATI train step (EGNN + both trunk passes +
    projections + AR and global CLIP losses, clip_e2e.py:772-845) under
    DP x PP reproduces the single-device pjit step: same metrics, same
    updated parameters. This is the flagship model actually training
    under pipeline parallelism, not just the bare trunk."""
    from coati_tpu.models.coati import init_coati
    from coati_tpu.parallel.mesh import batch_sharding
    from coati_tpu.parallel.pp import (
        make_pp_coati_train_step,
        shard_coati_params_pp,
    )
    from coati_tpu.training.train import make_train_step

    from .multinode_common import CFG, TOK, synthetic_batch
    from jax.sharding import Mesh, NamedSharding

    cfg = CFG  # n_layer_xformer=2 -> pipe=2 stages of 1 layer
    batch_np = synthetic_batch(batch=16)
    optimizer = optax.adam(1e-3)
    unit = float(np.log2(cfg.n_tok))
    rng = jax.random.PRNGKey(7)

    # single-device pjit reference (global batch on one device)
    one_mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))
    params0 = jax.device_get(init_coati(jax.random.PRNGKey(0), cfg))
    ref_step = make_train_step(
        one_mesh, cfg, optimizer,
        stop_token=TOK.stop_token, unk_token=TOK.unk_token,
        p_clip_emb_smi=0.0, token_entropy_unit=unit, do_clip=True,
        mode="pjit",
    )
    with jax.default_device(jax.devices()[0]):
        ref_params, _, ref_metrics = ref_step(
            jax.device_get(params0),
            optimizer.init(jax.device_get(params0)),
            rng,
            {k: jnp.asarray(v) for k, v in batch_np.items()},
        )

    # DP(2) x PP(2)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("data", "pipe"))
    params = shard_coati_params_pp(mesh, params0)
    opt_state = optimizer.init(params)
    step = make_pp_coati_train_step(
        mesh, cfg, params, optimizer,
        stop_token=TOK.stop_token, unk_token=TOK.unk_token,
        p_clip_emb_smi=0.0, token_entropy_unit=unit, n_microbatches=2,
    )
    batch = {
        k: jax.device_put(jnp.asarray(v), batch_sharding(mesh))
        for k, v in batch_np.items()
    }
    params, opt_state, metrics = step(params, opt_state, rng, batch)

    for key in ("ar_loss", "clip_loss", "loss"):
        assert float(metrics[key]) == pytest.approx(
            float(ref_metrics[key]), rel=3e-4, abs=3e-5
        ), key
    # Compare the UPDATE VECTORS, not the parameters: adam's first step
    # is ~±lr (1e-3) per element, so a parameter-level atol above lr
    # would pass even with a dropped gradient. Delta-level atol 2e-4
    # distinguishes a missing/mis-scaled/mis-signed update (diff ~1e-3
    # or ~2e-3) from f32 psum-order noise, which only reaches that size
    # through adam's g/(sqrt(v)+eps) amplification on near-zero grads.
    p0_leaves = jax.tree_util.tree_leaves(params0)
    moved = 0
    for (pa, a), b, p0 in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(ref_params)),
        jax.tree_util.tree_leaves(jax.device_get(params)),
        p0_leaves,
    ):
        da = np.asarray(a) - np.asarray(p0)
        db = np.asarray(b) - np.asarray(p0)
        np.testing.assert_allclose(
            da, db, atol=2e-4, err_msg=jax.tree_util.keystr(pa)
        )
        moved += int(np.sum(np.abs(da) > 5e-4))
    # power check: the comparison must be over real updates, not zeros
    assert moved > 1000, f"only {moved} parameters moved — test has no power"
