"""Distributed training tests on a virtual 8-device CPU mesh: the
all-gathered CLIP loss must equal the single-device global-batch loss,
the shard_map train step must run and reduce the loss, and cross-device
results must be independent of the mesh size."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coati_tpu.models import coati as F
from coati_tpu.models.coati import CoatiConfig, init_coati
from coati_tpu.parallel.mesh import make_mesh, replicate_params, shard_batch
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer
from coati_tpu.training.config import TrainConfig
from coati_tpu.training.train import (
    cosine_lr,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)

TOK = TrieTokenizer(n_seq=24, **get_vocab("mar_verysimple"))

CFG = CoatiConfig(
    n_layer_e3gnn=1,
    n_layer_xformer=2,
    n_hidden_xformer=32,
    n_hidden_e3nn=32,
    n_embd_common=32,
    n_head=2,
    n_seq=24,
    n_tok=TOK.n_token,
    norm_clips=True,
    token_mlp=True,
)


def synthetic_batch(batch=16, seed=0):
    rng = np.random.default_rng(seed)
    width = 16
    tokens = rng.integers(10, TOK.n_token, size=(batch, width)).astype(np.int32)
    tokens[:, 0] = TOK.smiles_token
    tokens[:, -2] = TOK.stop_token
    tokens[:, -1] = TOK.pad_token
    y_next = np.zeros_like(tokens)
    y_next[:, :-1] = tokens[:, 1:]
    y_next[y_next == TOK.pad_token] = -1
    atoms = rng.integers(1, 9, size=(batch, 8)).astype(np.int32)
    coords = rng.normal(size=(batch, 8, 3)).astype(np.float32)
    return {
        "raw_tokens": tokens,
        "tokens": tokens,
        "y_next": y_next,
        "atoms": atoms,
        "coords": coords,
    }


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_clip_loss_equals_global():
    """lax.all_gather CLIP loss over the mesh == single-device big-batch
    CLIP loss (the key distributed-correctness invariant)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    mesh = make_mesh()
    rng = np.random.default_rng(1)
    hs = rng.normal(size=(16, 8)).astype(np.float32)
    he = rng.normal(size=(16, 8)).astype(np.float32)
    bad = np.zeros((16,), bool)
    global_loss = float(F.clip_loss(jnp.asarray(hs), jnp.asarray(he), jnp.asarray(bad)))

    def shard_loss(hs, he, bad):
        all_hs = jax.lax.all_gather(hs, "data", axis=0, tiled=True)
        all_he = jax.lax.all_gather(he, "data", axis=0, tiled=True)
        all_bad = jax.lax.all_gather(bad, "data", axis=0, tiled=True)
        return F.clip_loss(all_hs, all_he, all_bad)[None]

    sharded = shard_map(
        shard_loss,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    losses = np.asarray(
        jax.jit(sharded)(jnp.asarray(hs), jnp.asarray(he), jnp.asarray(bad))
    )
    np.testing.assert_allclose(losses, global_loss, atol=1e-5)


@pytest.mark.parametrize("mode", ["pjit", "shard_map"])
def test_train_step_reduces_loss(mode):
    mesh = make_mesh()
    config = TrainConfig(lr=1e-3, clip_grad=10.0, weight_decay=0.1)
    optimizer = make_optimizer(config)
    params = replicate_params(mesh, init_coati(jax.random.PRNGKey(0), CFG))
    opt_state = optimizer.init(params)
    step = make_train_step(
        mesh, CFG, optimizer,
        stop_token=TOK.stop_token,
        unk_token=TOK.unk_token,
        p_clip_emb_smi=0.4,
        token_entropy_unit=float(np.log2(TOK.n_token)),
        do_clip=True,
        mode=mode,
    )
    batch = shard_batch(mesh, synthetic_batch())
    rng = jax.random.PRNGKey(2)
    losses = []
    for i in range(8):
        rng, sub = jax.random.split(rng)
        params, opt_state, metrics = step(params, opt_state, sub, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_pjit_and_shard_map_losses_agree():
    """Both distributed formulations must compute (numerically) the same
    initial loss on the same batch (equal per-shard token counts)."""
    mesh = make_mesh()
    config = TrainConfig()
    optimizer = make_optimizer(config)
    batch = shard_batch(mesh, synthetic_batch(seed=11))
    losses = {}
    for mode in ("pjit", "shard_map"):
        params = replicate_params(mesh, init_coati(jax.random.PRNGKey(7), CFG))
        opt_state = optimizer.init(params)
        step = make_train_step(
            mesh, CFG, optimizer,
            stop_token=TOK.stop_token,
            unk_token=TOK.unk_token,
            p_clip_emb_smi=0.0,  # deterministic clip-token choice
            token_entropy_unit=float(np.log2(TOK.n_token)),
            do_clip=True,
            mode=mode,
            is_training=False,
        )
        _, _, metrics = step(params, opt_state, jax.random.PRNGKey(9), batch)
        losses[mode] = float(metrics["loss"])
    assert losses["pjit"] == pytest.approx(losses["shard_map"], rel=1e-4)


def test_eval_step_does_not_touch_params():
    mesh = make_mesh()
    config = TrainConfig()
    optimizer = make_optimizer(config)
    params = replicate_params(mesh, init_coati(jax.random.PRNGKey(3), CFG))
    opt_state = optimizer.init(params)
    step = make_train_step(
        mesh, CFG, optimizer,
        stop_token=TOK.stop_token,
        unk_token=TOK.unk_token,
        p_clip_emb_smi=0.4,
        token_entropy_unit=float(np.log2(TOK.n_token)),
        do_clip=True,
        is_training=False,
    )
    batch = shard_batch(mesh, synthetic_batch(seed=4))
    before = jax.device_get(params.smiles_to_clip.w)
    p2, _, metrics = step(params, opt_state, jax.random.PRNGKey(4), batch)
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_array_equal(before, jax.device_get(params.smiles_to_clip.w))


def test_cosine_lr_schedule():
    config = TrainConfig(lr=4e-4, n_epochs=10)
    assert cosine_lr(config, 0) == pytest.approx(4e-4)
    assert cosine_lr(config, 10) == pytest.approx(0.0, abs=1e-12)
    assert cosine_lr(config, 5) == pytest.approx(2e-4)


def test_set_learning_rate_roundtrip():
    config = TrainConfig()
    optimizer = make_optimizer(config)
    params = init_coati(jax.random.PRNGKey(5), CFG)
    opt_state = optimizer.init(params)
    opt_state = set_learning_rate(opt_state, 1.23e-4)
    assert float(opt_state[1].hyperparams["learning_rate"]) == pytest.approx(1.23e-4)
