"""Tensor-parallel sharding tests (parallel/tp.py, beyond-parity: the
reference is DP-only, SURVEY §2.2).

On the 8-device CPU mesh: Megatron-style weight PartitionSpecs, GSPMD
numerics (DPxTP train step == single-device step), divisibility
fallback, and the trainer integration.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from coati_tpu.models.coati import init_coati
from coati_tpu.parallel.mesh import make_mesh, shard_batch
from coati_tpu.parallel.tp import (
    commit_opt_state,
    make_tp_mesh,
    param_specs,
    shard_params,
)
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer
from coati_tpu.training.config import TrainConfig

from .parallel_helpers import synthetic_batch, tiny_cfg
from coati_tpu.training.train import make_optimizer, make_train_step


@pytest.fixture(scope="module")
def tok():
    return TrieTokenizer(n_seq=32, **get_vocab("mar_verysimple"))


def test_param_specs_rules(tok):
    cfg = tiny_cfg(tok)
    params = init_coati(jax.random.PRNGKey(0), cfg)
    specs = param_specs(params, tp_size=2)
    assert specs.xformer.blocks.w_fc == P(None, None, "model")
    assert specs.xformer.blocks.w_out == P(None, "model", None)
    assert specs.xformer.blocks.w_attn == P(None, None, "model")
    assert specs.xformer.blocks.w_proj == P(None, "model", None)
    assert specs.xformer.blocks.ln1_scale == P()
    assert specs.xformer.lnf_scale == P()
    # vocab 177 is odd -> embedding/lm_head fall back to replicated
    assert tok.n_token % 2 == 1
    assert specs.xformer.tok_emb == P()
    assert specs.xformer.lm_head == P()
    # EGNN / projection heads replicate
    assert all(
        s == P() for s in jax.tree_util.tree_leaves(specs.point_encoder)
    )


def test_param_specs_divisible_vocab(tok):
    cfg = tiny_cfg(tok, n_tok=tok.n_token + 1)  # even vocab
    params = init_coati(jax.random.PRNGKey(0), cfg)
    specs = param_specs(params, tp_size=2)
    assert specs.xformer.tok_emb == P("model", None)
    assert specs.xformer.lm_head == P(None, "model")


def test_tp_step_matches_single_device(tok):
    """One optimizer step on a (data=4, model=2) mesh equals the
    single-device step."""
    cfg = tiny_cfg(tok)
    # host copy: the train step donates its inputs, and device_put onto
    # the same device aliases buffers
    params0 = jax.device_get(init_coati(jax.random.PRNGKey(0), cfg))
    batch = synthetic_batch(tok)
    optimizer = make_optimizer(TrainConfig(lr=1e-3))
    rng = jax.random.PRNGKey(7)

    def run(mesh, place):
        step = make_train_step(
            mesh, cfg, optimizer,
            stop_token=tok.stop_token,
            unk_token=tok.unk_token,
            p_clip_emb_smi=0.0,  # deterministic branch: always smiles token
            token_entropy_unit=float(np.log2(tok.n_token)),
            do_clip=True,
            mode="pjit",
        )
        p = place(mesh, params0)
        opt = optimizer.init(p)
        p, opt, metrics = step(p, opt, rng, shard_batch(mesh, batch))
        return jax.device_get(p), float(metrics["loss"])

    from coati_tpu.parallel.mesh import replicate_params

    mesh1 = make_mesh(1)
    p_ref, loss_ref = run(mesh1, replicate_params)

    mesh_tp = make_tp_mesh(8, model_parallel=2)
    assert mesh_tp.shape == {"data": 4, "model": 2}
    p_tp, loss_tp = run(mesh_tp, shard_params)

    assert loss_tp == pytest.approx(loss_ref, rel=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_tp)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tp_forbidden_in_shard_map_mode(tok, tmp_path):
    from coati_tpu.training.train import train_autoencoder

    sys_cfg = TrainConfig(
        n_layer_e3gnn=1, n_hidden_e3nn=16, n_hidden_xformer=16,
        n_embd_common=16, n_layer_xformer=1, n_head=2, n_seq=24,
        max_n_seq=24, tokenizer_vocab="mar_verysimple",
        output_dir=str(tmp_path), parallel_mode="shard_map",
    )
    mesh = make_tp_mesh(8, model_parallel=2)
    with pytest.raises(ValueError, match="tensor parallelism"):
        train_autoencoder(sys_cfg, dataset=None, mesh=mesh)


def test_commit_opt_state_placements(tok):
    cfg = tiny_cfg(tok)
    params = init_coati(jax.random.PRNGKey(0), cfg)
    mesh = make_tp_mesh(8, model_parallel=2)
    optimizer = make_optimizer(TrainConfig(lr=1e-3))
    sharded = shard_params(mesh, params)
    template = optimizer.init(sharded)
    # simulate a host-restored (numpy) opt_state
    restored = jax.tree_util.tree_map(np.asarray, jax.device_get(template))
    committed = commit_opt_state(mesh, restored, template)
    flat_c = jax.tree_util.tree_leaves(committed)
    flat_t = jax.tree_util.tree_leaves(template)
    assert all(len(x.sharding.device_set) == 8 for x in flat_c)
    for c, t in zip(flat_c, flat_t):
        np.testing.assert_array_equal(np.asarray(c), np.asarray(t))


def test_coati2_tp_step_matches_single_device():
    """The COATI2 directCLR+AR step under (data=4, model=2) TP equals the
    single-device step."""
    from coati_tpu.models.coati2 import Coati2Config, init_coati2
    from coati_tpu.training.train_coati2 import make_coati2_train_step

    tok2 = TrieTokenizer(n_seq=32, **get_vocab("mar_verysimple"))
    cfg = Coati2Config(
        n_layer_xformer=2, n_hidden_xformer=32, embed_dim=32, n_head=2,
        n_seq=32, enc_to_coati="swiglu_resnet", n_direct_clr=8,
        n_tok=tok2.n_token,
    )
    params0 = jax.device_get(init_coati2(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)

    def rows(w=16, n=16):
        t = rng.integers(len(tok2.special_tokens), tok2.n_token, size=(n, w))
        t = t.astype(np.int32)
        t[:, 0] = tok2.smiles_token
        t[:, -2] = tok2.stop_token
        t[:, -1] = tok2.pad_token
        return t

    tokens = rows()
    y_next = np.zeros_like(tokens)
    y_next[:, :-1] = tokens[:, 1:]
    y_next[y_next == tok2.pad_token] = -1
    batch = {
        "tokens": tokens, "raw_tokens": rows(), "rand_tokens": rows(),
        "y_next": y_next,
    }
    optimizer = make_optimizer(TrainConfig(lr=1e-3))
    key = jax.random.PRNGKey(3)

    def run(mesh, place):
        step = make_coati2_train_step(
            mesh, cfg, optimizer,
            stop_token=tok2.stop_token,
            unk_token=tok2.unk_token,
            pad_token=tok2.pad_token,
            token_entropy_unit=float(np.log2(tok2.n_token)),
            mode="pjit",
        )
        p = place(mesh, params0)
        opt = optimizer.init(p)
        p, opt, metrics = step(p, opt, key, shard_batch(mesh, batch))
        return jax.device_get(p), float(metrics["loss"])

    from coati_tpu.parallel.mesh import replicate_params

    _, loss_ref = run(make_mesh(1), replicate_params)
    _, loss_tp = run(make_tp_mesh(8, model_parallel=2), shard_params)
    assert loss_tp == pytest.approx(loss_ref, rel=2e-5)