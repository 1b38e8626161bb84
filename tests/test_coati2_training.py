"""COATI2 training recipe tests (beyond-parity: the reference ships
COATI2 inference only).

Covers: the property-token xform (bucketing, conditioning structure,
label masking), the directCLR objective (sharded == global), the training
loop end-to-end (loss decreases, documents load back through load_coati2
and generate), and orbax restart-from-latest.
"""


import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coati_tpu.data.batch_pipe import batch_rows
from coati_tpu.data.xform_coati2 import (
    PROPERTY_BUCKETS,
    coati2_ar_xform,
    property_tokens,
)
from coati_tpu.models.coati2 import (
    Coati2Config,
    coati2_training_forward,
    direct_clr_loss,
    init_coati2,
)
from coati_tpu.models.io import load_coati2
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer
from coati_tpu.training.logger import COATILogger
from coati_tpu.training.train_coati2 import (
    Coati2TrainConfig,
    make_coati2_train_step,
    train_coati2,
)

SMILES = ["C", "CC", "CCO", "CCN", "CCC", "CCCO", "CNC", "COC"]

# precomputed descriptors (rdkit is optional in this environment)
PROPS = {
    "ExactMolWt": 46.04,
    "MolLogP": -0.0014,
    "QED": 0.41,
    "FractionCSP3": 1.0,
    "TPSA": 20.23,
    "NumHAcceptors": 1,
    "NumHDonors": 1,
    "NumRotatableBonds": 0,
    "NumAromaticRings": 0,
    "NumAromaticCarbocycles": 0,
    "NumAliphaticCarbocycles": 0,
}


@pytest.fixture(scope="module")
def tok():
    return TrieTokenizer(n_seq=64, **get_vocab("coati2_12_12"))


def test_property_tokens_block(tok):
    block = property_tokens("CCO", tok, properties=PROPS, with_stereo=False)
    assert block.startswith("[PROPS]") and block.endswith("[ENDPROPS]")
    # every bucket token is in-vocab and the block tokenizes cleanly
    ids = tok.tokenize_text(block, pad=False, range_check=False)
    assert all(0 <= i < tok.n_token for i in ids)
    assert "[TPSA][NUM20]" in block  # round(20.23)
    assert "[PercentQED][NUM41]" in block
    assert "[IntMolLogP][NUM10]" in block  # round(-0.0014) + 10
    assert "[IntExactMolWt][NUM9]" in block  # int(46.04) // 5


def test_property_bucket_clamping(tok):
    huge = dict(PROPS, TPSA=4000.0, MolLogP=999.0, ExactMolWt=99999.0)
    block = property_tokens("C", tok, properties=huge, with_stereo=False)
    ids = tok.tokenize_text(block, pad=False, range_check=False)
    assert all(0 <= i < tok.n_token for i in ids)  # clamped into NUM0..169
    assert "[NUM169]" in block


def test_xform_structure_and_masking(tok):
    batch = {
        "smiles": list(SMILES),
        "properties": [dict(PROPS) for _ in SMILES],
    }
    out = coati2_ar_xform(
        dict(batch), tok, p_props=1.0, p_prop_each=1.0, p_clip=1.0
    )
    assert out["tokens"].shape[0] == len(SMILES)
    assert out["raw_tokens"].shape == out["rand_tokens"].shape
    props_id = tok.vocab["[PROPS]"]
    endprops_id = tok.vocab["[ENDPROPS]"]
    assert tok.pad_token != 0  # coati2_12_12 quirk: [PAD]=31, id 0=[CHARGE]
    for row, y in zip(out["tokens"], out["y_next"]):
        assert props_id in row and endprops_id in row
        assert tok.clip_token in row and tok.unk_token in row
        assert tok.stop_token in row
        # rows are padded with the REAL pad id and everything after
        # [STOP] is masked out of the loss (a zero-fill would train the
        # model to predict [CHARGE] forever)
        stop_pos = list(row).index(tok.stop_token)
        assert np.all(row[stop_pos + 1:] == tok.pad_token)
        assert np.all(y[stop_pos:] == -1)
        # conditioning specials masked out of the loss
        assert not np.any(y == tok.clip_token)
        assert not np.any(y == tok.unk_token)
        assert not np.any(y == tok.pad_token)
    # decode strips conditioning down to the SMILES
    decoded = tok.decode(list(out["raw_tokens"][2]), special=False)
    assert decoded == "CCO"

    # p_props=0 / p_clip=0 -> bare rows
    bare = coati2_ar_xform(dict(batch), tok, p_props=0.0, p_clip=0.0)
    for row in bare["tokens"]:
        assert props_id not in row and tok.clip_token not in row


def test_xform_flag_tokens(tok):
    batch = {
        "smiles": ["CCO"],
        "properties": [dict(PROPS)],
        "purchasable": [True],
        "fda_approved": [True],
    }
    out = coati2_ar_xform(dict(batch), tok, p_props=1.0, p_prop_each=1.0, p_clip=0.0)
    row = list(out["tokens"][0])
    assert tok.vocab["[purchasable]"] in row
    assert tok.vocab["[fda_approved]"] in row
    # flags sit inside the [PROPS]...[ENDPROPS] block
    assert row.index(tok.vocab["[purchasable]"]) < row.index(tok.vocab["[ENDPROPS]"])


def _tiny_cfg(n_tok: int) -> Coati2Config:
    return Coati2Config(
        n_layer_xformer=2,
        n_hidden_xformer=32,
        embed_dim=32,
        n_head=2,
        n_seq=64,
        enc_to_coati="swiglu_resnet",
        n_direct_clr=8,
        n_tok=n_tok,
    )


def _batch(tok, n=16, seed=0):
    rng = np.random.default_rng(seed)
    batch = {
        "smiles": [SMILES[i % len(SMILES)] for i in range(n)],
        "properties": [dict(PROPS) for _ in range(n)],
    }
    return coati2_ar_xform(
        batch, tok, p_props=0.5, p_clip=1.0, rng=__import__("random").Random(seed)
    )


def test_direct_clr_sharded_equals_global(tok):
    """shard_map(all_gather) and pjit formulations produce the same loss
    on the 8-device CPU mesh."""
    from coati_tpu.parallel.mesh import make_mesh, replicate_params, shard_batch
    from coati_tpu.training.train import make_optimizer
    from coati_tpu.training.config import TrainConfig

    cfg = _tiny_cfg(tok.n_token)
    params = init_coati2(jax.random.PRNGKey(0), cfg)
    batch = _batch(tok, n=16)
    device_batch = {
        k: batch[k] for k in ("tokens", "raw_tokens", "rand_tokens", "y_next")
    }

    mesh = make_mesh(8)
    optimizer = make_optimizer(TrainConfig(lr=1e-3))
    losses = {}
    for mode in ("pjit", "shard_map"):
        step = make_coati2_train_step(
            mesh, cfg, optimizer,
            stop_token=tok.stop_token,
            unk_token=tok.unk_token,
            pad_token=tok.pad_token,
            token_entropy_unit=float(np.log2(tok.n_token)),
            is_training=False,
            mode=mode,
        )
        p = replicate_params(mesh, params)
        opt = optimizer.init(p)
        _, _, metrics = step(p, opt, jax.random.PRNGKey(1), shard_batch(mesh, device_batch))
        losses[mode] = float(metrics["loss"])

    # single-device global reference
    h1, h2, logits, bad = coati2_training_forward(
        params, cfg,
        jnp.asarray(batch["tokens"]), jnp.asarray(batch["raw_tokens"]),
        jnp.asarray(batch["rand_tokens"]), tok.stop_token, tok.unk_token,
    )
    from coati_tpu.models.coati import ar_loss_fn

    ref = float(
        ar_loss_fn(logits, jnp.asarray(batch["y_next"]))
        + direct_clr_loss(h1, h2, bad, cfg.n_direct_clr)
        * float(np.log2(tok.n_token))
    )
    assert losses["pjit"] == pytest.approx(ref, rel=2e-5)
    # shard_map averages the AR loss per shard then pmeans (exact DDP
    # semantics, training/train.py:120-125) — a slightly different
    # weighting than the global token-average when shards carry unequal
    # valid-token counts
    assert losses["shard_map"] == pytest.approx(ref, rel=1e-3)


class SyntheticCoati2Dataset:
    summary = {"dataset_type": "synthetic-coati2-test"}

    def __init__(self, n_rows=64):
        self.n_rows = n_rows

    def get_data_pipe(self, batch_size=8, partition="train", required_fields=(),
                      xform_routine=lambda x: x, **kw):
        def rows():
            for i in range(self.n_rows):
                yield {
                    "smiles": SMILES[i % len(SMILES)],
                    "properties": dict(PROPS),
                }

        return batch_rows(
            rows(), batch_size=batch_size, partition="raw",
            xform_routine=xform_routine, required_fields=["smiles"],
        )


def _tiny_train_cfg(tmp_path, **kw):
    cfg = Coati2TrainConfig(
        n_layer_xformer=1,
        n_hidden_xformer=16,
        embed_dim=16,
        n_head=2,
        n_seq=64,
        n_direct_clr=4,
        batch_size=1,  # per-device; 8-device mesh -> global 8
        n_epochs=2,
        lr=2e-3,
        output_dir=str(tmp_path / "out"),
        log_batch_loss=1,
        log_interval=1000,
        ngrad_to_save=1e9,
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_train_coati2_end_to_end(tmp_path):
    """Loss decreases; the checkpoint document loads via load_coati2 and
    the loaded model encodes + generates."""
    config = _tiny_train_cfg(tmp_path)
    logger = COATILogger(
        model_name="coati2",
        output_path=config.output_dir,
        model_path=str(tmp_path / "models"),
        args=config.as_dict(),
    )
    logger.start()
    params, results = train_coati2(
        config, SyntheticCoati2Dataset(), logger=logger, max_steps_per_epoch=12
    )
    import json as _json

    raw = open(logger.log_file).read()
    events = _json.loads(raw.rstrip(",") + "]")
    losses = [e["value"] for e in events if e.get("key") == "train_batch_loss"]
    assert len(losses) >= 12
    first = np.mean(losses[:4])
    last = np.mean(losses[-4:])
    assert last < first, f"loss did not decrease: {first} -> {last}"

    import glob

    docs = sorted(glob.glob(str(tmp_path / "models" / "*")))
    assert docs, "no model document written"
    model, tok2 = load_coati2(docs[-1])
    h = model.smiles_to_coati_vec(["CCO", "CC"], tok2)
    assert h.shape == (2, config.embed_dim)
    assert np.isfinite(h).all()
    out = model.hcoati_to_2d_batch(h, tok2, k=8, inv_temp=2.0)
    assert len(out) == 2 and all(isinstance(s, str) for s in out)


def test_train_coati2_orbax_resume(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    odir = str(tmp_path / "orbax")
    config = _tiny_train_cfg(tmp_path, orbax_dir=odir, n_epochs=1, ngrad_to_save=1)
    params1, _ = train_coati2(
        config, SyntheticCoati2Dataset(), max_steps_per_epoch=4
    )
    # second run resumes past epoch 0 and returns immediately with the
    # restored params (start_epoch == n_epochs)
    config2 = _tiny_train_cfg(tmp_path, orbax_dir=odir, n_epochs=1, ngrad_to_save=1)
    params2, _ = train_coati2(
        config2, SyntheticCoati2Dataset(), max_steps_per_epoch=4
    )
    l1 = jax.tree_util.tree_leaves(params1)
    l2 = jax.tree_util.tree_leaves(params2)
    # resumed run skips its (already-completed) single epoch, so its
    # params equal the first run's final checkpointed params
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
