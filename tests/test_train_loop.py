"""End-to-end train_autoencoder test on the CPU mesh: tiny model, tiny
synthetic dataset, checkpointing, and resume (full + transformer-only +
optimizer)."""

import glob
import os

import numpy as np
import pytest

import jax

from coati_tpu.data.batch_pipe import batch_rows
from coati_tpu.models.io import load_e3gnn_smiles_clip_e2e, load_model_doc
from coati_tpu.training.config import TrainConfig
from coati_tpu.training.logger import COATILogger
from coati_tpu.training.train import train_autoencoder


class TinySyntheticDataset:
    summary = {"dataset_type": "synthetic-test"}

    def get_data_pipe(self, batch_size=8, partition="train", required_fields=(),
                      xform_routine=lambda x: x, **kw):
        rng = np.random.default_rng(0)
        frags = ["C", "CC", "CCO", "CCN", "CCC"]

        def rows():
            for i in range(batch_size * 4):
                smi = frags[i % len(frags)]
                n = max(1, len(smi))
                yield {
                    "smiles": smi,
                    "source_collection": "geom_drugs",
                    "atoms": rng.integers(1, 9, size=(n,)).astype(np.float64),
                    "coords": rng.normal(size=(n, 3)),
                }

        return batch_rows(
            rows(), batch_size=batch_size, partition="raw",
            xform_routine=xform_routine, required_fields=["smiles"],
        )


def tiny_config(tmp_path, **kw):
    cfg = TrainConfig(
        n_layer_e3gnn=1,
        n_hidden_e3nn=16,
        n_hidden_xformer=16,
        n_embd_common=16,
        n_layer_xformer=1,
        n_head=2,
        n_seq=24,
        max_n_seq=24,
        tokenizer_vocab="mar_verysimple",
        batch_size=2,
        n_epochs=1,
        lr=1e-3,
        norm_clips=True,
        token_mlp=True,
        output_dir=str(tmp_path / "out"),
        model_dir=str(tmp_path / "models"),
        p_dataset=0.0, p_formula=0.0, p_fim=0.0, p_graph=0.0,
        p_clip=0.5, p_randsmiles=0.0,
        log_batch_loss=1,
        ngrad_to_save=1e9,
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_train_loop_and_resume(tmp_path):
    config = tiny_config(tmp_path)
    logger = COATILogger(
        model_name="e3gnn_smiles_clip_e2e",
        output_path=config.output_dir,
        model_path=config.model_dir,
        args=config.as_dict(),
    )
    logger.start()
    params, results = train_autoencoder(
        config, TinySyntheticDataset(), logger=logger, max_steps_per_epoch=4
    )
    logger.stop()

    # the final 'best' checkpoint was written as a model document
    docs = sorted(glob.glob(os.path.join(config.model_dir, "*")))
    assert docs, "no checkpoint written"
    doc = load_model_doc(docs[-1])
    assert doc["train_args"]["tokenizer_vocab"] == "mar_verysimple"
    assert doc["model_kwargs"]["n_layer_xformer"] == 1
    assert doc["optimizer"] is not None
    assert "offline_loss" in doc and doc["offline_loss"]["batch_losses"]

    # the document loads through the inference loader
    model, tok = load_e3gnn_smiles_clip_e2e(docs[-1])
    assert model.embed_dim == 16

    # full resume + optimizer resume: with zero training steps the
    # returned params must BE the document's weights (the resume path
    # must not silently re-initialize — train_coati.py:159-202)
    config2 = tiny_config(
        tmp_path, resume_document=docs[-1], resume_optimizer=True, n_epochs=0
    )
    params2, _ = train_autoencoder(
        config2, TinySyntheticDataset(), logger=None, max_steps_per_epoch=2
    )
    doc_state = doc["model"]
    from coati_tpu.models.io import params_to_state

    resumed_state = params_to_state(params2)
    checked = 0
    for key in sorted(doc_state):
        if doc_state[key] is None or not hasattr(doc_state[key], "shape"):
            continue
        np.testing.assert_allclose(
            np.asarray(resumed_state[key]), np.asarray(doc_state[key]),
            atol=1e-6,
        )
        checked += 1
        if checked >= 3:
            break
    assert checked, "no array leaves compared"
    config2 = tiny_config(
        tmp_path, resume_document=docs[-1], resume_optimizer=True
    )
    params2, _ = train_autoencoder(
        config2, TinySyntheticDataset(), logger=None, max_steps_per_epoch=2
    )

    # transformer-only partial resume (train_coati.py:176-190)
    config3 = tiny_config(
        tmp_path, resume_document=docs[-1], load_transformer_only=True
    )
    params3, _ = train_autoencoder(
        config3, TinySyntheticDataset(), logger=None, max_steps_per_epoch=2
    )


def test_train_loop_orbax_resume(tmp_path):
    """orbax restart-from-latest (TrainConfig.orbax_dir): a second run
    over the same directory resumes past the completed epoch and returns
    the checkpointed params unchanged."""
    pytest.importorskip("orbax.checkpoint")
    odir = str(tmp_path / "orbax")
    config = tiny_config(tmp_path, orbax_dir=odir, n_epochs=1, ngrad_to_save=1)
    params1, _ = train_autoencoder(
        config, TinySyntheticDataset(), logger=None, max_steps_per_epoch=3
    )
    config2 = tiny_config(tmp_path, orbax_dir=odir, n_epochs=1, ngrad_to_save=1)
    params2, _ = train_autoencoder(
        config2, TinySyntheticDataset(), logger=None, max_steps_per_epoch=3
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(params1), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
