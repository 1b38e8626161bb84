"""Shared fixtures for the parallel-strategy test files: one tiny COATI
config and one synthetic device batch, so test_fsdp / test_tensor_parallel
/ test_training cannot drift on the y_next masking or token-planting
conventions."""

import numpy as np

from coati_tpu.models.coati import CoatiConfig


def tiny_cfg(tok, **overrides) -> CoatiConfig:
    kw = dict(
        n_layer_e3gnn=1,
        n_layer_xformer=2,
        n_hidden_xformer=32,
        n_hidden_e3nn=16,
        n_embd_common=32,
        n_head=2,
        n_seq=32,
        n_tok=tok.n_token,
        norm_clips=True,
        token_mlp=True,
    )
    kw.update(overrides)
    return CoatiConfig(**kw)


def synthetic_batch(tok, batch=16, width=16, n_atoms=8, seed=0):
    rng = np.random.default_rng(seed)
    tokens = rng.integers(
        len(tok.special_tokens), tok.n_token, size=(batch, width)
    ).astype(np.int32)
    tokens[:, 0] = tok.smiles_token
    tokens[:, -2] = tok.stop_token
    tokens[:, -1] = tok.pad_token
    y_next = np.zeros_like(tokens)
    y_next[:, :-1] = tokens[:, 1:]
    y_next[y_next == tok.pad_token] = -1
    atoms = rng.integers(1, 9, size=(batch, n_atoms)).astype(np.int32)
    coords = rng.normal(size=(batch, n_atoms, 3)).astype(np.float32)
    return {
        "raw_tokens": tokens,
        "tokens": tokens,
        "y_next": y_next,
        "atoms": atoms,
        "coords": coords,
    }
