"""Shared fixture for the multi-node test: ONE deterministic tiny model,
batch, and train-step recipe used both by the in-process 8-device
reference run (tests/test_multinode.py) and the 2-process workers
(tests/multinode_worker.py), so the two runs cannot drift."""

import numpy as np

from coati_tpu.models.coati import CoatiConfig
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

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

GLOBAL_BATCH = 16


def synthetic_batch(batch=GLOBAL_BATCH, seed=0):
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


def make_optimizer_and_step(mesh, mode):
    import optax

    from coati_tpu.training.train import make_train_step

    optimizer = optax.adam(1e-3)
    step = make_train_step(
        mesh,
        CFG,
        optimizer,
        stop_token=TOK.stop_token,
        unk_token=TOK.unk_token,
        p_clip_emb_smi=0.0,  # deterministic clip-token choice
        token_entropy_unit=float(np.log2(TOK.n_token)),
        do_clip=True,
        mode=mode,
    )
    return optimizer, step
