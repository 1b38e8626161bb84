"""Model-document IO.

The reference ships checkpoints as pickled dicts
{train_args, dataset_summary, model (state_dict), optimizer, model_kwargs,
 n_toks_processed, n_grads_processed, offline_loss}
(coati/training/train_coati.py:37-57). This module:

  * loads those documents (including torch-tensor payloads, decoded on CPU
    via a gated torch import — coati/models/io/coati.py:17-22) and converts
    them into CoatiParams (`load_e3gnn_smiles_clip_e2e`);
  * saves OUR training checkpoints in the same envelope, with the model as
    a nested dict of numpy arrays instead of a torch state_dict.
"""

from __future__ import annotations

import pickle
from io import BytesIO
from typing import Optional, Tuple

import numpy as np

import jax
from flax import serialization

from coati_tpu.common.artifacts import cache_read
from coati_tpu.models.api import COATI
from coati_tpu.models.coati import CoatiConfig, CoatiParams, init_coati
from coati_tpu.models.convert import (
    config_from_model_kwargs,
    convert_coati,
    projection_is_old_architecture,
    strip_module_prefix,
)
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer


class _TorchCpuUnpickler(pickle.Unpickler):
    """Unpickle torch checkpoints onto CPU without a CUDA runtime."""

    def find_class(self, module, name):
        if module == "torch.storage" and name == "_load_from_bytes":
            import torch  # gated: only needed for torch-format documents

            return lambda b: torch.load(BytesIO(b), map_location="cpu")
        return super().find_class(module, name)


def load_model_doc(doc_url: str) -> dict:
    """Load a model document from a local path / file:// / s3:// URI."""
    with cache_read(doc_url, "rb") as f:
        return _TorchCpuUnpickler(f, encoding="UTF-8").load()


def load_e3gnn_smiles_clip_e2e(
    doc_url: str,
    device: Optional[str] = None,  # accepted for API parity; placement is JAX's
    freeze: bool = True,  # JAX params are immutable; accepted for parity
    strict: bool = False,
    old_architecture: Optional[bool] = None,
    override_args: Optional[dict] = None,
    model_type: str = "default",
    print_debug: bool = False,
) -> Tuple[COATI, TrieTokenizer]:
    """Load a COATI model document -> (COATI, TrieTokenizer).

    Signature-compatible with the reference loader
    (coati/models/io/coati.py:25-100). `old_architecture` is auto-detected
    from the projection-head layer order when not given.
    """
    del device, freeze, strict
    print(f"Loading model from {doc_url}")
    doc = load_model_doc(doc_url)
    model_kwargs = dict(doc["model_kwargs"])
    if override_args:
        model_kwargs.update(override_args)

    sd = strip_module_prefix(doc["model"])
    # reference state_dicts are flat with dotted keys; ours are nested
    flat_format = any("." in k for k in sd)
    if flat_format:
        # reference-format flat state_dict (torch tensors or numpy arrays)
        if old_architecture is None:
            old_architecture = projection_is_old_architecture(sd, "smiles_to_clip")
        cfg = config_from_model_kwargs(
            model_kwargs, old_architecture=bool(old_architecture)
        )
        params = convert_coati(sd, cfg)
    else:
        # coati_tpu-format nested numpy dict; recover fp-head config from
        # the stored head shapes so the template pytree matches
        fp_map = None
        fp_state = sd.get("fp_heads")
        if fp_state:
            fp_map = tuple(
                sorted((name, int(np.asarray(h["w"]).shape[-1])) for name, h in fp_state.items())
            )
        cfg = config_from_model_kwargs(
            model_kwargs,
            old_architecture=bool(old_architecture or False),
            fp_map=fp_map,
        )
        params = params_from_state(cfg, sd)

    # fp heads are auto-detected from the state_dict, so "fp" documents
    # load through the same path (coati/models/io/coati.py:82-85)
    if model_type not in ("default", "fp"):
        raise ValueError(f"unknown model type {model_type!r}")

    tokenizer_vocab = doc["train_args"]["tokenizer_vocab"]
    print(f"Loading tokenizer {tokenizer_vocab} from {doc_url}")
    tokenizer = TrieTokenizer(n_seq=cfg.n_seq, **get_vocab(tokenizer_vocab))
    if "selfies" in tokenizer_vocab:
        # selfies documents (e.g. the published selfies_barlow) rebind
        # pre_tokenize to run selfies.encoder first (reference
        # io/coati.py:90-92); the selfies package is only required when
        # the tokenizer is actually used
        from coati_tpu.tokenizers.selfies_support import to_selfies_tokenizer

        tokenizer = to_selfies_tokenizer(tokenizer)
    if print_debug:
        print("NTokens: ", doc.get("n_toks_processed"))
        print("Model kwargs: ", model_kwargs)
    return COATI(params, cfg), tokenizer


def load_coati2(
    doc_url: str,
    device: Optional[str] = None,
    freeze: bool = True,
    old_architecture: bool = False,
    force_cpu: bool = False,
):
    """Load a COATI2 model document -> (COATI2, TrieTokenizer).
    Signature-compatible with coati/models/simple_coati2/io.py:21-84."""
    del device, freeze, old_architecture, force_cpu
    from coati_tpu.models.coati2 import COATI2
    from coati_tpu.models.convert import (
        coati2_config_from_model_kwargs,
        convert_coati2,
    )

    print(f"Loading model from {doc_url}")
    doc = load_model_doc(doc_url)
    cfg = coati2_config_from_model_kwargs(doc["model_kwargs"])
    sd = strip_module_prefix(doc["model"])
    if any("." in k for k in sd):
        # reference-format flat state_dict (simple_coati2/io.py:21-84)
        params = convert_coati2(sd, cfg)
    else:
        # coati_tpu-format nested numpy dict (train_coati2 checkpoints)
        params = coati2_params_from_state(cfg, sd)
    tokenizer_vocab = doc["train_args"]["tokenizer_vocab"]
    print(f"Loading tokenizer {tokenizer_vocab} from {doc_url}")
    tokenizer = TrieTokenizer(n_seq=cfg.n_seq, **get_vocab(tokenizer_vocab))
    return COATI2(params, cfg), tokenizer


def load_offline_loss(doc_url: str):
    """Loss curves stored inside a document (coati/models/io/coati.py:103)."""
    print("Loading Loss from offline training")
    return load_model_doc(doc_url)["offline_loss"]


# ------------------------------------------------------- our checkpoints


def params_to_state(params) -> dict:
    """Params pytree -> nested dict of numpy arrays (pickle-friendly)."""
    return jax.tree_util.tree_map(np.asarray, serialization.to_state_dict(params))


def params_from_state(cfg: CoatiConfig, state: dict) -> CoatiParams:
    template = init_coati(jax.random.PRNGKey(0), cfg)
    return serialization.from_state_dict(template, state)


def coati2_params_from_state(cfg, state: dict):
    from coati_tpu.models.coati2 import init_coati2

    template = init_coati2(jax.random.PRNGKey(0), cfg)
    return serialization.from_state_dict(template, state)


def serialize_model(
    train_args: dict,
    dataset_summary: dict,
    model_state: dict,
    model_kwargs: dict,
    optimizer_state=None,
    **kwargs,
) -> bytes:
    """Build a model-document blob (same envelope as
    coati/training/train_coati.py:37-57)."""
    doc = {
        "train_args": train_args,
        "dataset_summary": dataset_summary,
        "model": model_state,
        "optimizer": optimizer_state,
        "model_kwargs": model_kwargs,
        **kwargs,
    }
    blob = pickle.dumps(doc, protocol=pickle.HIGHEST_PROTOCOL)
    print("Model Document size (MB): ", len(blob) / (1024 * 1024))
    return blob
