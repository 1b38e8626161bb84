"""Embedding/decoding utilities over the invertible COATI latent space.

Parity target: coati/generative/coati_purifications.py (embed_points :11,
embed_smiles :26, embed_smiles_batch :42, purify_vector :51,
force_decode_valid :100, force_decode_valid_batch :122). The batched
force-decode paths are dramatically faster here because decoding runs the
fused KV-cache sampler.

Validity checking uses RDKit when installed and a syntax-level fallback
otherwise (coati_tpu.chem.rdkit_support.is_valid_smiles).
"""

from __future__ import annotations

from typing import List

import numpy as np

from coati_tpu.chem.rdkit_support import (
    canonicalize_or_self,
    is_valid_smiles,
    mol_to_atoms_coords,
)
from coati_tpu.models.api import COATI
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer


def embed_points(s: str, encoder: COATI) -> np.ndarray:
    """SMILES -> ETKDG 3D conformer -> point-encoder embedding (1, D)."""
    atoms, coords = mol_to_atoms_coords(s)
    return np.asarray(
        encoder.encode_points(
            np.asarray(atoms)[None, :], np.asarray(coords, np.float32)[None, :, :]
        )
    )


def embed_smiles(s: str, encoder: COATI, tokenizer: TrieTokenizer) -> np.ndarray:
    """Canonicalize + tokenize + encode one SMILES -> (D,)."""
    s = canonicalize_or_self(s)
    tokens = np.asarray(
        [tokenizer.tokenize_text("[SMILES]" + s + "[STOP]", pad=True)], np.int32
    )
    return np.asarray(encoder.encode_tokens(tokens, tokenizer))[0]


def embed_smiles_batch(
    smiles_list: List[str], encoder: COATI, tokenizer: TrieTokenizer
) -> np.ndarray:
    tokens = np.asarray(
        [
            tokenizer.tokenize_text("[SMILES]" + s + "[STOP]", pad=True)
            for s in smiles_list
        ],
        np.int32,
    )
    return np.asarray(encoder.encode_tokens(tokens, tokenizer))


def purify_vector(
    V: np.ndarray,
    encoder: COATI,
    tokenizer: TrieTokenizer,
    n_rep: int = 128,
) -> np.ndarray:
    """Push V toward the average of embed(decode(V)) over n_rep decodes —
    the idempotent part of the vector under the decode-embed map."""
    V = np.asarray(V, np.float32).reshape(-1)
    try:
        regen = encoder.hclip_to_2d_batch(
            np.tile(V[None, :], (n_rep, 1)), tokenizer
        )
    except Exception:  # noqa: BLE001 - mirror reference's defensive return
        return V
    tokens = []
    for s in regen:
        if not is_valid_smiles(s):
            continue
        try:
            tokens.append(
                tokenizer.tokenize_text(
                    "[SMILES]" + canonicalize_or_self(s) + "[STOP]", pad=True
                )
            )
        except (KeyError, ValueError):
            continue
    if not tokens:
        return V
    embeds = np.asarray(
        encoder.encode_tokens(np.asarray(tokens, np.int32), tokenizer)
    )
    return embeds.mean(0)


def force_decode_valid(
    V: np.ndarray,
    encoder: COATI,
    tokenizer: TrieTokenizer,
    max_attempts: int = 2000,
) -> str:
    """Redecode until a valid SMILES appears; 'C' as a last resort."""
    V = np.asarray(V, np.float32).reshape(-1)
    for _ in range(max_attempts):
        try:
            s = encoder.hclip_to_2d(V, tokenizer)
            if is_valid_smiles(s):
                return s
        except Exception:  # noqa: BLE001
            pass
    return "C"


def force_decode_valid_batch(
    V: np.ndarray,
    encoder: COATI,
    tokenizer: TrieTokenizer,
    batch_size: int = 128,
    max_attempts: int = 4,
) -> str:
    """Parallel redecodes; return the most common valid canonical SMILES."""
    V = np.asarray(V, np.float32).reshape(-1)
    for _ in range(max_attempts):
        try:
            regen = encoder.hclip_to_2d_batch(
                np.tile(V[None, :], (batch_size, 1)), tokenizer
            )
        except Exception:  # noqa: BLE001
            continue
        valid = [canonicalize_or_self(s) for s in regen if is_valid_smiles(s)]
        if valid:
            return max(set(valid), key=valid.count)
    return "C"
