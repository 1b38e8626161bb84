"""User-facing COATI model API.

Mirrors the public surface of the reference e3gnn_smiles_clip_e2e
(coati/models/encoding/clip_e2e.py:350-845) so reference users can switch
with minimal changes, while everything under the hood is jitted JAX with
fixed-shape bucketing:

    model, tokenizer = load_e3gnn_smiles_clip_e2e(doc_url)   # io.py
    h = model.encode_tokens(tokens, tokenizer)                # (B, D)
    smiles = model.hclip_to_2d_batch(h, tokenizer, noise_scale=0.3)

Batch sizes are padded up to power-of-two buckets so XLA compiles each
entry point a bounded number of times.
"""

from __future__ import annotations

import functools
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from coati_tpu.models import coati as F
from coati_tpu.models.coati import CoatiConfig, CoatiParams
from coati_tpu.models.sampler import auto_stage_widths, generate_tokens
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer


def bucket_size(n: int, minimum: int = 8) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _pad_batch(arr: np.ndarray, target: int) -> np.ndarray:
    if arr.shape[0] == target:
        return arr
    if arr.shape[0] == 0:
        return np.zeros((target,) + arr.shape[1:], arr.dtype)
    reps = np.repeat(arr[:1], target - arr.shape[0], axis=0)
    return np.concatenate([arr, reps], axis=0)


@functools.partial(jax.jit, static_argnames=("cfg", "stop_token"))
def _encode_tokens_jit(params, cfg, tokens, stop_token):
    return F.encode_tokens(params, cfg, tokens, stop_token)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode_points_jit(params, cfg, atoms, coords):
    return F.encode_points(params, cfg, atoms, coords)


@functools.partial(jax.jit, static_argnames=("cfg", "unk_token"))
def _likelihood_jit(params, cfg, tokens, y_next, injection, unk_token):
    return F.tokens_likelihood(params, cfg, tokens, y_next, injection, unk_token)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _clip_to_token_jit(params, cfg, h):
    return F.clip_to_special_token(params, h)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "stop_token", "unk_token", "pad_token", "prefill_len",
        "total_len", "k", "stage_widths",
    ),
)
def _embed_decode_jit(
    params, cfg, smiles_tokens, tokens0, noise, rng, inv_temp,
    *, stop_token, unk_token, pad_token, prefill_len, total_len, k,
    stage_widths,
):
    """Fused embed -> inject -> decode: encode, clip-token MLP and the
    full sampling loop in ONE compiled program (no host hops between)."""
    h = F.encode_tokens(params, cfg, smiles_tokens, stop_token)
    h_token = F.clip_to_special_token(params, h + noise.astype(h.dtype))
    b = smiles_tokens.shape[0]
    out = generate_tokens(
        params.xformer,
        cfg.xformer_config,
        rng,
        tokens0,
        jnp.full((b,), prefill_len, jnp.int32),
        prefill_len=prefill_len,
        total_len=total_len,
        stop_token=stop_token,
        pad_token=pad_token,
        k=k,
        inv_temp=inv_temp,
        inj_payload=h_token,
        inject_token=unk_token,
        stage_widths=stage_widths,
    )
    return h, out


def fused_round_trip(
    embed_decode_jit,
    params,
    config,
    embed_dim: int,
    tokenizer: TrieTokenizer,
    token_indices,
    *,
    fill_in_from: str,
    noise_scale: float,
    inv_temp: float,
    k: int,
    keep_special: bool,
    return_embeddings: bool,
    total_len: Optional[int],
    noise_fn,  # (scale, shape) -> np.ndarray; thread-safe sampler
    rng,
):
    """Shared host-side scaffold for the one-program embed -> decode
    round trip (COATI and COATI2 share everything except the jitted
    embed-decode function): bucket-pad the tokens, build the injection
    prefix, draw host-side noise, dispatch, un-pad and decode."""
    tokens = np.asarray(token_indices, np.int32)
    b0 = tokens.shape[0]
    tgt = bucket_size(b0)
    tokens = _pad_batch(tokens, tgt)
    prefix = tokenizer.tokenize_text("[CLIP][UNK]" + fill_in_from, pad=False)
    total_len = total_len or config.n_seq
    tokens0 = np.zeros((tgt, total_len), np.int32)
    tokens0[:, : len(prefix)] = prefix
    noise = np.zeros((tgt, embed_dim), np.float32)
    if noise_scale > 0:
        noise = noise_fn(noise_scale, noise.shape)
    h, out = embed_decode_jit(
        params,
        config,
        jnp.asarray(tokens),
        jnp.asarray(tokens0),
        jnp.asarray(noise),
        rng,
        inv_temp,
        stop_token=tokenizer.stop_token,
        unk_token=tokenizer.unk_token,
        pad_token=tokenizer.pad_token,
        prefill_len=len(prefix),
        total_len=total_len,
        k=k,
        stage_widths=auto_stage_widths(len(prefix), total_len),
    )
    out = np.asarray(out)[:b0]
    smiles = tokenizer.decode_batch(out, special=keep_special)
    if return_embeddings:
        return smiles, np.asarray(h)[:b0]
    return smiles


class COATI:
    """Composite CLIP model wrapper: params + config + jitted entry points."""

    def __init__(self, params: CoatiParams, config: CoatiConfig, seed: int = 0):
        self.params = params
        self.config = config
        self.embed_dim = config.embed_dim
        self._rng = jax.random.PRNGKey(seed)
        self._noise = np.random.default_rng(seed)
        # the serving layer calls generate from several batcher threads;
        # the split below is a read-modify-write, and np Generators are
        # documented not thread-safe
        self._rng_lock = threading.Lock()

    def _next_rng(self) -> jax.Array:
        with self._rng_lock:
            self._rng, out = jax.random.split(self._rng)
            return out

    def _sample_noise(self, scale: float, shape) -> np.ndarray:
        with self._rng_lock:
            return self._noise.normal(scale=scale, size=shape).astype(np.float32)

    # ------------------------------------------------------------ encode
    def encode_tokens(self, token_indices, tokenizer: TrieTokenizer) -> jnp.ndarray:
        """(B, T) int tokens -> (B, embed_dim) hclip."""
        tokens = np.asarray(token_indices, dtype=np.int32)
        b = tokens.shape[0]
        padded = _pad_batch(tokens, bucket_size(b))
        out = _encode_tokens_jit(
            self.params, self.config, jnp.asarray(padded), tokenizer.stop_token
        )
        return out[:b]

    def encode_points(self, atoms, coords) -> jnp.ndarray:
        atoms = np.asarray(atoms)
        coords = np.asarray(coords, dtype=np.float32)
        b = atoms.shape[0]
        tgt = bucket_size(b)
        out = _encode_points_jit(
            self.params,
            self.config,
            jnp.asarray(_pad_batch(atoms, tgt)),
            jnp.asarray(_pad_batch(coords, tgt)),
        )
        return out[:b]

    # ---------------------------------------------------------- generate
    def _generate_from_hclip(
        self,
        h_clip: np.ndarray,
        tokenizer: TrieTokenizer,
        prefix_text: str,
        noise_scale: float,
        inv_temp: float,
        k: int,
        total_len: Optional[int] = None,
        top_p: Optional[float] = None,
    ) -> np.ndarray:
        h_clip = np.asarray(h_clip, dtype=np.float32)
        if noise_scale > 0:
            h_clip = h_clip + self._sample_noise(noise_scale, h_clip.shape)
        b = h_clip.shape[0]
        tgt = bucket_size(b)
        h_token = _clip_to_token_jit(
            self.params, self.config, jnp.asarray(_pad_batch(h_clip, tgt))
        )
        prefix = tokenizer.tokenize_text(prefix_text, pad=False)
        total_len = total_len or self.config.n_seq
        tokens0 = np.zeros((tgt, total_len), np.int32)
        tokens0[:, : len(prefix)] = prefix
        out = generate_tokens(
            self.params.xformer,
            self.config.xformer_config,
            self._next_rng(),
            jnp.asarray(tokens0),
            jnp.full((tgt,), len(prefix), jnp.int32),
            prefill_len=len(prefix),
            total_len=total_len,
            stop_token=tokenizer.stop_token,
            pad_token=tokenizer.pad_token,
            k=k,
            inv_temp=inv_temp,
            inj_payload=h_token,
            inject_token=tokenizer.unk_token,
            stage_widths=auto_stage_widths(len(prefix), total_len),
            top_p=top_p,
        )
        return np.asarray(out[:b])

    def hclip_to_2d_batch(
        self,
        h_clip,
        tokenizer: TrieTokenizer,
        fill_in_from: str = "[SMILES]",
        noise_scale: float = 0.0,
        inv_temp: float = 2.0,
        k: int = 100,
        do_suffix: bool = False,
        keep_special: bool = False,
        return_tokens: bool = False,
        top_p: Optional[float] = None,
    ):
        """Decode a batch of hclip vectors to SMILES (clip_e2e.py:544-588).

        top_p (beyond-parity): optional nucleus truncation within the
        top-k candidates (ops/sampling.py); None = reference-exact."""
        suffstr = "[SUFFIX][MIDDLE]" if do_suffix else ""
        toks = self._generate_from_hclip(
            h_clip,
            tokenizer,
            "[CLIP][UNK]" + fill_in_from + suffstr,
            noise_scale,
            inv_temp,
            k,
            top_p=top_p,
        )
        smiles = tokenizer.decode_batch(np.asarray(toks), special=keep_special)
        if return_tokens:
            return smiles, [list(map(int, row)) for row in toks]
        return smiles

    def hclip_to_2d(
        self,
        h_clip,
        tokenizer: TrieTokenizer,
        fill_in_from: str = "[SMILES]",
        noise_scale: float = 0.0,
        do_suffix: bool = False,
        inv_temp: float = 2.0,
        k: int = 100,
    ) -> str:
        """Single-vector decode (clip_e2e.py:503-542)."""
        h = np.asarray(h_clip, np.float32).reshape(1, -1)
        return self.hclip_to_2d_batch(
            h, tokenizer, fill_in_from, noise_scale, inv_temp, k, do_suffix
        )[0]

    def smiles_to_2d_batch(
        self,
        token_indices,
        tokenizer: TrieTokenizer,
        fill_in_from: str = "[SMILES]",
        noise_scale: float = 0.0,
        inv_temp: float = 2.0,
        k: int = 100,
        keep_special: bool = False,
        return_embeddings: bool = False,
        total_len: Optional[int] = None,
    ):
        """Fused embed -> decode round trip (the bench.py north-star
        workload): tokenized SMILES in, re-generated SMILES (and
        optionally the hclip embeddings) out, as ONE device program.
        Functionally encode_tokens + hclip_to_2d_batch, minus two
        device dispatches and the embedding host round-trip per batch
        (~29 ms each on the tunneled dev TPU)."""
        return fused_round_trip(
            _embed_decode_jit, self.params, self.config, self.embed_dim,
            tokenizer, token_indices,
            fill_in_from=fill_in_from, noise_scale=noise_scale,
            inv_temp=inv_temp, k=k, keep_special=keep_special,
            return_embeddings=return_embeddings, total_len=total_len,
            noise_fn=self._sample_noise, rng=self._next_rng(),
        )

    def points_to_2d_batch(
        self,
        atom_batch,
        coords_batch,
        tokenizer: TrieTokenizer,
        fill_in_from: str = "[SMILES]",
        noise_scale: float = 0.0,
        do_suffix: bool = False,
        inv_temp: float = 2.0,
        k: int = 100,
        keep_special: bool = False,
    ):
        h_clip = np.asarray(self.encode_points(atom_batch, coords_batch))
        return self.hclip_to_2d_batch(
            h_clip, tokenizer, fill_in_from, noise_scale, inv_temp, k,
            do_suffix, keep_special,
        )

    def points_to_2d(self, atoms, coords, tokenizer, **kw) -> str:
        atoms = np.asarray(atoms).reshape(1, -1)
        coords = np.asarray(coords, np.float32).reshape(1, -1, 3)
        return self.points_to_2d_batch(atoms, coords, tokenizer, do_suffix=True, **kw)[0]

    def complete_batch(
        self,
        prefixes: Sequence[str],
        tokenizer: TrieTokenizer,
        inv_temp: float = 2.0,
        k: int = 100,
        keep_special: bool = False,
        de_fim: bool = True,
    ) -> List[str]:
        """Text-prefix-conditioned generation (clip_e2e.py:744-770)."""
        token_rows = [tokenizer.tokenize_text(p, pad=False) for p in prefixes]
        b = len(token_rows)
        tgt = bucket_size(b)
        total_len = self.config.n_seq
        tokens0 = np.zeros((tgt, total_len), np.int32)
        lens = np.ones((tgt,), np.int32)
        for i, row in enumerate(token_rows):
            tokens0[i, : len(row)] = row
            lens[i] = len(row)
        out = generate_tokens(
            self.params.xformer,
            self.config.xformer_config,
            self._next_rng(),
            jnp.asarray(tokens0),
            jnp.asarray(lens),
            prefill_len=max(1, int(lens[:b].min())),
            total_len=total_len,
            stop_token=tokenizer.stop_token,
            pad_token=tokenizer.pad_token,
            k=k,
            inv_temp=inv_temp,
        )
        out = np.asarray(out[:b])
        return tokenizer.decode_batch(out, special=keep_special, de_fim=de_fim)

    # ------------------------------------------------- fingerprint heads
    def get_fp_pred_v2(self, token_indices, tokenizer: TrieTokenizer, fp_name: str):
        """Fingerprint logits from the SMILES clip token
        (clip_fp_e2e.py:521-527)."""
        h = self.encode_tokens(token_indices, tokenizer)
        h_tok = _clip_to_token_jit(self.params, self.config, h)
        head = self.params.fp_heads[fp_name]
        return h_tok @ head.w + head.b

    def get_fp_pred(self, token_indices, tokenizer: TrieTokenizer, atoms, coords,
                    fp_name: str):
        """Joint smiles/point fingerprint logits (clip_fp_e2e.py:509-519)."""
        h_s = _clip_to_token_jit(
            self.params, self.config, self.encode_tokens(token_indices, tokenizer)
        )
        h_p = _clip_to_token_jit(
            self.params, self.config, self.encode_points(atoms, coords)
        )
        head = self.params.fp_heads[fp_name]
        return ((h_s + h_p) / 2.0) @ head.w + head.b

    # --------------------------------------------- graph-token generation
    def smiles_to_graph_batch(
        self, smiles: Sequence[str], tokenizer: TrieTokenizer,
        inv_temp: float = 2.0, k: int = 100,
    ) -> List[str]:
        """Generate [GRAPH] token strings conditioned on SMILES prefixes
        (clip_fp_e2e.py:747-769)."""
        prefixes = [
            "[PREFIX][SMILES]" + s + "[GRAPH][SUFFIX][MIDDLE]" for s in smiles
        ]
        return self.complete_batch(
            prefixes, tokenizer, inv_temp=inv_temp, k=k,
            keep_special=True, de_fim=False,
        )

    def smiles_to_graph(self, smiles: str, tokenizer, inv_temp=2.0, k=100) -> str:
        return self.smiles_to_graph_batch([smiles], tokenizer, inv_temp, k)[0]

    def prefix_generate_batch(
        self, prefixes: Sequence[str], tokenizer: TrieTokenizer,
        inv_temp: float = 2.0, k: int = 100,
        keep_special: bool = False, de_fim: bool = True,
    ) -> List[str]:
        """FIM-style prefix completion (clip_fp_e2e.py:722-745)."""
        return self.complete_batch(
            ["[PREFIX]" + p + "[SUFFIX][MIDDLE]" for p in prefixes],
            tokenizer, inv_temp=inv_temp, k=k,
            keep_special=keep_special, de_fim=de_fim,
        )

    # -------------------------------------------------------- likelihood
    def hclip_and_tokens_to_likelihood(
        self, hclip, smiles: str, tokenizer: TrieTokenizer
    ):
        """Summed NLL that hclip decodes to `smiles` (clip_e2e.py:634-665)."""
        ids = tokenizer.tokenize_text(
            "[CLIP][UNK][SMILES][SUFFIX][MIDDLE]" + smiles + "[STOP]", pad=False
        )
        tokens = np.asarray([ids], np.int32)
        y_next = np.zeros_like(tokens)
        y_next[:, :-1] = tokens[:, 1:]
        for t in (
            tokenizer.clip_token,
            tokenizer.pad_token,
            tokenizer.smiles_token,
            tokenizer.unk_token,
            tokenizer.suffix_token,
            tokenizer.middle_token,
        ):
            y_next[y_next == t] = -1
        h = np.asarray(hclip, np.float32).reshape(1, -1)
        h_token = _clip_to_token_jit(self.params, self.config, jnp.asarray(h))
        return _likelihood_jit(
            self.params,
            self.config,
            jnp.asarray(tokens),
            jnp.asarray(y_next),
            h_token,
            tokenizer.unk_token,
        )

    def batch_smiles_to_s2s_likelihood(
        self, smiles: List[str], tokenizer: TrieTokenizer
    ) -> Tuple[jnp.ndarray, np.ndarray]:
        """SMILES -> hclip -> NLL of decoding back to the same SMILES
        (clip_e2e.py:667-742). Returns (nll over tokenizable rows, mask)."""
        rows, mask = [], []
        for smi in smiles:
            try:
                ids = tokenizer.tokenize_text(smi + "[STOP]", pad=False)
                if len(ids) <= tokenizer.n_seq - 5:
                    rows.append(ids)
                    mask.append(True)
                else:
                    mask.append(False)
            except KeyError:
                mask.append(False)
        mask = np.asarray(mask, bool)
        if not rows:
            return jnp.zeros((0,)), mask
        width = max(len(r) for r in rows)

        enc_tokens = np.zeros((len(rows), width + 1), np.int32)
        enc_tokens[:, 0] = tokenizer.smiles_token
        dec_tokens = np.zeros((len(rows), width + 5), np.int32)
        dec_tokens[:, :5] = [
            tokenizer.clip_token,
            tokenizer.unk_token,
            tokenizer.smiles_token,
            tokenizer.suffix_token,
            tokenizer.middle_token,
        ]
        for i, r in enumerate(rows):
            enc_tokens[i, 1 : 1 + len(r)] = r
            dec_tokens[i, 5 : 5 + len(r)] = r

        hclip = self.encode_tokens(enc_tokens, tokenizer)
        h_token = _clip_to_token_jit(self.params, self.config, hclip)

        y_next = np.zeros_like(dec_tokens)
        y_next[:, :-1] = dec_tokens[:, 1:]
        y_next[:, :4] = -1
        y_next[:, -1] = -1
        y_next[y_next == tokenizer.pad_token] = -1

        nll = _likelihood_jit(
            self.params,
            self.config,
            jnp.asarray(dec_tokens),
            jnp.asarray(y_next),
            h_token,
            tokenizer.unk_token,
        )
        return nll, mask

    # ------------------------------------------------------------- train
    def forward(
        self,
        raw_tokens,
        augmented_tokens,
        atoms,
        coords,
        tokenizer: TrieTokenizer,
        p_clip_emb_smi: float = 0.4,
    ):
        """Training forward (h_e3gnn, h_smiles, logits, bad_rows)."""
        return F.forward(
            self.params,
            self.config,
            self._next_rng(),
            jnp.asarray(np.asarray(raw_tokens, np.int32)),
            jnp.asarray(np.asarray(augmented_tokens, np.int32)),
            jnp.asarray(np.asarray(atoms)),
            jnp.asarray(np.asarray(coords, np.float32)),
            tokenizer.stop_token,
            tokenizer.unk_token,
            p_clip_emb_smi,
        )

    # In the reference, forward_dist is the DDP variant of forward
    # (clip_e2e.py:772-814); under JAX SPMD they are the same function.
    forward_dist = forward
