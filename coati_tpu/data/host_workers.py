"""Multiprocess host-side batch transformation.

The reference's input bottleneck is per-row RDKit canonicalization +
trie tokenization inside clip_ar_xform running on one core
(SURVEY.md §7 hard parts). This module fans the xform out over worker
processes with bounded read-ahead so a TPU slice at batch 160 x N stays
fed. The tokenizer is constructed ONCE per worker (vocab builds are not
free) and reused.

Usage:
    pool = XformWorkerPool(vocab_name="mar", n_seq=80,
                           xform_kwargs=dict(p_clip=0.9, ...))
    for batch in pool.map(raw_batches):   # raw stacked batches in,
        train_step(batch)                 # device-ready batches out
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Dict, Iterable, Iterator, Optional

_WORKER_STATE: dict = {}


def _worker_init(vocab_name: str, n_seq: int, xform_kwargs: dict, seed: int):
    import random

    from coati_tpu.data.xform import clip_ar_xform
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

    tokenizer = TrieTokenizer(n_seq=n_seq, **get_vocab(vocab_name))
    rng = random.Random(seed + mp.current_process().pid)
    _WORKER_STATE["fn"] = lambda batch: clip_ar_xform(
        batch, tokenizer=tokenizer, rng=rng, **xform_kwargs
    )


def _worker_apply(batch: Dict) -> Dict:
    return _WORKER_STATE["fn"](batch)


class XformWorkerPool:
    """Applies clip_ar_xform to raw stacked batches in worker processes."""

    def __init__(
        self,
        vocab_name: str,
        n_seq: int,
        xform_kwargs: Optional[dict] = None,
        n_workers: Optional[int] = None,
        read_ahead: int = 4,
        seed: int = 0,
    ):
        self.n_workers = n_workers or max(1, (mp.cpu_count() or 4) - 2)
        self.read_ahead = read_ahead
        ctx = mp.get_context("fork")
        self._pool = ctx.Pool(
            self.n_workers,
            initializer=_worker_init,
            initargs=(vocab_name, n_seq, xform_kwargs or {}, seed),
        )

    def map(self, raw_batches: Iterable[Dict]) -> Iterator[Dict]:
        """Ordered streaming map with bounded read-ahead."""
        yield from self._pool.imap(
            _worker_apply, raw_batches, chunksize=1
        )

    def close(self):
        self._pool.close()
        self._pool.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
