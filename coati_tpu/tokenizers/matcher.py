"""Leftmost-longest vocabulary matcher.

Splits text along the boundaries of known tokens, scanning left to right
and always taking the longest vocabulary token that starts at the current
position. Semantically equivalent to the HF-style trie splitter the
reference uses (coati/models/encoding/tokenizers/trie.py:39 — leftmost
start wins, longest match from that start via lookahead) but implemented
as a first-char-indexed length-descending scan: O(n * max_token_len) with
tiny constants, no trie bookkeeping.

Unmatched characters accumulate into passthrough spans (they later raise
KeyError at vocab lookup, as in the reference).
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterable, List


class VocabMatcher:
    """Pure-Python scan with an optional native (C byte-trie) fast path:
    the tokenizer is the host input-pipeline hot loop, so the inner match
    runs in coati_tpu/native/fast_matcher.c when a C compiler is present
    (~10x; disable with COATI_TPU_NO_NATIVE=1). The native path is only
    used for all-ASCII vocabularies (byte-level matching cannot bisect
    multibyte characters then)."""

    def __init__(self, tokens: Iterable[str] = ()):
        # first char -> list of candidate tokens, longest first
        self._by_first: dict[str, List[str]] = {}
        self._max_len = 0
        self._all_ascii = True
        self._native = None  # (lib, handle), built lazily
        self._native_dead = os.environ.get("COATI_TPU_NO_NATIVE") == "1"
        for t in tokens:
            self.add(t)

    def add(self, token: str) -> None:
        if not token:
            return
        if not token.isascii():
            self._all_ascii = False
        if self._native is not None:  # keep an existing native trie in sync
            lib, handle = self._native
            if token.isascii():
                raw = token.encode()
                lib.matcher_add(handle, raw, len(raw))
            else:
                self._drop_native()
        bucket = self._by_first.setdefault(token[0], [])
        if token not in bucket:
            bucket.append(token)
            bucket.sort(key=len, reverse=True)
            self._max_len = max(self._max_len, len(token))

    # ------------------------------------------------------------ native
    def _drop_native(self) -> None:
        if self._native is not None:
            lib, handle = self._native
            lib.matcher_free(handle)
            self._native = None
        self._native_dead = True

    def _ensure_native(self):
        if self._native is not None:
            return self._native
        if self._native_dead or not self._all_ascii:
            return None
        from coati_tpu.native import load_fast_matcher

        lib = load_fast_matcher()
        if lib is None:
            self._native_dead = True
            return None
        handle = lib.matcher_new()
        for bucket in self._by_first.values():
            for tok in bucket:
                raw = tok.encode()
                lib.matcher_add(handle, raw, len(raw))
        self._native = (lib, handle)
        return self._native

    def __del__(self):  # release the C trie
        try:
            if self._native is not None:
                self._native[0].matcher_free(self._native[1])
        except Exception:  # noqa: BLE001 - interpreter teardown
            pass

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_native"] = None  # rebuilt lazily after unpickling
        return state

    def _split_native(self, text: str):
        native = self._ensure_native()
        if native is None:
            return None
        lib, handle = native
        raw = text.encode()
        n = len(raw)
        if n == 0:
            return []
        starts = (ctypes.c_int32 * n)()
        ends = (ctypes.c_int32 * n)()
        flags = (ctypes.c_uint8 * n)()
        count = lib.matcher_split(handle, raw, n, starts, ends, flags, n)
        return [raw[starts[i] : ends[i]].decode() for i in range(count)]

    def _match_at(self, text: str, pos: int) -> str | None:
        bucket = self._by_first.get(text[pos])
        if not bucket:
            return None
        window = text[pos : pos + self._max_len]
        for cand in bucket:  # longest first
            if window.startswith(cand):
                return cand
        return None

    def split(self, text: str) -> List[str]:
        """Split text into [vocab tokens and passthrough spans], preserving
        all characters (''.join(result) == text)."""
        if text.isascii():
            native_out = self._split_native(text)
            if native_out is not None:
                return native_out
        out: List[str] = []
        span_start = 0  # start of current passthrough span
        pos = 0
        n = len(text)
        while pos < n:
            match = self._match_at(text, pos)
            if match is None:
                pos += 1
                continue
            if pos > span_start:
                out.append(text[span_start:pos])
            out.append(match)
            pos += len(match)
            span_start = pos
        if span_start < n:
            out.append(text[span_start:])
        return out


class Trie(VocabMatcher):
    """Drop-in shim for the reference Trie class
    (coati/models/encoding/tokenizers/trie.py:5 — add :14, split :39,
    cut_text :192) so reference-facing user code ports unchanged. The
    matching itself delegates to VocabMatcher's leftmost-longest scan
    (which fixes the HF-trie lookahead bug; see module docstring)."""

    def split(self, text: str) -> List[str]:
        return super().split(text)

    def cut_text(self, text: str, offsets: List[int]) -> List[str]:
        """Split `text` at the given offsets, dropping zero-width cuts
        (trie.py:192-214)."""
        offsets = list(offsets) + [len(text)]
        tokens: List[str] = []
        start = 0
        for end in offsets:
            if start > end:
                raise RuntimeError(
                    "cut_text offsets must be non-decreasing"
                )
            if start == end:
                continue
            tokens.append(text[start:end])
            start = end
        return tokens
