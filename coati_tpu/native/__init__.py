"""Native (C) host-side components.

`load_fast_matcher()` compiles fast_matcher.c once into a per-user cache
directory (cc -O3 -shared -fPIC; ~100 ms) and loads it via ctypes —
no pybind11/build-system dependency. Every consumer falls back to the
pure-Python implementation when no C compiler is available, so the
native layer is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import threading
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "fast_matcher.c")
_CANON_SRC = os.path.join(os.path.dirname(__file__), "fast_canon.c")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_canon_lib: Optional[ctypes.CDLL] = None
_canon_tried = False


def _cache_dir() -> str:
    # one cache root for the whole package (honors COATI_TPU_CACHE_DIR
    # and the reference-compatible S3_CACHE_DIR)
    from coati_tpu.common.artifacts import cache_dir

    path = os.path.join(cache_dir(), "native")
    os.makedirs(path, exist_ok=True)
    return path


def _compiler() -> Optional[str]:
    for cc in (os.environ.get("CC"), "cc", "gcc", "clang"):
        if cc and shutil.which(cc):
            return cc
    return None


def load_fast_matcher() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native matcher; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        lib = _compile_and_load(_SRC, "fast_matcher", pydll=False)
        if lib is None:
            return None
        lib.matcher_new.restype = ctypes.c_void_p
        lib.matcher_new.argtypes = []
        lib.matcher_free.argtypes = [ctypes.c_void_p]
        lib.matcher_add.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int32,
        ]
        lib.matcher_split.restype = ctypes.c_int32
        lib.matcher_split.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def _compile_and_load(src: str, tag: str, pydll: bool) -> Optional[ctypes.CDLL]:
    cc = _compiler()
    if cc is None or not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"{tag}_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so_path)
        except (subprocess.CalledProcessError, OSError):
            return None
    try:
        # PyDLL keeps the GIL held during calls — fast_canon.c uses
        # static scratch buffers and is NOT reentrant
        return ctypes.PyDLL(so_path) if pydll else ctypes.CDLL(so_path)
    except OSError:
        return None


def load_fast_canon() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native canonical-SMILES pipeline
    (fast_canon.c — parse/kekulize/perceive/rank/search/write,
    byte-identical to chem/graph_canon + chem/selfies_lite, ~30x the
    cold throughput); None if no C compiler is available."""
    global _canon_lib, _canon_tried
    with _lock:
        if _canon_lib is not None or _canon_tried:
            return _canon_lib
        _canon_tried = True
        lib = _compile_and_load(_CANON_SRC, "fast_canon", pydll=True)
        if lib is None:
            return None
        lib.canonical_smiles_native.restype = ctypes.c_int
        lib.canonical_smiles_native.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        _canon_lib = lib
        return _canon_lib
