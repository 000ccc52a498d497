"""ctypes binding for the C++ BPE encoder (native/bpe.cc).

The reference's HF tokenizer runs its hot path in Rust; this is the
rgrg_tpu host-runtime equivalent. The C++ side only handles ASCII input
(its pre-tokenizer replicates GPT-2's pattern for the ASCII subset and
returns a sentinel otherwise); the caller keeps the exact Python/regex
path for everything else, so results are identical by construction and
pinned by fuzz tests (tests/test_text.py)."""

from __future__ import annotations

import ctypes
import os
import weakref
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "librgrg_host.so"),
]

_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    for path in _LIB_PATHS:
        if os.path.exists(path):
            lib = ctypes.CDLL(os.path.abspath(path))
            if not hasattr(lib, "rgrg_bpe_create"):
                continue  # stale .so built before bpe.cc existed
            lib.rgrg_bpe_create.restype = ctypes.c_void_p
            lib.rgrg_bpe_create.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32)]
            lib.rgrg_bpe_destroy.argtypes = [ctypes.c_void_p]
            lib.rgrg_bpe_encode.restype = ctypes.c_int
            lib.rgrg_bpe_encode.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
            _lib = lib
            break
    return _lib


class NativeBpe:
    """Owns one C++ tokenizer context. Falls back to None (caller keeps
    the Python path) when the library or any vocab entry is missing."""

    def __init__(self, handle, lib):
        self._handle = handle
        self._lib = lib
        # destroy with the owning tokenizer, not at interpreter teardown
        self._finalizer = weakref.finalize(
            self, lib.rgrg_bpe_destroy, handle)

    @classmethod
    def build(cls, encoder: Dict[str, int],
              merges: Sequence[Tuple[str, str]],
              byte_encoder: Dict[int, str]) -> Optional["NativeBpe"]:
        lib = _load()
        if lib is None:
            return None
        byte_to_id = np.full(256, -1, np.int32)
        for b, ch in byte_encoder.items():
            tid = encoder.get(ch)
            if tid is None:  # vocab without the full byte alphabet
                return None
            byte_to_id[b] = tid
        abm = np.empty((max(len(merges), 1), 3), np.int32)
        for r, (a, b) in enumerate(merges):
            ia, ib, im = encoder.get(a), encoder.get(b), encoder.get(a + b)
            if ia is None or ib is None or im is None:
                return None  # inconsistent files: keep the Python path
            abm[r] = (ia, ib, im)
        handle = lib.rgrg_bpe_create(
            abm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(merges),
            byte_to_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if not handle:
            return None
        return cls(handle, lib)

    def encode_ascii(self, text: str) -> Optional[List[int]]:
        """ids for ASCII text; None when the C++ side can't take it
        (non-ASCII sentinel) and the caller must use the Python path."""
        raw = text.encode("ascii")
        out = np.empty(max(len(raw), 1), np.int32)
        n = self._lib.rgrg_bpe_encode(
            self._handle, ctypes.cast(raw, ctypes.POINTER(ctypes.c_uint8)),
            len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.shape[0])
        if n < 0:
            return None
        return out[:n].tolist()


def native_bpe_available() -> bool:
    return _load() is not None
