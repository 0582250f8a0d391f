"""ctypes bridge to the C++ BPE core (native/bpe.cpp).

Compiled on demand with g++ and cached next to the package; loading or
compilation failure falls back to the pure-Python merge loop in clip_bpe.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "bpe.cpp",
)
_LIB_CACHE: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB_CACHE, _LIB_FAILED
    if _LIB_CACHE is not None or _LIB_FAILED:
        return _LIB_CACHE
    so_path = os.path.join(os.path.dirname(_SRC), "libsdtpu_bpe.so")
    try:
        if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(_SRC):
            tmp = so_path + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.bpe_new_table.restype = ctypes.c_void_p
        lib.bpe_new_table.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.bpe_free_table.argtypes = [ctypes.c_void_p]
        lib.bpe_encode_word.restype = ctypes.c_int32
        lib.bpe_encode_word.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        _LIB_CACHE = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logger.info("native BPE unavailable (%s); using pure Python", e)
        _LIB_FAILED = True
    return _LIB_CACHE


class NativeBPE:
    """Vocab-id-space BPE: every symbol (single char, char</w>, merged token)
    is addressed by its vocab id, so the C loop emits final token ids."""

    def __init__(self, vocab: Dict[str, int], merges: List[Tuple[str, str]]):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native BPE library unavailable")
        self._lib = lib
        left = np.asarray([vocab[a] for a, b in merges], np.int32)
        right = np.asarray([vocab[b] for a, b in merges], np.int32)
        merged = np.asarray([vocab[a + b] for a, b in merges], np.int32)
        self._table = ctypes.c_void_p(
            lib.bpe_new_table(
                left.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                right.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                merged.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(merges),
            )
        )
        self._buf = np.empty(4096, np.int32)

    def __del__(self):
        try:
            if getattr(self, "_table", None):
                self._lib.bpe_free_table(self._table)
        except Exception:
            pass

    def encode_word(self, sym_ids: List[int]) -> List[int]:
        arr = np.asarray(sym_ids, np.int32)
        n = self._lib.bpe_encode_word(
            self._table,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(arr),
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(self._buf),
        )
        if n < 0:  # pragma: no cover
            raise RuntimeError("BPE output buffer overflow")
        return self._buf[:n].tolist()


def available() -> bool:
    return _load_lib() is not None
