"""ctypes bindings for the native EXR codec hot path (native/exr_pack.cpp).

Loads native/libexr_pack.so when present (build with `make -C native`);
exr_codec.py falls back to its numpy reference implementation otherwise.
Both paths are bit-identical (tests/test_exr_codec.py::test_native_parity).
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libexr_pack.so"
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.exr_split_and_predict.argtypes = [u8p, u8p, ctypes.c_size_t]
    lib.exr_split_and_predict.restype = None
    lib.exr_unpredict_and_merge.argtypes = [u8p, u8p, ctypes.c_size_t]
    lib.exr_unpredict_and_merge.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def split_and_predict(data: bytes) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    dst = np.empty(len(data), dtype=np.uint8)
    lib.exr_split_and_predict(_as_u8p(src), _as_u8p(dst), len(data))
    return dst.tobytes()


def unpredict_and_merge(data: bytes) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    dst = np.empty(len(data), dtype=np.uint8)
    lib.exr_unpredict_and_merge(_as_u8p(src), _as_u8p(dst), len(data))
    return dst.tobytes()
