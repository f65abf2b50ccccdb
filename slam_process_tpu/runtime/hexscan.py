"""ctypes binding + lazy build for the native hex scanner."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).with_name("hexscan.c")
_BUILD_DIR = Path(__file__).resolve().parents[2] / "build"
_LIB_PATH = _BUILD_DIR / "libhexscan.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _compile() -> Path:
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        os.environ.get("CC", "cc"),
        "-O3", "-march=native", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            raise RuntimeError("hexscan native build previously failed")
        if not _LIB_PATH.exists() or (
            _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
        ):
            try:
                _compile()
            except Exception as e:  # missing toolchain etc.
                _build_failed = True
                raise RuntimeError(f"hexscan build failed: {e}") from e
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.hexscan_tokenize.restype = ctypes.c_size_t
        lib.hexscan_tokenize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def tokenize(data: bytes) -> np.ndarray:
    """Native tokenizer: raw log bytes -> uint8 byte values."""
    lib = _load()
    n = len(data)
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    out = np.empty(n // 2 + 1, dtype=np.uint8)
    src = np.frombuffer(data, dtype=np.uint8)
    written = lib.hexscan_tokenize(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out[:written]
