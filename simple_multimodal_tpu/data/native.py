"""ctypes bindings for the native smmdata decode library.

Builds native/smmdata.cpp with g++ on first use (cached as
native/libsmmdata.so) and exposes single and thread-pool-batched WAV
decode+resample. Falls back silently to the numpy path when no compiler is
available — callers check ``available()``.
"""
import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "smmdata.cpp")
_SO = os.path.join(_ROOT, "native", "libsmmdata.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", "-pthread", _SRC, "-o", _SO],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.smm_decode_audio.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.smm_decode_audio.restype = ctypes.c_int
            lib.smm_decode_audio_batch.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
                ctypes.c_int, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            lib.smm_decode_audio_batch.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def decode_audio(path: str, target_rate: int, max_len: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.zeros(max_len, dtype=np.float32)
    lib.smm_decode_audio(
        str(path).encode(), target_rate, max_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def decode_audio_batch(paths: List[str], target_rate: int, max_len: int,
                       num_threads: Optional[int] = None) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    num_threads = num_threads or max(os.cpu_count() or 1, 1)
    encoded = [str(p).encode() + b"\0" for p in paths]
    offsets = np.zeros(len(paths), dtype=np.int64)
    pos = 0
    for i, e in enumerate(encoded):
        offsets[i] = pos
        pos += len(e)
    blob = b"".join(encoded)
    out = np.zeros((len(paths), max_len), dtype=np.float32)
    lib.smm_decode_audio_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(paths), target_rate, max_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
    )
    return out
