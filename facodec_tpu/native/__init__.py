"""ctypes bindings for the native data-loading runtime.

`load_wav_native(path, sr)` decodes + mono-mixes + resamples a WAV entirely
in C++ with the GIL released, so `load_batch` gets true parallel decoding
from an ordinary Python thread pool. Builds the shared library on first use
(`make` + g++, both baked into the image); callers fall back to the scipy
path when a toolchain isn't available (`facodec_tpu.train.data.load_wav`
does this automatically).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libfacodec_io.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load_library():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _DIR, "-s"], check=True,
                    capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.facodec_wav_read.restype = ctypes.c_int64
            lib.facodec_wav_read.argtypes = [
                ctypes.c_char_p, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


def available() -> bool:
    return _load_library() is not None


def load_wav_native(path: str, sr: int = 24000) -> Optional[np.ndarray]:
    """Decode a WAV to mono float32 at `sr`. Returns None when the native
    library is unavailable or the file is unsupported (caller falls back)."""
    lib = _load_library()
    if lib is None:
        return None
    p = path.encode()
    native_sr = ctypes.c_int32(0)
    n = lib.facodec_wav_read(p, sr, None, 0, ctypes.byref(native_sr))
    if n < 0:
        return None
    out = np.empty(int(n), np.float32)
    got = lib.facodec_wav_read(
        p, sr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, None
    )
    if got < 0:
        return None
    return out[: int(got)]


def load_batch(paths: Sequence[str], sr: int = 24000,
               workers: int = 8) -> List[Optional[np.ndarray]]:
    """Parallel decode (GIL released inside the C call)."""
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(lambda p: load_wav_native(p, sr), paths))
