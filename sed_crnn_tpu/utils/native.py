"""ctypes bindings for the native C++ host frontend (`native/logmel.cpp`).

Builds the shared library on first use with g++ (cached under
``native/build/``; no pybind11 in this image, hence the C ABI + ctypes).
Used as (a) a fast host-side featurizer when no accelerator is present —
the role librosa's C internals play for the reference — and (b) an
independent parity oracle for the device kernels."""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "logmel.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "liblogmel.so")


def native_available() -> bool:
    return os.path.exists(_LIB) or (shutil.which("g++") is not None and os.path.exists(_SRC))


def build_library(force: bool = False) -> str:
    if os.path.exists(_LIB) and not force:
        src_mtime = os.path.getmtime(_SRC) if os.path.exists(_SRC) else 0
        if os.path.getmtime(_LIB) >= src_mtime:
            return _LIB
    if shutil.which("g++") is None:
        raise RuntimeError("g++ not available; cannot build native logmel library")
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB,
    ]
    subprocess.check_call(cmd)
    return _LIB


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(build_library())
    lib.logmel_num_frames.restype = ctypes.c_int64
    lib.logmel_num_frames.argtypes = [ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.logmel_extract.restype = ctypes.c_int64
    lib.logmel_extract.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.POINTER(ctypes.c_float),
    ]
    lib.wav_read_mono.restype = ctypes.c_int64
    lib.wav_read_mono.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.logmel_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.framer_create.restype = ctypes.c_void_p
    lib.framer_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.framer_destroy.argtypes = [ctypes.c_void_p]
    for fn in ("framer_feed", "framer_flush"):
        g = getattr(lib, fn)
        g.restype = ctypes.c_int64
    lib.framer_feed.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.framer_flush.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.framer_capacity.restype = ctypes.c_int64
    lib.framer_capacity.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    return lib


def log_mel_native(
    pcm: np.ndarray,
    sr: int = 44100,
    n_fft: int = 2048,
    hop: int = 1024,
    n_mels: int = 40,
    center: bool = True,
    log_floor: Optional[float] = None,
) -> np.ndarray:
    """(n_samples,) float32 -> (n_frames, n_mels) float32 log-mel energies."""
    lib = _lib()
    pcm = np.ascontiguousarray(pcm, dtype=np.float32)
    n_frames = lib.logmel_num_frames(len(pcm), n_fft, hop, int(center))
    out = np.empty((max(n_frames, 0), n_mels), dtype=np.float32)
    if n_frames <= 0:
        return out
    written = lib.logmel_extract(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pcm), sr, n_fft, hop, n_mels, int(center),
        -1.0 if log_floor is None else float(log_floor),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if written < 0:
        raise ValueError(
            f"native logmel rejected arguments (n_fft={n_fft}, hop={hop}, "
            f"n_mels={n_mels} must all be positive)"
        )
    return out[:written]


def wav_read_mono_native(path: str) -> Tuple[np.ndarray, int]:
    lib = _lib()
    buf = ctypes.POINTER(ctypes.c_float)()
    sr = ctypes.c_int(0)
    n = lib.wav_read_mono(path.encode(), ctypes.byref(buf), ctypes.byref(sr))
    if n < 0:
        raise ValueError(f"native wav reader failed on {path}")
    try:
        out = np.ctypeslib.as_array(buf, shape=(n,)).copy()
    finally:
        lib.logmel_free(buf)
    return out, sr.value


class StreamingFramer:
    """Incremental librosa-center framing of a live PCM stream (the native
    `StreamFramer`, `native/logmel.cpp`). Feed arbitrary chunks; complete
    `(k, n_fft)` float32 frame blocks come back as soon as enough samples
    exist; `flush()` applies the right reflect pad and emits the tail.
    The concatenated output equals `ops/stft.py::frame_signal` on the whole
    signal, bit for bit (tested). Single-use after flush."""

    def __init__(self, n_fft: int = 2048, hop: int = 1024, center: bool = True):
        self._lib = _lib()
        self._h = self._lib.framer_create(n_fft, hop, int(center))
        if not self._h:
            raise ValueError(f"invalid framer params n_fft={n_fft} hop={hop}")
        self.n_fft, self.hop, self.center = n_fft, hop, center
        self._flushed = False

    def _drain(self, call, pcm: Optional[np.ndarray]) -> np.ndarray:
        n = 0 if pcm is None else len(pcm)
        cap = self._lib.framer_capacity(self._h, n)
        out = np.empty((cap, self.n_fft), dtype=np.float32)
        optr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if pcm is None:
            k = call(self._h, optr, cap)
        else:
            pptr = pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            k = call(self._h, pptr, n, optr, cap)
        if k < 0:
            raise ValueError(
                "streaming framer error (center mode needs more than "
                "n_fft/2 samples before flush)"
            )
        return out[:k]

    def feed(self, pcm: np.ndarray) -> np.ndarray:
        if self._flushed:
            raise RuntimeError("framer already flushed")
        pcm = np.ascontiguousarray(pcm, dtype=np.float32)
        return self._drain(self._lib.framer_feed, pcm)

    def flush(self) -> np.ndarray:
        if self._flushed:
            raise RuntimeError("framer already flushed")
        self._flushed = True
        return self._drain(self._lib.framer_flush, None)

    def close(self):
        if self._h:
            self._lib.framer_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class PythonFramer:
    """Pure-numpy fallback with `StreamingFramer`'s exact contract and
    framing semantics (librosa-center reflect pads, same frame boundaries),
    for hosts without a C++ toolchain. Parity with the native framer and
    with `ops/stft.py::frame_signal` is pinned in `tests/test_serve.py`."""

    def __init__(self, n_fft: int = 2048, hop: int = 1024, center: bool = True):
        if n_fft <= 0 or hop <= 0:
            raise ValueError(f"invalid framer params n_fft={n_fft} hop={hop}")
        self.n_fft, self.hop, self.center = n_fft, hop, center
        self._pad = n_fft // 2 if center else 0
        self._buf = np.empty(0, np.float32)   # padded-signal suffix
        self._raw = np.empty(0, np.float32)   # raw head until left pad exists
        self._tail = np.empty(0, np.float32)  # last pad+1 raw samples
        self._left_padded = not center
        self._flushed = False

    def _drain(self) -> np.ndarray:
        if self._buf.size < self.n_fft:
            return np.empty((0, self.n_fft), np.float32)
        n = (self._buf.size - self.n_fft) // self.hop + 1
        idx = np.arange(n)[:, None] * self.hop + np.arange(self.n_fft)[None, :]
        frames = self._buf[idx]
        self._buf = self._buf[n * self.hop:]
        return frames

    def feed(self, pcm: np.ndarray) -> np.ndarray:
        if self._flushed:
            raise RuntimeError("framer already flushed")
        pcm = np.ascontiguousarray(pcm, dtype=np.float32).ravel()
        if self._pad:
            t = np.concatenate([self._tail, pcm])
            self._tail = t[-(self._pad + 1):]
        if not self._left_padded:
            self._raw = np.concatenate([self._raw, pcm])
            if self._raw.size <= self._pad:
                return np.empty((0, self.n_fft), np.float32)
            head = self._raw[1 : self._pad + 1][::-1]
            self._buf = np.concatenate([head, self._raw])
            self._raw = np.empty(0, np.float32)
            self._left_padded = True
        else:
            self._buf = np.concatenate([self._buf, pcm])
        return self._drain()

    def flush(self) -> np.ndarray:
        if self._flushed:
            raise RuntimeError("framer already flushed")
        self._flushed = True
        if not self.center:
            return self._drain()
        if not self._left_padded:
            raise ValueError(
                "streaming framer error (center mode needs more than "
                "n_fft/2 samples before flush)"
            )
        right = self._tail[:-1][::-1][: self._pad]
        self._buf = np.concatenate([self._buf, right])
        return self._drain()

    def close(self):
        pass


def make_framer(n_fft: int = 2048, hop: int = 1024, center: bool = True):
    """The native streaming framer when a toolchain is available, else the
    numpy fallback — identical contract either way."""
    if native_available():
        try:
            return StreamingFramer(n_fft, hop, center)
        except Exception:
            pass
    return PythonFramer(n_fft, hop, center)
