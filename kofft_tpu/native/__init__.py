"""kofft_tpu.native — C++ host runtime (ctypes bindings, auto-built).

Provides fast host-side equivalents of the reference's Rust runtime pieces:
PNG encoding (image crate role), WAV PCM decode (hound role), and the
streaming overlap-add core (IstftStream's rolling buffers). All callers
have pure-Python fallbacks; ``available()`` reports whether the shared
library could be built/loaded.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "kofft_host.cpp"
_LIB = _DIR / "libkofft_host.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the shared library (g++ -O3 -lz). Returns success."""
    if _LIB.exists() and not force and \
            _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-lz", "-o", str(_LIB)],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not build():
            return None
        lib = ctypes.CDLL(str(_LIB))
        lib.kofft_png_encode.restype = ctypes.c_int64
        lib.kofft_png_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p)]
        lib.kofft_free.argtypes = [ctypes.c_void_p]
        lib.kofft_wav_decode_i16.restype = ctypes.c_int64
        lib.kofft_wav_decode_i16.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.kofft_ola_new.restype = ctypes.c_void_p
        lib.kofft_ola_new.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_void_p]
        lib.kofft_ola_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_void_p]
        lib.kofft_ola_flush.restype = ctypes.c_int64
        lib.kofft_ola_flush.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.kofft_ola_delete.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def png_encode(img: np.ndarray) -> Optional[bytes]:
    """RGB (H, W, 3) uint8/uint16 -> PNG bytes, or None if unavailable.
    Byte-identical to kofft_tpu.utils.image.encode_png."""
    lib = _load()
    if lib is None:
        return None
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3:
        return None
    if img.dtype == np.uint8:
        depth, raw = 8, np.ascontiguousarray(img)
    elif img.dtype == np.uint16:
        depth, raw = 16, np.ascontiguousarray(img.astype(">u2"))
    else:
        return None
    out = ctypes.c_void_p()
    n = lib.kofft_png_encode(raw.ctypes.data_as(ctypes.c_void_p),
                             img.shape[1], img.shape[0], depth,
                             ctypes.byref(out))
    if n <= 0:
        return None
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.kofft_free(out)


def wav_decode_i16(data: bytes):
    """WAV bytes -> (samples f32 interleaved, sample_rate, channels) or
    None. Reference hound i16 semantics."""
    lib = _load()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(data, len(data))
    out = ctypes.c_void_p()
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    n = lib.kofft_wav_decode_i16(buf, len(data), ctypes.byref(out),
                                 ctypes.byref(sr), ctypes.byref(ch))
    if n < 0:
        return None
    try:
        arr = np.ctypeslib.as_array(
            ctypes.cast(out, ctypes.POINTER(ctypes.c_float)),
            shape=(n,)).copy()
    finally:
        lib.kofft_free(out)
    return arr, int(sr.value), int(ch.value)


class NativeOla:
    """Streaming overlap-add state in C++ (reference IstftStream rolling
    OLA, stft.rs:453-519). Push time-domain frames, receive hop chunks."""

    def __init__(self, win: int, hop: int, window: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        w = np.ascontiguousarray(window, dtype=np.float32)
        if w.shape != (win,):
            raise ValueError("window length must equal win")
        self._lib = lib
        self._st = lib.kofft_ola_new(win, hop,
                                     w.ctypes.data_as(ctypes.c_void_p))
        if not self._st:
            raise ValueError("invalid win/hop")
        self._win, self._hop = win, hop

    def push(self, frame: np.ndarray) -> np.ndarray:
        f = np.ascontiguousarray(frame, dtype=np.float32)
        if f.shape != (self._win,):
            raise ValueError(f"frame must have length {self._win}")
        out = np.empty(self._hop, np.float32)
        self._lib.kofft_ola_push(self._st,
                                 f.ctypes.data_as(ctypes.c_void_p),
                                 out.ctypes.data_as(ctypes.c_void_p))
        return out

    def flush(self) -> np.ndarray:
        out = np.empty(max(0, self._win - self._hop), np.float32)
        n = self._lib.kofft_ola_flush(
            self._st, out.ctypes.data_as(ctypes.c_void_p))
        return out[:n]

    def __del__(self):
        st = getattr(self, "_st", None)
        if st:
            self._lib.kofft_ola_delete(st)
            self._st = None
