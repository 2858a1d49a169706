"""Streaming spectrogram state: push samples -> RGBA rows.

Reference: the web-spectrogram WASM ``State::compute_frame``
(``web-spectrogram/src/lib.rs:191-234``): WIN_LEN=1024, HOP=512,
FLOOR_DB=-80; accumulate samples, once >= WIN_LEN window-multiply + FFT,
take the half-spectrum magnitudes, track the running max (init 1e-12),
colorize each bin to RGBA (alpha=255), drain HOP samples. Default palette
Rainbow; ``set_colormap``/``reset`` mirror the WASM exports
(``lib.rs:238-252``).
"""

from __future__ import annotations

import threading

import numpy as np

from ..ops import stft as _stft
from ..ops import window as _window
from ..visual.spectrogram import Colormap, color_from_magnitude_u8

WIN_LEN = 1024
HOP = WIN_LEN // 2
FLOOR_DB = -80.0


class StreamingSpectrogram:
    """Stateful streaming spectrogram: ring buffer + per-frame transform +
    running max (the streaming/stateful API contract from SURVEY.md §3.4)."""

    def __init__(self, win_len: int = WIN_LEN, hop: int = HOP,
                 floor_db: float = FLOOR_DB,
                 colormap: str = "rainbow"):
        self.win_len = win_len
        self.hop = hop
        self.floor_db = floor_db
        self._window = _window.hann(win_len)
        self._cmap = Colormap.parse(colormap)
        self._buf = np.zeros(0, dtype=np.float32)
        self._max_mag = 1e-12
        # one state instance is shared across ThreadingHTTPServer handler
        # threads; without the lock two concurrent pushes race on the
        # ring buffer (dropped samples / double-drained hop)
        self._lock = threading.Lock()

    def set_colormap(self, name: str) -> None:
        with self._lock:
            self._cmap = Colormap.parse(name)

    def reset(self) -> None:
        with self._lock:
            self._buf = np.zeros(0, dtype=np.float32)
            self._max_mag = 1e-12
            self._cmap = Colormap.RAINBOW

    def compute_frame(self, samples) -> np.ndarray:
        """Push samples; returns an RGBA row (win_len//2, 4) uint8, or an
        empty array when fewer than win_len samples are buffered.
        Thread-safe (serialized on the instance lock)."""
        s = np.asarray(samples, dtype=np.float32).ravel()
        with self._lock:
            return self._compute_frame_locked(s)

    def _compute_frame_locked(self, s) -> np.ndarray:
        self._buf = np.concatenate([self._buf, s])
        if self._buf.size < self.win_len:
            return np.zeros((0,), dtype=np.uint8)
        fr, fi = _stft.frame_split(self._buf[: self.win_len], self._window,
                                   start=0)
        half = self.win_len // 2
        mags = np.sqrt(np.asarray(fr)[:half] ** 2
                       + np.asarray(fi)[:half] ** 2)
        self._max_mag = max(self._max_mag, float(mags.max(initial=0.0)))
        rgb = color_from_magnitude_u8(mags, self._max_mag, self.floor_db,
                                      self._cmap)
        row = np.concatenate(
            [rgb, np.full((half, 1), 255, np.uint8)], axis=1)
        self._buf = self._buf[self.hop:]
        return row.reshape(-1)
