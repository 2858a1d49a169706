"""STFT → spectrogram → ISTFT pipeline (reference examples/stft_usage.rs +
spectrogram.rs analogs) — BASELINE.json config #3 (Hann, 75% overlap)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import kofft_tpu as kt

sr = 16000
t = np.arange(10 * sr) / sr   # 10 s; scale up for the full 10-min config
sig = (0.5 * np.sin(2 * np.pi * 440 * t)
       + 0.2 * np.sin(2 * np.pi * 2000 * t)).astype(np.float32)

win, hop = 1024, 256          # 75% overlap
w = kt.window.hann(win)

frames = kt.stft(sig, w, hop)
print("frames:", np.asarray(frames).shape)

mags, peak = kt.visual.stft_magnitudes(sig, win, hop)
print(f"magnitudes: {mags.shape}, peak {peak:.2f}")

back = np.asarray(kt.istft(frames, w, hop, length=len(sig)))
err = np.abs(back[win:-win] - sig[win:-win]).max()
print(f"istft roundtrip (interior) max err: {err:.2e}")

# streaming: push frames one at a time, flush the tail
stream = kt.IstftStream(win, hop, w)
f = np.asarray(frames)
chunks = [stream.push_frame(f[i]) for i in range(f.shape[0])]
chunks.append(stream.flush())
streamed = np.concatenate(chunks)
print("streaming == offline:",
      np.allclose(streamed[: len(back)], back, atol=1e-4))
