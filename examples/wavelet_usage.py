"""Wavelet usage (reference examples/wavelet_usage.rs analog): compat
single-level transforms + the perfect-reconstruction DWT superset."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import kofft_tpu as kt

rng = np.random.default_rng(0)
x = rng.standard_normal(256).astype(np.float32)

# reference-compatible single level (symmetric reflection)
a, d = kt.wavelet_forward(x, "db4")
print("db4 approx/detail:", np.asarray(a).shape, np.asarray(d).shape)

# perfect-reconstruction orthogonal DWT (periodized)
a, d = kt.dwt(x, "db4")
back = np.asarray(kt.idwt(a, d, "db4"))
print(f"PR dwt/idwt max err: {np.abs(back - x).max():.2e}")

# multi-level Haar
approx, details = kt.multi_level_forward(x, 4, "haar")
rec = np.asarray(kt.multi_level_inverse(approx, details, "haar"))
print(f"4-level haar roundtrip max err: {np.abs(rec - x).max():.2e}")
