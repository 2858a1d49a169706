"""Tiled-layout spectral pipeline: fft -> pointwise filter -> ifft with
the planes kept in the phased kernel's native (m, m) tiling end to end.

Flat row-major order of the tiled planes IS the 1-D signal/spectrum
order, so a spectral mask applies to the tiled planes directly and the
inverse consumes them without any layout copy — eager batched calls
skip the flat<->tiled relayout XLA cannot elide across call boundaries
(ops/fft.py:fft_split_tiled)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import kofft_tpu as kt

n = 1 << 14                      # tiled layout serves n = m*m
m, m2 = kt.tiled_shape(n)
assert m == m2

rng = np.random.default_rng(0)
batch = 4
x = (rng.standard_normal((batch, n))
     + 1j * rng.standard_normal((batch, n))).astype(np.complex64)

# tile once at the pipeline edge: reshape, no data movement semantics
ar = np.ascontiguousarray(x.real).reshape(batch, m, m)
ai = np.ascontiguousarray(x.imag).reshape(batch, m, m)

# low-pass mask in the tiled layout (flat index k = row*m + col)
k = np.arange(n).reshape(m, m)
keep = np.minimum(k, n - k) < n // 8          # two-sided band
mask = keep.astype(np.float32)

sr, si = kt.fft_split_tiled(ar, ai)            # tiled spectrum
fr = np.asarray(sr) * mask                     # pointwise, still tiled
fi = np.asarray(si) * mask
yr, yi = kt.ifft_split_tiled(fr, fi)           # back to tiled signal

y = (np.asarray(yr) + 1j * np.asarray(yi)).reshape(batch, n)

# oracle: the same filter through numpy
want = np.fft.ifft(np.fft.fft(x.astype(np.complex128))
                   * keep.reshape(n))
err = np.abs(y - want).max()
print(f"tiled fft->mask->ifft ({batch}x{n}): max err vs numpy {err:.2e}")
assert err < 1e-3
print("tiled pipeline OK")
