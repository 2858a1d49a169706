"""Float64 numpy reference implementations for tests (no scipy needed)."""

import numpy as np


def analytic_ref(x):
    """Analytic signal via FFT one-sided doubling (reference
    hilbert.rs:13-47 semantics) in float64."""
    x = np.asarray(x, np.float64)
    n = x.shape[-1]
    f = np.fft.fft(x)
    g = np.zeros(n)
    g[0] = 1.0
    if n % 2 == 0:
        g[n // 2] = 1.0
        g[1: n // 2] = 2.0
    else:
        g[1: (n - 1) // 2 + 1] = 2.0
    return np.fft.ifft(f * g)


def wavelet_forward_ref(x, h, g):
    """Reference analysis with whole-point symmetric reflection
    (wavelet.rs:168-186)."""
    x = np.asarray(x, np.float64)
    n = len(x)
    taps = len(h)

    def reflect(i):
        while i < 0 or i >= n:
            i = -i if i < 0 else 2 * (n - 1) - i
        return i

    half = n // 2
    a = np.zeros(half)
    d = np.zeros(half)
    for i in range(half):
        for k in range(taps):
            v = x[reflect(2 * i + k)]
            a[i] += h[k] * v
            d[i] += g[k] * v
    return a, d


def wavelet_inverse_ref(a, d, gs, hs):
    """Reference synthesis scatter-add (wavelet.rs:189-224)."""
    a = np.asarray(a, np.float64)
    d = np.asarray(d, np.float64)
    n = len(a)
    ln = 2 * n
    out = np.zeros(ln)

    def reflect(i):
        while i < 0 or i >= ln:
            i = -i if i < 0 else 2 * (ln - 1) - i
        return i

    for i in range(n):
        for k in range(len(gs)):
            out[reflect(2 * i + k)] += gs[k] * a[i] + hs[k] * d[i]
    return out
