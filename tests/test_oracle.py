"""The naive-DFT oracle's OWN tests (VERDICT r3 weak #6).

Every parity test in this suite trusts ``kofft_tpu.ops.dft``; an
under-tested oracle undermines all of them, so it gets analytic vectors
with closed-form answers (the discipline the reference applies to its
naive engine, ``tests/bluestein.rs:33-47``): impulses, complex
exponentials, Parseval, and the snr_db edge cases.
"""

import numpy as np
import pytest

from kofft_tpu.ops.dft import dft, rdft, snr_db


def test_dft_impulse_is_flat():
    x = np.zeros(16)
    x[0] = 1.0
    assert np.allclose(dft(x), np.ones(16))


def test_dft_complex_exponential_is_delta():
    n, k = 32, 5
    x = np.exp(2j * np.pi * k * np.arange(n) / n)
    y = dft(x)
    want = np.zeros(n, complex)
    want[k] = n
    assert np.allclose(y, want, atol=1e-9)


def test_dft_inverse_roundtrip_and_scaling():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(24) + 1j * rng.standard_normal(24)
    y = dft(x)
    back = dft(y, inverse=True)            # applies the 1/n scaling
    assert np.allclose(back, x, atol=1e-10)
    # inverse of an impulse: constant 1/n
    e = np.zeros(8)
    e[0] = 1.0
    assert np.allclose(dft(e, inverse=True), np.full(8, 1 / 8))


def test_dft_axis_argument():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 8, 6))
    got = dft(x, axis=1)
    want = np.fft.fft(x, axis=1)
    assert np.allclose(got, want, atol=1e-9)


def test_dft_parseval():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(64) + 1j * rng.standard_normal(64)
    y = dft(x)
    assert np.isclose(np.sum(np.abs(y) ** 2),
                      64 * np.sum(np.abs(x) ** 2))


@pytest.mark.parametrize("n", [8, 9, 17])
def test_rdft_matches_numpy_rfft(n):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, n))
    assert np.allclose(rdft(x), np.fft.rfft(x), atol=1e-9)
    # axis argument threads through dft's moveaxis pair
    xt = np.ascontiguousarray(x.T)
    assert np.allclose(rdft(xt, axis=0), np.fft.rfft(xt, axis=0),
                       atol=1e-9)


def test_snr_db_known_ratio_and_edges():
    ref = np.ones(100)
    # error power 1e-4 of signal power -> exactly 40 dB
    got = ref + np.full(100, 1e-2)
    assert np.isclose(snr_db(ref, got), 40.0)
    assert snr_db(ref, ref) == float("inf")
    assert snr_db(np.zeros(4), np.ones(4)) == float("-inf")
