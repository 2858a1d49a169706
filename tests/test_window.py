"""Window function semantics (reference src/window.rs tests + conventions)."""

import numpy as np
import pytest

from kofft_tpu.ops import window


def test_hann_periodic():
    w = window.hann(8)
    assert w.shape == (8,)
    assert abs(w[0]) < 1e-6          # reference test: w[0] == 0
    assert abs(w[4] - 1.0) < 1e-6    # reference test: w[len/2] == 1


def test_hamming_range():
    w = window.hamming(64)
    assert np.all(w >= 0.0) and np.all(w <= 1.0)
    assert abs(w[0] - 0.08) < 1e-6   # periodic convention endpoint


def test_blackman_matches_formula():
    n = 32
    w = window.blackman(n)
    i = np.arange(n) / n
    ref = 0.42 - 0.5 * np.cos(2 * np.pi * i) + 0.08 * np.cos(4 * np.pi * i)
    np.testing.assert_allclose(w, ref, atol=1e-6)


def test_kaiser_matches_numpy():
    w = window.kaiser(33, beta=8.6)
    ref = np.kaiser(33, 8.6)
    np.testing.assert_allclose(w, ref, rtol=1e-5, atol=1e-6)


def test_bartlett_matches_numpy():
    np.testing.assert_allclose(window.bartlett(17), np.bartlett(17),
                               rtol=1e-6, atol=1e-6)


def test_tukey_limits():
    # alpha=0 -> rectangular; alpha=1 -> hann-like (symmetric)
    np.testing.assert_allclose(window.tukey(16, 0.0), np.ones(16))
    w = window.tukey(65, 1.0)
    assert abs(w[0]) < 1e-6 and abs(w[32] - 1.0) < 1e-6


def test_bohman_standard():
    w = window.bohman(65)
    assert abs(w[0]) < 1e-6 and abs(w[64]) < 1e-6
    assert abs(w[32] - 1.0) < 1e-6
    assert np.all(w >= -1e-7)  # the snapshot defect we fixed produced <0


def test_nuttall_endpoints():
    w = window.nuttall(65)
    assert w[0] == pytest.approx(0.0, abs=1e-6)
    assert w[32] == pytest.approx(1.0, abs=1e-5)


def test_get_window_dispatch():
    np.testing.assert_array_equal(window.get_window("hann", 16),
                                  window.hann(16))
    np.testing.assert_array_equal(window.get_window(("kaiser", 5.0), 16),
                                  window.kaiser(16, 5.0))
    with pytest.raises(Exception):
        window.get_window("nope", 16)


def test_window_cache_identity():
    """Same table object returned on the warm call (analog of the
    reference's Arc-identity twiddle test, tests/static_twiddles.rs)."""
    a = window.hann(128)
    b = window.hann(128)
    assert a is b
