"""Wavelet parity vs reference-semantics float64 oracles
(reference src/wavelet.rs tests + multi-level driver)."""

import numpy as np
import pytest

from kofft_tpu.ops import wavelet as W
from kofft_tpu.ops.dft import snr_db
from scipy_free_ref import wavelet_forward_ref, wavelet_inverse_ref

SNR = 90.0


def test_haar_roundtrip(rng):
    x = rng.standard_normal(64).astype(np.float32)
    a, d = W.haar_forward(x)
    np.testing.assert_allclose(a, (x[0::2] + x[1::2]) / 2, rtol=1e-6)
    np.testing.assert_allclose(d, (x[0::2] - x[1::2]) / 2, rtol=1e-6)
    back = W.haar_inverse(a, d)
    np.testing.assert_allclose(back, x, rtol=1e-5, atol=1e-6)


def test_haar_batched(rng):
    x = rng.standard_normal((3, 32)).astype(np.float32)
    a, d = W.haar_forward(x)
    assert a.shape == (3, 16) and d.shape == (3, 16)
    back = W.haar_inverse(a, d)
    np.testing.assert_allclose(back, x, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("family", ["db2", "db4", "sym4", "coif1"])
def test_analysis_matches_reference(rng, family):
    x = rng.standard_normal(64).astype(np.float32)
    h, g, _, _ = W.FAMILIES[family]
    ra, rd = wavelet_forward_ref(x, h, g)
    a, d = W.wavelet_forward(x, family)
    assert snr_db(ra, np.asarray(a)) > SNR, family
    assert snr_db(rd, np.asarray(d)) > SNR, family


@pytest.mark.parametrize("family", ["db2", "db4", "sym4", "coif1"])
def test_synthesis_matches_reference(rng, family):
    a = rng.standard_normal(32).astype(np.float32)
    d = rng.standard_normal(32).astype(np.float32)
    _, _, gs, hs = W.FAMILIES[family]
    ref = wavelet_inverse_ref(a, d, gs, hs)
    got = np.asarray(W.wavelet_inverse(a, d, family))
    assert snr_db(ref, got) > SNR, family


def test_multi_level_haar_roundtrip(rng):
    x = rng.standard_normal(64).astype(np.float32)
    approx, details = W.multi_level_forward(x, 3, "haar")
    assert np.asarray(approx).shape[-1] == 8
    assert len(details) == 3
    back = W.multi_level_inverse(approx, details, "haar")
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-4, atol=1e-5)


def test_multi_level_odd_length(rng):
    """Odd-length levels repeat the last sample (wavelet.rs:60-66)."""
    x = rng.standard_normal(10).astype(np.float32)
    approx, details = W.multi_level_forward(x, 2, "haar")
    assert np.asarray(approx).shape[-1] == 3
    back = np.asarray(W.multi_level_inverse(approx, details, "haar"))
    np.testing.assert_allclose(back[:10], x, rtol=1e-4, atol=1e-5)


def test_unknown_family_raises():
    import kofft_tpu as kt
    with pytest.raises(kt.KofftError):
        W.wavelet_forward(np.zeros(8, np.float32), "db17")


@pytest.mark.parametrize("family", ["haar", "db2", "db4", "sym4", "coif1"])
def test_dwt_perfect_reconstruction(rng, family):
    """The PR superset API reconstructs exactly (unlike the reference's
    compat synthesis for db4/sym4/coif1)."""
    x = rng.standard_normal((3, 64)).astype(np.float32)
    a, d = W.dwt(x, family)
    back = np.asarray(W.idwt(a, d, family))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("family", ["haar", "db4"])
def test_dwt_multi_roundtrip(rng, family):
    x = rng.standard_normal(128).astype(np.float32)
    a, ds = W.dwt_multi(x, 3, family)
    assert np.asarray(a).shape[-1] == 16
    back = np.asarray(W.idwt_multi(a, ds, family))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)


def test_dwt_energy_preserved(rng):
    """Orthogonality: ||a||^2 + ||d||^2 == ||x||^2."""
    x = rng.standard_normal(256).astype(np.float32)
    a, d = W.dwt(x, "db4")
    e = float(np.sum(np.asarray(a) ** 2) + np.sum(np.asarray(d) ** 2))
    assert e == pytest.approx(float(np.sum(x ** 2)), rel=1e-4)


@pytest.mark.parametrize("family,n", [("db2", 4), ("db4", 8),
                                      ("sym4", 8), ("coif1", 8)])
def test_tiny_n_gather_analysis_matches_reference(rng, family, n):
    """n < 2*taps takes the index-matrix gather path (multiple
    reflections per tap window, wavelet.rs boundary semantics); parity
    vs the same float64 oracle as the conv path."""
    x = rng.standard_normal(n).astype(np.float32)
    h, g, _, _ = W.FAMILIES[family]
    assert n < 2 * len(h)          # really the gather path
    ra, rd = wavelet_forward_ref(x, h, g)
    a, d = W.wavelet_forward(x, family)
    assert snr_db(ra, np.asarray(a)) > SNR, family
    assert snr_db(rd, np.asarray(d)) > SNR, family


@pytest.mark.parametrize("family,n_half", [("db2", 2), ("db4", 4),
                                           ("sym4", 4), ("coif1", 4)])
def test_tiny_n_scatter_synthesis_matches_reference(rng, family, n_half):
    a = rng.standard_normal(n_half).astype(np.float32)
    d = rng.standard_normal(n_half).astype(np.float32)
    _, _, gs, hs = W.FAMILIES[family]
    assert 2 * n_half < 2 * len(gs)
    ref = wavelet_inverse_ref(a, d, gs, hs)
    got = np.asarray(W.wavelet_inverse(a, d, family))
    assert snr_db(ref, got) > SNR, family
