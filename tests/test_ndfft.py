"""N-D FFT parity (reference ndfft.rs proptest roundtrips, ndfft.rs:311-357)."""

import numpy as np
import pytest

from kofft_tpu.ops import ndfft
from kofft_tpu.ops.dft import snr_db

SNR = 95.0


def _rc(rng, shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


@pytest.mark.parametrize("shape", [(8, 8), (16, 32), (4, 100), (30, 7)])
def test_fft2_matches_numpy(rng, shape):
    x = _rc(rng, shape)
    got = np.asarray(ndfft.fft2(x))
    ref = np.fft.fft2(x.astype(np.complex128))
    assert snr_db(ref, got) > SNR


@pytest.mark.parametrize("shape", [(4, 8, 16), (8, 8, 8), (3, 5, 7)])
def test_fft3_matches_numpy(rng, shape):
    x = _rc(rng, shape)
    got = np.asarray(ndfft.fft3(x))
    ref = np.fft.fftn(x.astype(np.complex128))
    assert snr_db(ref, got) > SNR


def test_fftn_axes_subset(rng):
    x = _rc(rng, (4, 8, 16))
    got = np.asarray(ndfft.fftn(x, axes=(0, 2)))
    ref = np.fft.fftn(x.astype(np.complex128), axes=(0, 2))
    assert snr_db(ref, got) > SNR


@pytest.mark.parametrize("shape", [(8, 8), (4, 8, 16)])
def test_ifftn_roundtrip(rng, shape):
    x = _rc(rng, shape)
    back = np.asarray(ndfft.ifftn(ndfft.fftn(x)))
    assert snr_db(x, back) > SNR


def test_fft2_batched(rng):
    x = _rc(rng, (3, 8, 16))
    got = np.asarray(ndfft.fft2(x))
    ref = np.fft.fft2(x.astype(np.complex128), axes=(-2, -1))
    assert snr_db(ref, got) > SNR


def test_real_input(rng):
    x = rng.standard_normal((8, 8)).astype(np.float32)
    got = np.asarray(ndfft.fft2(x))
    ref = np.fft.fft2(x.astype(np.float64))
    assert snr_db(ref, got) > SNR
