"""Property-style randomized sweeps (the reference's proptest discipline,
``src/fft.rs:2274-2650`` and ``ndfft.rs:311-357``): random sizes (smooth,
prime, pow2), random batch shapes, all strategies, roundtrips vs numpy.
"""

import numpy as np
import pytest

import kofft_tpu as kt
from kofft_tpu.ops.dft import snr_db

SNR = 90.0


@pytest.mark.parametrize("seed", range(6))
def test_fft_random_sizes_match_numpy(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(2, 2000))
    batch = () if rng.random() < 0.5 else (int(rng.integers(1, 5)),)
    x = (rng.standard_normal((*batch, n))
         + 1j * rng.standard_normal((*batch, n))).astype(np.complex64)
    got = kt.asnumpy(kt.fft(x))
    assert snr_db(np.fft.fft(x.astype(np.complex128)), got) > SNR, n
    back = kt.asnumpy(kt.ifft(got))
    assert snr_db(x, back) > SNR, n


@pytest.mark.parametrize("seed", range(4))
def test_rfft_random_roundtrip(seed):
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(2, 3000))
    x = rng.standard_normal(n).astype(np.float32)
    y = kt.asnumpy(kt.rfft(x))
    assert snr_db(np.fft.rfft(x.astype(np.float64)), y) > SNR, n
    back = np.asarray(kt.irfft(y, n=n))
    assert snr_db(x, back) > SNR, n


@pytest.mark.parametrize("seed", range(3))
def test_fftn_random_grids(seed):
    rng = np.random.default_rng(300 + seed)
    nd = int(rng.integers(2, 4))
    shape = tuple(int(rng.integers(2, 40)) for _ in range(nd))
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    got = kt.asnumpy(kt.fftn(x))
    assert snr_db(np.fft.fftn(x.astype(np.complex128)), got) > SNR, shape


@pytest.mark.parametrize("seed", range(3))
def test_stft_istft_random_roundtrip(seed):
    rng = np.random.default_rng(400 + seed)
    hop = int(rng.integers(8, 64))
    k = int(rng.integers(2, 6))
    win = hop * k
    n = hop * int(rng.integers(20, 60))
    x = rng.standard_normal(n).astype(np.float32)
    w = kt.window.hann(win)
    frames = kt.stft(x, w, hop)
    back = np.asarray(kt.istft(frames, w, hop, length=n))
    assert snr_db(x[win:n - win], back[win:n - win]) > SNR, (win, hop, n)


def test_strategies_agree_random():
    rng = np.random.default_rng(500)
    for _ in range(4):
        # smooth sizes so four_step is legal
        n = int(2 ** rng.integers(2, 7) * 3 ** rng.integers(0, 3))
        x = (rng.standard_normal(n)
             + 1j * rng.standard_normal(n)).astype(np.complex64)
        outs = [kt.asnumpy(kt.fft(x, backend=b))
                for b in ("xla", "naive")]
        ref = np.fft.fft(x.astype(np.complex128))
        for got in outs:
            assert snr_db(ref, got) > SNR, n


def test_push_stream_random_chunking():
    """StftPushStream parity under randomized chunk arrival, win/hop
    combinations including hop > win (the r3 desync regression class):
    push(random splits) + flush always equals the offline stft."""
    rng = np.random.default_rng(77)
    from kofft_tpu.ops.stft import StftPushStream, stft_split
    for trial in range(6):
        win = int(2 ** rng.integers(4, 7))            # 16..64
        hop = int(rng.integers(1, 2 * win))           # incl. hop > win
        n = int(rng.integers(win, 40 * hop + win))
        x = rng.standard_normal(n).astype(np.float32)
        w = kt.window.hann(win)
        rr, ri = stft_split(x, w, hop)
        ref = np.asarray(rr) + 1j * np.asarray(ri)
        st = StftPushStream(w, hop)
        outs = []
        pos = 0
        while pos < n:
            step = int(rng.integers(1, max(2, 3 * hop)))
            outs.append(st.push(x[pos: pos + step]))
            pos += step
        outs.append(st.flush())
        got = (np.concatenate([o[0] for o in outs])
               + 1j * np.concatenate([o[1] for o in outs]))
        assert got.shape == ref.shape, (win, hop, n)
        assert snr_db(ref, got) > SNR, (win, hop, n)
