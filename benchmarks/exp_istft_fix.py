"""Default-tier ISTFT roundtrip SNR fix (r4, VERDICT r3 weak #3 /
next-#4): the `istft_frames single_fast` row reads 34.0 dB where the
forward STFT at the same tier reads 51.0.

The OLA accumulate + normalize already run in f32 (ops/stft.py), so the
loss is in the frame synthesis dots. Hypothesis: adjacent frames share
75% of their samples (hop = win/4), their spectra are strongly
correlated, and bf16 rounding error is a deterministic function of the
operands — so per-frame errors add COHERENTLY in the overlap-add
(up to 4x amplitude = -12 dB), where the forward direction's per-frame
errors are measured independently.

Variants:
  A  per-frame inverse SNR at default, spectrum -> frame (isolates the
     engine; if ~51 dB while roundtrip is 34, coherent OLA confirmed)
  B  roundtrip at default (baseline)
  C  roundtrip at 'high' (bf16x3 dots)
  D  mixed split: frame IFFT at 'high', framing cost unchanged — same
     as C through the public API (the OLA is tier-independent), timed
  E  roundtrip at highest (reference line)

Run: python benchmarks/exp_istft_fix.py
"""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import kofft_tpu as kt
    from kofft_tpu.bench import timeit_chained_scalar
    from kofft_tpu.config import set_precision
    from kofft_tpu.ops import window as W
    from kofft_tpu.ops.dft import snr_db
    from kofft_tpu.ops.fft import engine_fft_planes

    rng = np.random.default_rng(0)
    n = 1 << 20
    win, hop = 1024, 256
    sig = rng.standard_normal(n).astype(np.float32)
    w = W.hann(win)
    s64 = sig.astype(np.float64)

    # spectra computed at HIGHEST (the bench methodology)
    sfr, sfi = kt.stft_split(sig, w, hop, onesided=False)
    sfr = jnp.asarray(np.asarray(sfr))
    sfi = jnp.asarray(np.asarray(sfi))
    nf = sfr.shape[0]

    # f64 frame oracle (windowed frames, inverse of the spectra)
    spec64 = (np.asarray(sfr, np.float64) + 1j * np.asarray(sfi, np.float64))
    frames64 = np.fft.ifft(spec64, axis=-1).real  # = windowed frames / 1

    # A: per-frame inverse at default (spectrum -> time frames)
    set_precision("default")
    try:
        f = jax.jit(lambda a, b: engine_fft_planes(a, b, win, True,
                                                   "float32")[0])
        tr = np.asarray(f(sfr, sfi), np.float64) / win
        sA = snr_db(frames64, tr)
        log(f"A per-frame inverse default : SNR {sA:.1f} dB")
    finally:
        set_precision(None)

    def istft_step(p, acc):
        a, b2 = p
        y = kt.istft_split(a * (1.0 + 1e-9 * acc), b2, w, hop, length=n)
        return acc + y[0] * 1e-20

    for label, prec in (("B roundtrip default", "default"),
                        ("C roundtrip high   ", "high"),
                        ("E roundtrip highest", None)):
        set_precision(prec)
        try:
            yrec = kt.istft_split(np.asarray(sfr), np.asarray(sfi), w, hop,
                                  length=n)
            s = snr_db(s64, np.asarray(yrec))
            t = timeit_chained_scalar(istft_step, (sfr, sfi))
            log(f"{label}: SNR {s:.1f} dB  {t*1e9/nf:7.1f} ns/frame "
                f"({t*1e3:.3f} ms)")
        finally:
            set_precision(None)

    # coherence check: SNR of the OLA if per-frame errors were
    # independent — roundtrip with frame-decorrelated noise of the same
    # per-frame power as variant A's measured error
    set_precision("default")
    try:
        f = jax.jit(lambda a, b: engine_fft_planes(a, b, win, True,
                                                   "float32")[0])
        tr = np.asarray(f(sfr, sfi), np.float64) / win
    finally:
        set_precision(None)
    err = tr - frames64
    perm = rng.permutation(nf)
    tr_ind = frames64 + err[perm]              # decorrelate across frames
    # OLA + normalize in numpy (mirrors ops/stft.py)
    k = win // hop
    out = np.zeros((nf + k - 1) * hop)
    for fidx in range(nf):
        out[fidx * hop: fidx * hop + win] += tr_ind[fidx] * np.asarray(w)
    wsq = np.zeros_like(out)
    for fidx in range(nf):
        wsq[fidx * hop: fidx * hop + win] += np.asarray(w) ** 2
    rec = np.where(wsq > 1e-8, out / np.where(wsq > 1e-8, wsq, 1), out)[:n]
    sI = snr_db(s64, rec)
    log(f"F decorrelated-error OLA     : SNR {sI:.1f} dB "
        "(what independent per-frame errors would give)")


if __name__ == "__main__":
    main()
