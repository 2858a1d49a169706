"""Round-2 chip experiments: twiddle factorization + one-sided rfft.

Targeted rows only (full sweep stays in bench.py). Run on the axon chip:
    python benchmarks/exp_r2.py
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
    from kofft_tpu.bench import timeit_chained, timeit_chained_scalar
    from kofft_tpu.ops.dft import snr_db

    rng = np.random.default_rng(0)
    n = 1 << 20

    # SNR first (cheap, catches math regressions before burning bench time)
    x_small = rng.standard_normal((1, n)).astype(np.float32)
    yr, yi = kt.rfft_split(jnp.asarray(x_small))
    got = np.asarray(yr)[0] + 1j * np.asarray(yi)[0]
    ref = np.fft.rfft(x_small[0].astype(np.float64))
    log(f"rfft 2^20 SNR vs f64: {snr_db(ref, got):.1f} dB "
        f"(shape {got.shape})")

    xr = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
    yr2, yi2 = kt.fft_split(xr, xi)
    got2 = np.asarray(yr2)[0] + 1j * np.asarray(yi2)[0]
    ref2 = np.fft.fft(np.asarray(xr)[0].astype(np.float64)
                      + 1j * np.asarray(xi)[0].astype(np.float64))
    log(f"c32 fft 2^20 SNR vs f64: {snr_db(ref2, got2):.1f} dB")

    # --- single 2^20 complex ---
    t = timeit_chained(lambda p: kt.fft_split(p[0], p[1]), (xr, xi),
                       iters=200)
    log(f"c32 FFT 2^20 single: {t*1e6:.1f} us ({n/t/1e9:.2f} Gpts/s)")

    # --- rfft 2^20 ---
    xrr = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))

    def rfft_step(a, acc):
        pr, pi = kt.rfft_split(a * (1.0 + 1e-7 * acc))
        return acc + pr[0, 0] * 1e-20

    trf = timeit_chained_scalar(rfft_step, xrr)
    log(f"rfft 2^20: {trf*1e6:.1f} us")

    # --- batched 8x2^20 ---
    bt = 8
    xrb = jnp.asarray(rng.standard_normal((bt, n)).astype(np.float32))
    xib = jnp.asarray(rng.standard_normal((bt, n)).astype(np.float32))
    tb = timeit_chained(lambda q: kt.fft_split(q[0], q[1]), (xrb, xib),
                        iters=50)
    log(f"8x2^20 batched: {tb*1e3:.3f} ms = {bt*n/tb/1e9:.2f} Gpts/s")

    # --- 3-D 128^3: rotation-method engine vs XLA's fused fftn ---
    import os
    if os.environ.get("EXP_3D"):
        from kofft_tpu.ops.ndfft import fftn_split
        s = 128
        x3r = jnp.asarray(rng.standard_normal((s, s, s)).astype(np.float32))
        x3i = jnp.asarray(rng.standard_normal((s, s, s)).astype(np.float32))
        # SNR first
        yr3, yi3 = fftn_split(x3r, x3i)
        ref3 = np.fft.fftn(np.asarray(x3r).astype(np.complex128)
                           + 1j * np.asarray(x3i).astype(np.float64))
        log(f"fft3d 128^3 SNR: "
            f"{snr_db(ref3, np.asarray(yr3) + 1j * np.asarray(yi3)):.1f} dB")
        t3 = timeit_chained(lambda q: fftn_split(q[0], q[1]), (x3r, x3i))
        log(f"fft3d 128^3 (rotation): {t3*1e6:.1f} us")

        def jfftn(q):
            y = jnp.fft.fftn(q[0] + 1j * q[1])
            return jnp.real(y), jnp.imag(y)
        t3j = timeit_chained(jax.jit(jfftn), (x3r, x3i))
        log(f"fft3d 128^3 (jnp.fft.fftn): {t3j*1e6:.1f} us")


if __name__ == "__main__":
    main()
