"""r5 probe: bf16 C-scratch extends the one-call phased kernel to 2^24
on the `default` tier (VERDICT r4 #3, default-falloff leg).

The 1-pass tier's dots round operands to bf16 anyway, so quantizing the
VMEM C scratch costs ~nothing in SNR while halving the binding VMEM
cost: 2^24 fits in a 64 MB scratch where f32 would need 128. One HBM
round trip replaces the two-call pair's two.

Rows: public fft_split at 2^23 (regression: unchanged f32 scratch) and
2^24 (new route), rfft 2^24 (tiled real + bf16 scratch + Nyquist
epilogue), batched-mid rfft SNR (bt>1 bf16-C two-call), all on the
`default` tier; SNR vs f64.

Run: python benchmarks/exp_sdt.py
"""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax.numpy as jnp

    import kofft_tpu as kt
    from kofft_tpu.bench import timeit_chained
    from kofft_tpu.config import set_precision
    from kofft_tpu.ops.dft import snr_db
    from kofft_tpu.utils.observability import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(7)

    for p in (23, 24):
        n = 1 << p
        xr32 = rng.standard_normal(n).astype(np.float32)
        xi32 = rng.standard_normal(n).astype(np.float32)
        xr = jnp.asarray(xr32)
        xi = jnp.asarray(xi32)
        ref = np.fft.fft(xr32.astype(np.float64)
                         + 1j * xi32.astype(np.float64))
        try:
            set_precision("default")
            yr, yi = kt.fft_split(xr, xi)
            s = snr_db(ref, np.asarray(yr, np.float64)
                       + 1j * np.asarray(yi, np.float64))
            t = timeit_chained(
                lambda q: tuple(a * 1e-3 for a in kt.fft_split(q[0], q[1])),
                (xr, xi), iters=10, target_time=0.2)
            log(f"2^{p} public default: {t*1e6:7.1f} us "
                f"({n/t/1e9:5.2f} Gpts/s, SNR {s:.1f} dB)")
        finally:
            set_precision(None)
        del xr, xi

    # rfft 2^24 default (tiled real path + bf16 scratch + Nyquist)
    n = 1 << 24
    x32 = rng.standard_normal(n).astype(np.float32)
    jx = jnp.asarray(x32)
    rref = np.fft.rfft(x32.astype(np.float64))
    try:
        set_precision("default")
        hr, hi = kt.rfft_split(jx)
        s = snr_db(rref, np.asarray(hr, np.float64)
                   + 1j * np.asarray(hi, np.float64))

        def pp(q):
            yr, yi = kt.rfft_split(q[0])
            return (jnp.concatenate([yr[..., : n // 2] * 1e-3,
                                     yi[..., : n // 2] * 1e-3], axis=-1),)

        t = timeit_chained(pp, (jx,), iters=10, target_time=0.2)
        log(f"rfft 2^24 default: {t*1e6:7.1f} us (SNR {s:.1f} dB)")
        # batched-mid rfft: the bt>1 two-call with bf16-C
        xb = jnp.asarray(rng.standard_normal((256, 1 << 14))
                         .astype(np.float32))
        hr, hi = kt.rfft_split(xb)
        sb = snr_db(np.fft.rfft(np.asarray(xb).astype(np.float64)),
                    np.asarray(hr, np.float64)
                    + 1j * np.asarray(hi, np.float64))
        log(f"rfft 256x2^14 default SNR {sb:.1f} dB (bf16-C two-call)")
    finally:
        set_precision(None)
    log("DONE")


if __name__ == "__main__":
    main()
