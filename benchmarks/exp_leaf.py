"""Leaf-size sweep for long lines (r4, VERDICT r3 next #2).

_ML_LEAF = 32 bottoms every line recursion at k=32 dots. Lines of 2048
(2^22 phased) decompose as (32, (8, 8)) = 3 leaf levels and 8192 lines
(2^24 two-call) as ((8,8), (8,16)) = 4 — each extra level is a full
twiddle+swap+dot pass over the block. A dense 64- or 128-point DFT leaf
removes whole levels: 2048 -> (32, 64) [2 levels], 8192 -> (64, 128)
[2 levels]. The r1 negative was about KRON-LIFTING small leaves to
k=128 (adds relayout); natural large leaves add none.

Sweeps _ML_LEAF in {32, 64, 128} (cache-cleared between variants) at:
  * 2^22 phased, highest + default   (the jnp.fft 733 us bar)
  * 2^24 two-call, highest + default (first rows at this size)
plus jnp.fft at 2^24. Scalar-carry timing (output shape != input shape
at non-square splits); bias is common to all variants.

Run: python benchmarks/exp_leaf.py
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

    from kofft_tpu.bench import timeit_chained_scalar
    from kofft_tpu.ops import pallas_kernels as PK
    from kofft_tpu.ops.dft import snr_db

    rng = np.random.default_rng(0)

    def clear():
        PK._build_phased.cache_clear()
        PK._build_ml.cache_clear()

    def levels(m):
        out = []

        def walk(mm):
            if mm <= PK._ML_LEAF:
                out.append(mm)
                return
            a, b = PK._ml_split(mm)
            walk(a)
            walk(b)

        walk(m)
        return out

    # ---- 2^22 phased ------------------------------------------------
    n = 1 << 22
    n1, n2 = PK._pow2_split(n)
    x0r = rng.standard_normal(n).astype(np.float32)
    x0i = rng.standard_normal(n).astype(np.float32)
    ar = jnp.asarray(x0r.reshape(1, n1, n2))
    ai = jnp.asarray(x0i.reshape(1, n1, n2))
    ref = np.fft.fft(x0r.astype(np.complex128) + 1j * x0i)

    for leaf in (32, 64, 128):
        PK._ML_LEAF = leaf
        clear()
        log(f"--- leaf {leaf}: 2048-line levels {levels(2048)}, "
            f"8192-line levels {levels(8192)} ---")
        for mode in ("highest", "default"):
            try:
                run = PK._build_phased(n, "float32", False, mode)
                f = jax.jit(lambda q, run=run: run(1, q[0], q[1]))
                yr, yi = jax.block_until_ready(f((ar, ai)))
                y = (np.asarray(yr, np.float64)
                     + 1j * np.asarray(yi, np.float64)).reshape(-1)
                s = snr_db(ref, y)

                def step(q, acc, f=f):
                    zr, zi = f((q[0] * (1.0 + 1e-9 * acc), q[1]))
                    return acc + zr[0, 0, 0] * 1e-20

                t = timeit_chained_scalar(step, (ar, ai), iters=30)
                log(f"2^22 phased  leaf{leaf} {mode:7s}: {t*1e6:8.1f} us"
                    f" = {n / t / 1e9:5.2f} Gpts/s  SNR {s:.1f} dB")
            except Exception as e:  # noqa: BLE001
                log(f"2^22 phased leaf{leaf} {mode}: FAILED {str(e)[:160]}")

    # ---- 2^24 two-call ----------------------------------------------
    n = 1 << 24
    n1, n2 = PK._pow2_split(n)
    x0r = rng.standard_normal(n).astype(np.float32)
    x0i = rng.standard_normal(n).astype(np.float32)
    ar = jnp.asarray(x0r.reshape(1, n1, n2))
    ai = jnp.asarray(x0i.reshape(1, n1, n2))
    ref = np.fft.fft(x0r.astype(np.complex128) + 1j * x0i)

    for leaf in (32, 64, 128):
        PK._ML_LEAF = leaf
        clear()
        for mode in ("highest", "default"):
            try:
                _, _, stage1, _, stage2, _ = PK._build_ml(
                    n, "float32", False, mode, 1)

                def tc(q, s1=stage1, s2=stage2):
                    cr, ci = s1(1, q[0], q[1])
                    return s2(1, cr, ci)

                f = jax.jit(tc)
                yr, yi = jax.block_until_ready(f((ar, ai)))
                y = (np.asarray(yr, np.float64)
                     + 1j * np.asarray(yi, np.float64)).reshape(-1)
                s = snr_db(ref, y)

                def step(q, acc, f=f):
                    zr, zi = f((q[0] * (1.0 + 1e-9 * acc), q[1]))
                    return acc + zr[0, 0, 0] * 1e-20

                t = timeit_chained_scalar(step, (ar, ai), iters=20)
                log(f"2^24 twocall leaf{leaf} {mode:7s}: {t*1e6:8.1f} us"
                    f" = {n / t / 1e9:5.2f} Gpts/s  SNR {s:.1f} dB")
            except Exception as e:  # noqa: BLE001
                log(f"2^24 twocall leaf{leaf} {mode}: FAILED "
                    f"{str(e)[:160]}")

    PK._ML_LEAF = 32
    clear()

    # jnp competitor at 2^24
    xr = jnp.asarray(x0r)
    xi = jnp.asarray(x0i)

    def jf(q, acc):
        y = jnp.fft.fft(jax.lax.complex(q[0] * (1.0 + 1e-9 * acc), q[1]))
        return acc + jnp.real(y)[0] * 1e-20

    t = timeit_chained_scalar(jf, (xr, xi), iters=20)
    log(f"2^24 jnp.fft         : {t*1e6:8.1f} us")


if __name__ == "__main__":
    main()
