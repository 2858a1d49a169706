"""Asymmetric bf16 HBM I/O for the default tier behind a PUBLIC f32
boundary (r4, VERDICT r3 weak #1/#4).

exp_batch2c.py showed bf16 plane I/O halves the phased kernel's HBM
traffic for callers that HOLD bf16 planes. This experiment asks whether
f32 public callers can buy (most of) that win too: cast the input
planes to bf16 in the XLA prologue — the convert should fuse into the
flat->tiled relayout XLA materializes anyway (read f32, write bf16:
half the relayout write + half the kernel read) — and keep the output
f32 (flat single: the kernel emits f32 directly; batched: either f32
out, or bf16 out with the upcast fused into the tiled->flat relayout).

Accuracy: the default tier's MXU dots round operands to bf16 anyway, so
the input cast costs ~nothing (measured 44.1 -> 43.7 dB with BOTH sides
bf16 in exp_batch2c).

Run: python benchmarks/exp_io_cast.py
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

    from kofft_tpu.bench import timeit_chained
    from kofft_tpu.ops import pallas_kernels as PK
    from kofft_tpu.ops.dft import snr_db

    rng = np.random.default_rng(0)
    n = 1 << 20
    n1, n2 = PK._pow2_split(n)

    # ---- flat single transform (rank-1 public form) --------------------
    x0r = rng.standard_normal(n).astype(np.float32)
    x0i = rng.standard_normal(n).astype(np.float32)
    ref1 = np.fft.fft(x0r.astype(np.complex128) + 1j * x0i)
    xr = jnp.asarray(x0r)
    xi = jnp.asarray(x0i)

    run_flat = PK._build_phased(n, "float32", False, "default", flat=True)

    def f_base(p):
        a = p[0].reshape(1, n1, n2)
        b = p[1].reshape(1, n1, n2)
        return run_flat(1, a, b)

    def f_cast(p):
        a = p[0].astype(jnp.bfloat16).reshape(1, n1, n2)
        b = p[1].astype(jnp.bfloat16).reshape(1, n1, n2)
        return run_flat(1, a, b)

    for name, f in (("f32-in ", f_base), ("bf16-in", f_cast)):
        jf = jax.jit(f)
        t = timeit_chained(jf, (xr, xi), iters=100)
        yr, yi = jf((xr, xi))
        s = snr_db(ref1, np.asarray(yr, np.float64)
                   + 1j * np.asarray(yi, np.float64))
        log(f"flat single 2^20 default {name}: {t*1e6:6.1f} us  "
            f"SNR {s:.1f} dB")

    # ---- rfft flat single ----------------------------------------------
    refr = np.fft.rfft(x0r.astype(np.float64))
    run_rflat = PK._build_phased(n, "float32", False, "default",
                                 real=True, flat=True)

    def rf_base(p):
        yr, yi = run_rflat(1, p[0].reshape(1, n1, n2))
        nxt = jnp.concatenate([yr[: n // 2], yi[: n // 2]]) * 1e-3
        return (nxt,)

    def rf_cast(p):
        a = p[0].astype(jnp.bfloat16).reshape(1, n1, n2)
        yr, yi = run_rflat(1, a)
        nxt = jnp.concatenate([yr[: n // 2], yi[: n // 2]]) * 1e-3
        return (nxt,)

    for name, f, conv in (("f32-in ", rf_base, False),
                          ("bf16-in", rf_cast, True)):
        jf = jax.jit(f)
        t = timeit_chained(jf, (xr,), iters=100)
        a = (jnp.asarray(x0r).astype(jnp.bfloat16).reshape(1, n1, n2)
             if conv else jnp.asarray(x0r).reshape(1, n1, n2))
        yr, yi = run_rflat(1, a)
        s = snr_db(refr, np.asarray(yr, np.float64)
                   + 1j * np.asarray(yi, np.float64))
        log(f"rfft flat 2^20 default {name}: {t*1e6:6.1f} us  "
            f"SNR {s:.1f} dB")

    # ---- batched 8x2^20 (public flat f32 boundary) ----------------------
    b = 8
    xbr = rng.standard_normal((b, n)).astype(np.float32)
    xbi = rng.standard_normal((b, n)).astype(np.float32)
    refb = np.fft.fft(xbr[0].astype(np.complex128) + 1j * xbi[0])
    abr = jnp.asarray(xbr)
    abi = jnp.asarray(xbi)

    run_g32 = PK._build_phased(n, "float32", False, "default")
    run_gbf = PK._build_phased(n, "float32", False, "default",
                               io="bfloat16")

    def b_base(p):
        yr, yi = run_g32(b, p[0].reshape(b, n1, n2), p[1].reshape(b, n1, n2))
        return yr.reshape(b, n), yi.reshape(b, n)

    def b_cast_f32out(p):
        a0 = p[0].astype(jnp.bfloat16).reshape(b, n1, n2)
        a1 = p[1].astype(jnp.bfloat16).reshape(b, n1, n2)
        yr, yi = run_g32(b, a0, a1)
        return yr.reshape(b, n), yi.reshape(b, n)

    def b_cast_bf16out(p):
        a0 = p[0].astype(jnp.bfloat16).reshape(b, n1, n2)
        a1 = p[1].astype(jnp.bfloat16).reshape(b, n1, n2)
        yr, yi = run_gbf(b, a0, a1)
        return (yr.reshape(b, n).astype(jnp.float32),
                yi.reshape(b, n).astype(jnp.float32))

    for name, f in (("f32 io        ", b_base),
                    ("bf16-in f32out", b_cast_f32out),
                    ("bf16-in bf-out", b_cast_bf16out)):
        jf = jax.jit(f)
        t = timeit_chained(jf, (abr, abi), iters=30)
        yr, yi = jf((abr, abi))
        s = snr_db(refb, np.asarray(yr, np.float64)[0]
                   + 1j * np.asarray(yi, np.float64)[0])
        log(f"batch8 2^20 default {name}: {t*1e6/b:6.1f} us/row  "
            f"SNR {s:.1f} dB")

    # ---- 2^22 single, default tier (non-flat phased; VERDICT weak #2) --
    n4 = 1 << 22
    n41, n42 = PK._pow2_split(n4)
    y0r = rng.standard_normal(n4).astype(np.float32)
    y0i = rng.standard_normal(n4).astype(np.float32)
    ref4 = np.fft.fft(y0r.astype(np.complex128) + 1j * y0i)
    yr4 = jnp.asarray(y0r)
    yi4 = jnp.asarray(y0i)
    run4 = PK._build_phased(n4, "float32", False, "default")

    def g_base(p):
        zr, zi = run4(1, p[0].reshape(1, n41, n42),
                      p[1].reshape(1, n41, n42))
        return zr.reshape(n4), zi.reshape(n4)

    def g_cast(p):
        zr, zi = run4(1, p[0].astype(jnp.bfloat16).reshape(1, n41, n42),
                      p[1].astype(jnp.bfloat16).reshape(1, n41, n42))
        return zr.reshape(n4), zi.reshape(n4)

    for name, f in (("f32-in ", g_base), ("bf16-in", g_cast)):
        jf = jax.jit(f)
        t = timeit_chained(jf, (yr4, yi4), iters=30)
        zr, zi = jf((yr4, yi4))
        s = snr_db(ref4, np.asarray(zr, np.float64)
                   + 1j * np.asarray(zi, np.float64))
        log(f"single 2^22 default {name}: {t*1e6:6.1f} us  "
            f"SNR {s:.1f} dB")


if __name__ == "__main__":
    main()
