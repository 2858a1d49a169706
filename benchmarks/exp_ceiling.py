"""2^22+ single-transform ceiling study (r4, VERDICT r3 weak #2 / next #2).

The phased one-call kernel's VMEM C-scratch (2 planes x n x 4 B) caps it
at _PHASED_MAX_N = 2^22 (32 MB scratch); 2^23+ route to the two-call
_build_ml pair today, and no row above 2^22 was ever measured. Questions
this script answers on chip:

  1. Does the phased kernel COMPILE AND WIN at 2^23 (64 MB scratch —
     v5e VMEM is 128 MB; the shipped vmem_limit is 100 MB)?
  2. What does the two-call path cost at 2^22/2^23/2^24, both tiers,
     vs the phased kernel and vs jnp.fft?
  3. Where is the HBM floor: a copy "kernel" (tiled in->out identity)
     at the same block geometry gives the achievable stream bandwidth;
     one-call floor = 4 plane-passes (in+out), two-call = 8.

Run: python benchmarks/exp_ceiling.py
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kofft_tpu.bench import timeit_chained
    from kofft_tpu.ops import pallas_kernels as PK
    from kofft_tpu.ops.dft import snr_db

    rng = np.random.default_rng(0)

    def ref_fft(xr, xi):
        return np.fft.fft(np.asarray(xr, np.complex128)
                          + 1j * np.asarray(xi, np.float64))

    def check(tag, n, yr, yi, xr, xi, order="tiled"):
        y = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
        if order == "tiled":
            # (b, n2, n1) tiled planes: flat index k = k2*n1 + k1
            y = y.reshape(-1)
        r = ref_fft(xr, xi)
        s = snr_db(r, y.reshape(r.shape))
        log(f"    {tag}: SNR {s:.1f} dB")
        return s

    # ---- copy floor at the phased block geometry ---------------------
    def copy_floor(n1, n2, label):
        t = 128
        spec_in = pl.BlockSpec((1, n1, t), lambda b_, i: (b_, 0, i),
                               memory_space=pltpu.VMEM)

        def k(xr, xi, outr, outi):
            outr[...] = xr[...]
            outi[...] = xi[...]

        f = pl.pallas_call(
            k, grid=(1, n2 // t),
            in_specs=[spec_in, spec_in], out_specs=[spec_in, spec_in],
            out_shape=[jax.ShapeDtypeStruct((1, n1, n2), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))
        ar = jnp.asarray(rng.standard_normal((1, n1, n2)).astype(np.float32))
        ai = jnp.asarray(rng.standard_normal((1, n1, n2)).astype(np.float32))
        tc = timeit_chained(lambda q: jax.jit(f)(q[0], q[1]), (ar, ai),
                            iters=50)
        byts = 4 * n1 * n2 * 4  # 2 planes in + 2 planes out
        log(f"copy floor {label} ({n1}x{n2}): {tc*1e6:8.1f} us = "
            f"{byts / tc / 1e9:.0f} GB/s")
        return tc

    copy_floor(2048, 2048, "2^22")
    copy_floor(2048, 8192, "2^24")

    # ---- phased at 2^23 (cap lift) -----------------------------------
    for n, modes in ((1 << 22, ("highest", "default")),
                     (1 << 23, ("highest", "default"))):
        n1, n2 = PK._pow2_split(n)
        x0r = rng.standard_normal(n).astype(np.float32)
        x0i = rng.standard_normal(n).astype(np.float32)
        ar = jnp.asarray(x0r.reshape(1, n1, n2))
        ai = jnp.asarray(x0i.reshape(1, n1, n2))
        for mode in modes:
            try:
                run = PK._build_phased(n, "float32", False, mode)
                f = jax.jit(lambda q, run=run: run(1, q[0], q[1]))
                yr, yi = jax.block_until_ready(f((ar, ai)))
                t = timeit_chained(f, (ar, ai), iters=30)
                log(f"phased  2^{n.bit_length()-1} {mode:7s}: "
                    f"{t*1e6:8.1f} us = {n / t / 1e9:.2f} Gpts/s")
                check(f"phased {mode}", n, yr, yi, x0r, x0i)
            except Exception as e:  # noqa: BLE001
                log(f"phased  2^{n.bit_length()-1} {mode}: FAILED "
                    f"{str(e)[:160]}")

    # ---- two-call at 2^22/2^23/2^24, both tiers ----------------------
    for p in (22, 23, 24):
        n = 1 << p
        n1, n2 = PK._pow2_split(n)
        x0r = rng.standard_normal(n).astype(np.float32)
        x0i = rng.standard_normal(n).astype(np.float32)
        ar = jnp.asarray(x0r.reshape(1, n1, n2))
        ai = jnp.asarray(x0i.reshape(1, n1, n2))
        for mode in ("highest", "default"):
            try:
                _, _, stage1, _, stage2, _ = PK._build_ml(
                    n, "float32", False, mode, 1)

                def tc2(q, s1=stage1, s2=stage2):
                    cr, ci = s1(1, q[0], q[1])
                    return s2(1, cr, ci)

                f = jax.jit(tc2)
                yr, yi = jax.block_until_ready(f((ar, ai)))
                t = timeit_chained(f, (ar, ai), iters=30)
                log(f"twocall 2^{p} {mode:7s}: {t*1e6:8.1f} us = "
                    f"{n / t / 1e9:.2f} Gpts/s")
                check(f"twocall {mode}", n, yr, yi, x0r, x0i)
            except Exception as e:  # noqa: BLE001
                log(f"twocall 2^{p} {mode}: FAILED {str(e)[:160]}")

        # jnp competitor (rank-1)
        xr = jnp.asarray(x0r)
        xi = jnp.asarray(x0i)

        def jf(q):
            y = jnp.fft.fft(jax.lax.complex(q[0], q[1]))
            return jnp.real(y), jnp.imag(y)

        tj = timeit_chained(jax.jit(jf), (xr, xi), iters=20)
        log(f"jnp.fft 2^{p}        : {tj*1e6:8.1f} us")

        # public route (what fft_split serves today)
        import kofft_tpu as kt
        from kofft_tpu.config import set_precision
        for prec in (None, "default"):
            try:
                set_precision(prec)
                g = jax.jit(lambda q: kt.fft_split(q[0], q[1]))
                jax.block_until_ready(g((xr, xi)))
                t = timeit_chained(g, (xr, xi), iters=30)
                log(f"public  2^{p} {str(prec):7s}: {t*1e6:8.1f} us = "
                    f"{n / t / 1e9:.2f} Gpts/s")
            finally:
                set_precision(None)


if __name__ == "__main__":
    main()
