"""Smooth odd-factor n, part 2 (r4): the d=2 NO-TRANSPOSE formulation.

exp_smooth_cube.py measured the d=4 cube SLOWER than the matmul tree at
HIGHEST (616.9 vs 268.4 us at 10^6) — narrow k=25/40 dots plus 6
twiddle broadcast passes — and Mosaic crashed on the rank-4 in-kernel
dot_general. This round: n = n1*n2 (1000*1000) with

    pass 1: contract axis 0   (k0, j1) = F_{n1}^T . A        [2-D dot]
    twiddle: C = B * W,  W[k0, j1] = w_n^{k0 j1}              [one mult]
    pass 2: contract axis 1   (k1, k0) = F_{n2}^T . C^T-free  [2-D dot]

whose dot_general output order gives the NATURAL flat spectrum
(k = k1*n1 + k0) with zero transposes anywhere.

  V1  XLA jit, dense 1000-point DFT matrices
  V2  Pallas whole-VMEM (grid=()), dense dots, twiddle as operand
  V3  Pallas whole-VMEM, recursive in-kernel line FFT over
      _ml_split leaves (non-128 lane shapes: Mosaic lowering probe)

Run: python benchmarks/exp_smooth_cube2.py
"""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _full_twiddle(n1: int, n2: int, dtype: str = "float32"):
    from kofft_tpu.plan import tables
    return tables.twiddle(n1, n2, dtype)   # W[k1, j2] = w_n^{k1 j2}


def d2_xla(xr, xi, n1, n2, mode):
    import jax.numpy as jnp
    from kofft_tpu.ops.pallas_kernels import _cdot
    from kofft_tpu.plan import tables
    f1r, f1i = tables.dft_matrix(n1, "float32")
    f2r, f2i = tables.dft_matrix(n2, "float32")
    twr, twi = _full_twiddle(n1, n2)
    ar = xr.reshape(n1, n2)
    ai = xi.reshape(n1, n2)
    br, bi = _cdot(jnp.asarray(f1r), jnp.asarray(f1i), ar, ai,
                   ((0,), (0,)), mode)            # (k0, j1)
    wr = jnp.asarray(twr)
    wi = jnp.asarray(twi)
    cr = br * wr - bi * wi
    ci = br * wi + bi * wr
    yr, yi = _cdot(jnp.asarray(f2r), jnp.asarray(f2i), cr, ci,
                   ((0,), (1,)), mode)            # (k1, k0)
    return yr.reshape(n1 * n2), yi.reshape(n1 * n2)


def build_d2_pallas(n1: int, n2: int, mode: str, recursive: bool,
                    interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kofft_tpu.ops import pallas_kernels as PK
    from kofft_tpu.plan import tables

    n = n1 * n2
    twr, twi = _full_twiddle(n1, n2)
    if recursive:
        keys1 = PK._ml_const_keys(n1)
        keys2 = PK._ml_const_keys(n2)
        consts1 = PK._ml_const_arrays(keys1, "float32")
        consts2 = PK._ml_const_arrays(keys2, "float32")
        consts = consts1 + consts2
        nc1 = len(consts1)
    else:
        f1r, f1i = tables.dft_matrix(n1, "float32")
        f2r, f2i = tables.dft_matrix(n2, "float32")
        consts = [f1r, f1i, f2r, f2i]

    def kern(ar_ref, ai_ref, twr_ref, twi_ref, *rest):
        crefs = rest[:-2]
        yr_ref, yi_ref = rest[-2:]
        ar = ar_ref[...].reshape(n1, n2)
        ai = ai_ref[...].reshape(n1, n2)
        if recursive:
            cd1 = PK._unpack_consts(keys1, crefs[:nc1])
            cd2 = PK._unpack_consts(keys2, crefs[nc1:])
            br, bi = PK._fft_axis0_traced(ar, ai, n1, cd1, mode)
        else:
            br, bi = PK._cdot(crefs[0][...], crefs[1][...], ar, ai,
                              ((0,), (0,)), mode)
        wr = twr_ref[...]
        wi = twi_ref[...]
        cr = br * wr - bi * wi
        ci = br * wi + bi * wr
        if recursive:
            # contract axis 1 == axis-0 transform of the transpose; the
            # (k1, k0) output then flattens to the natural order
            zr, zi = PK._fft_axis0_traced(cr.T, ci.T, n2, cd2, mode)
        else:
            zr, zi = PK._cdot(crefs[2][...], crefs[3][...], cr, ci,
                              ((0,), (1,)), mode)
        yr_ref[...] = zr.reshape(n)
        yi_ref[...] = zi.reshape(n)

    vec = pl.BlockSpec((n,), lambda: (0,), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((n1, n2), lambda: (0, 0), memory_space=pltpu.VMEM)
    cspecs = [pl.BlockSpec(c.shape, (lambda nd: lambda: (0,) * nd)(c.ndim),
                           memory_space=pltpu.VMEM) for c in consts]
    f = pl.pallas_call(
        kern, grid=(),
        in_specs=[vec, vec, mat, mat] + cspecs,
        out_specs=[vec, vec],
        out_shape=[jax.ShapeDtypeStruct((n,), jnp.float32)] * 2,
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024)}),
    )
    import functools
    cj = [jnp.asarray(c) for c in consts]
    return lambda ar, ai: f(ar, ai, jnp.asarray(twr), jnp.asarray(twi),
                            *cj)


def main():
    import functools

    import jax
    import jax.numpy as jnp

    import kofft_tpu as kt
    from kofft_tpu.bench import timeit_chained
    from kofft_tpu.config import set_precision
    from kofft_tpu.ops.dft import snr_db

    rng = np.random.default_rng(0)
    n = 10 ** 6
    n1 = n2 = 1000
    x0r = rng.standard_normal(n).astype(np.float32)
    x0i = rng.standard_normal(n).astype(np.float32)
    ref = np.fft.fft(x0r.astype(np.complex128) + 1j * x0i)
    xr = jnp.asarray(x0r)
    xi = jnp.asarray(x0i)

    # tree route at both tiers (the incumbent)
    for prec in (None, "default"):
        set_precision(prec)
        try:
            t0 = timeit_chained(
                lambda q: tuple(a * 1e-3 for a in kt.fft_split(q[0], q[1])),
                (xr, xi), iters=50)
            log(f"tree route {str(prec):7s}:  {t0*1e6:7.1f} us")
        finally:
            set_precision(None)

    for mode in ("highest", "default"):
        f = jax.jit(functools.partial(d2_xla, n1=n1, n2=n2, mode=mode))
        yr, yi = f(xr, xi)
        s = snr_db(ref, np.asarray(yr, np.float64)
                   + 1j * np.asarray(yi, np.float64))
        t = timeit_chained(
            lambda q: tuple(a * 1e-3 for a in f(q[0], q[1])), (xr, xi),
            iters=50)
        log(f"V1 XLA d2 {mode:7s}:  {t*1e6:7.1f} us  SNR {s:.1f} dB")

    for name, recursive in (("V2 dense", False), ("V3 recur", True)):
        for mode in ("highest", "default"):
            try:
                run = build_d2_pallas(n1, n2, mode, recursive)
                g = jax.jit(run)
                yr, yi = g(xr, xi)
                s = snr_db(ref, np.asarray(yr, np.float64)
                           + 1j * np.asarray(yi, np.float64))
                t = timeit_chained(
                    lambda q: tuple(a * 1e-3 for a in g(q[0], q[1])),
                    (xr, xi), iters=50)
                log(f"{name} PL {mode:7s}:  {t*1e6:7.1f} us  "
                    f"SNR {s:.1f} dB")
            except Exception as e:  # noqa: BLE001
                log(f"{name} PL {mode}: FAILED {str(e)[:200]}")


if __name__ == "__main__":
    main()
