"""Beyond-VMEM 2-D/3-D grids: 4096^2 (2^24 points) and 256^3 (r4,
VERDICT r3 weak #5). The phased 2-D kernel's scratch holds the whole
image (caps at 2048^2 on the 1-pass tier); above it, shapes route to
XLA's fftn today. This measures a TWO-CALL no-twiddle pair (stage A:
column-line FFTs, stage B: row-line FFTs emitting untransposed — the
_build_ml machinery minus the 1-D twiddle) against jnp.fftn and the
existing routes, both tiers.

256^3 variants: current route (dense per-axis einsum via
_small_axes_zone), jnp.fftn, and phased-2D-on-last-two-axes (b=256
batch grid) + one dense einsum pass on axis 0.

Run: python benchmarks/exp_2d_big.py
"""
from __future__ import annotations

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_2d_twocall(n1: int, n2: int, mode: str, interpret: bool = False):
    """Two pallas_calls over an HBM intermediate: 2-D FFT of (b, n1, n2)
    images too large for the phased kernel's VMEM scratch."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kofft_tpu.ops import pallas_kernels as PK

    t = PK._ML_TILE
    keys1 = PK._ml_const_keys(n1)
    keys2 = PK._ml_const_keys(n2)
    consts1 = PK._ml_const_arrays(keys1, "float32")
    consts2 = PK._ml_const_arrays(keys2, "float32")
    kw = {} if interpret else {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}

    def sa_kern(ar, ai, *crefs):
        crs, (cr, ci) = crefs[:-2], crefs[-2:]
        cd = PK._unpack_consts(keys1, crs)
        yr, yi = PK._fft_axis0_traced(ar[0], ai[0], n1, cd, mode)
        cr[0] = yr
        ci[0] = yi

    def sb_kern(cr, ci, *crefs):
        crs, (xr_o, xi_o) = crefs[:-2], crefs[-2:]
        cd = PK._unpack_consts(keys2, crs)
        zr, zi = PK._fft_axis0_traced(cr[0].T, ci[0].T, n2, cd, mode)
        xr_o[0] = zr.T
        xi_o[0] = zi.T

    def stage_a(b, ar, ai):
        col = pl.BlockSpec((1, n1, t), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            sa_kern, grid=(b, n2 // t),
            in_specs=[col, col] + PK._const_vmem_specs(consts1),
            out_specs=[col, col],
            out_shape=[jax.ShapeDtypeStruct((b, n1, n2), jnp.float32)] * 2,
            interpret=interpret, **kw,
        )(ar, ai, *[jnp.asarray(c) for c in consts1])

    def stage_b(b, cr, ci):
        row = pl.BlockSpec((1, t, n2), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            sb_kern, grid=(b, n1 // t),
            in_specs=[row, row] + PK._const_vmem_specs(consts2),
            out_specs=[row, row],
            out_shape=[jax.ShapeDtypeStruct((b, n1, n2), jnp.float32)] * 2,
            interpret=interpret, **kw,
        )(cr, ci, *[jnp.asarray(c) for c in consts2])

    def run(ar, ai):
        b = ar.shape[0]
        cr, ci = stage_a(b, ar, ai)
        return stage_b(b, cr, ci)

    return run


def main():
    import jax
    import jax.numpy as jnp

    from kofft_tpu.bench import timeit_chained
    from kofft_tpu.config import set_precision
    from kofft_tpu.ops.dft import snr_db
    from kofft_tpu.ops.ndfft import fftn_split

    rng = np.random.default_rng(0)

    def jfftn(q):
        y = jnp.fft.fftn(jax.lax.complex(q[0], q[1]),
                         axes=tuple(range(1, q[0].ndim)))
        return jnp.real(y), jnp.imag(y)

    # ---- 4096^2 ------------------------------------------------------
    m = 4096
    x0r = rng.standard_normal((1, m, m)).astype(np.float32)
    x0i = rng.standard_normal((1, m, m)).astype(np.float32)
    ref = np.fft.fft2(x0r[0].astype(np.complex128) + 1j * x0i[0])
    xr = jnp.asarray(x0r)
    xi = jnp.asarray(x0i)

    tj = timeit_chained(jax.jit(jfftn), (xr, xi), iters=20)
    log(f"4096^2 jnp.fftn          : {tj*1e6:8.1f} us")

    for mode in ("highest", "default"):
        try:
            run = build_2d_twocall(m, m, mode)
            f = jax.jit(run)
            yr, yi = f(xr, xi)
            s = snr_db(ref, np.asarray(yr, np.float64)[0]
                       + 1j * np.asarray(yi, np.float64)[0])
            t = timeit_chained(lambda q: f(q[0], q[1]), (xr, xi), iters=20)
            log(f"4096^2 two-call {mode:7s}  : {t*1e6:8.1f} us  "
                f"SNR {s:.1f} dB")
        except Exception as e:  # noqa: BLE001
            log(f"4096^2 two-call {mode}: FAILED {str(e)[:200]}")

    # current route (what fftn_split does today)
    for prec in (None, "default"):
        set_precision(prec)
        try:
            g = jax.jit(lambda q: fftn_split(q[0], q[1]))
            t = timeit_chained(g, (xr[0], xi[0]), iters=20)
            log(f"4096^2 current route {str(prec):7s}: {t*1e6:8.1f} us")
        finally:
            set_precision(None)

    # ---- 256^3 -------------------------------------------------------
    c0r = rng.standard_normal((256, 256, 256)).astype(np.float32)
    c0i = rng.standard_normal((256, 256, 256)).astype(np.float32)
    ref3 = np.fft.fftn(c0r.astype(np.complex128) + 1j * c0i)
    cr = jnp.asarray(c0r)
    ci = jnp.asarray(c0i)

    def jfftn3(q):
        y = jnp.fft.fftn(jax.lax.complex(q[0], q[1]))
        return jnp.real(y), jnp.imag(y)

    tj = timeit_chained(jax.jit(jfftn3), (cr, ci), iters=20)
    log(f"256^3 jnp.fftn           : {tj*1e6:8.1f} us")

    for prec in (None, "default"):
        set_precision(prec)
        try:
            g = jax.jit(lambda q: fftn_split(q[0], q[1]))
            yr, yi = g((cr, ci))
            s = snr_db(ref3, np.asarray(yr, np.float64)
                       + 1j * np.asarray(yi, np.float64))
            t = timeit_chained(g, (cr, ci), iters=20)
            log(f"256^3 current route {str(prec):7s}: {t*1e6:8.1f} us  "
                f"SNR {s:.1f} dB")
        finally:
            set_precision(None)

    # phased-2D on last two axes (b=256) + dense einsum on axis 0
    from kofft_tpu.ops.pallas_kernels import _build_fft2
    from kofft_tpu.plan import tables
    for mode in ("highest", "default"):
        try:
            run2 = _build_fft2(256, 256, "float32", False, mode)
            fr_, fi_ = tables.dft_matrix(256, "float32")
            frj = jnp.asarray(fr_)
            fij = jnp.asarray(fi_)

            def comp(q, run2=run2, mode=mode):
                ar, ai = q
                yr, yi = run2(256, ar, ai)
                p = (jax.lax.Precision.HIGHEST if mode == "highest"
                     else jax.lax.Precision.DEFAULT)
                e = "jk,jbc->kbc"
                t1 = jnp.einsum(e, frj, yr, precision=p)
                t2 = jnp.einsum(e, fij, yi, precision=p)
                t3 = jnp.einsum(e, frj + fij, yr + yi, precision=p)
                return t1 - t2, t3 - t1 - t2

            f = jax.jit(comp)
            yr, yi = f((cr, ci))
            s = snr_db(ref3, np.asarray(yr, np.float64)
                       + 1j * np.asarray(yi, np.float64))
            t = timeit_chained(f, (cr, ci), iters=20)
            log(f"256^3 fft2+einsum {mode:7s}: {t*1e6:8.1f} us  "
                f"SNR {s:.1f} dB")
        except Exception as e:  # noqa: BLE001
            log(f"256^3 fft2+einsum {mode}: FAILED {str(e)[:200]}")


if __name__ == "__main__":
    main()
