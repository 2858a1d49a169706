"""Flat multi-level DFT for smooth n with odd factors > 23 (r4,
VERDICT r3 missing #1: 10^6 = 2^6*5^6 falls off the phased kernel's
smooth zone and pays the recursive matmul tree's many HBM passes:
268 us vs the pow2 line's ~141).

Design: reshape flat x to the factor cube (f0, f1, ..., f_{d-1}) and
contract axis p with the dense DFT matrix F_{f_p} each pass
(dimension_numbers ((0,),(p,))). The dot_general output order
(lhs-free, rhs-free...) = (k_p, k_{p-1}, ..., k_0, j_{p+1}, ...) IS the
digit rotation, so after d passes the tensor sits in (k_{d-1},...,k_0)
order whose row-major flattening is the NATURAL-ORDER spectrum — no
transposes anywhere (the same rotation trick as the fused N-D kernel,
plus the 1-D twiddles between passes, factored into tiny (f_p, f_t)
tables so no n-sized twiddle plane ever materializes).

Variants measured:
  A. pure XLA (jit) at highest/default — one materialized pass per level
  B. one-call Pallas kernel (whole cube VMEM-resident, one HBM
     round-trip) if Mosaic lowers the rank-3 dot_general
against the current matmul-tree route (kt.fft_split) and jnp.fft.

Run: python benchmarks/exp_smooth_cube.py
"""
from __future__ import annotations

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _factor_cube(n: int, fmax: int = 512) -> list:
    """Split smooth n into balanced factors each <= fmax."""
    from kofft_tpu.plan import balanced_split
    out = [n]
    while max(out) > fmax:
        m = max(out)
        i = out.index(m)
        a, b = balanced_split(m)
        out[i:i + 1] = [a, b]
        out.sort(reverse=True)
    return out


def _twiddle_pair(np_, fp: int, ft: int, mt: int, dtype: str):
    """(fp, ft) table of w_{np_}^{k_p * j_t * mt} (exact integer phase)."""
    k = np.arange(fp, dtype=np.int64)
    j = np.arange(ft, dtype=np.int64)
    ph = np.mod(np.outer(k, j) * (mt % np_), np_)
    ang = (-2.0 * np.pi / np_) * ph.astype(np.float64)
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def build_cube_consts(n: int, factors: list, dtype: str = "float32"):
    from kofft_tpu.plan import tables
    d = len(factors)
    dfts = [tables.dft_matrix(f, dtype) for f in factors]
    tws = []  # tws[p] = list of ((fp, ft) tables) for t in p+1..d-1
    for p in range(d - 1):
        np_ = 1
        for t in range(p, d):
            np_ *= factors[t]
        row = []
        for t in range(p + 1, d):
            mt = 1
            for s in range(t + 1, d):
                mt *= factors[s]
            row.append(_twiddle_pair(np_, factors[p], factors[t], mt,
                                     dtype))
        tws.append(row)
    return dfts, tws


def cube_fft_planes(xr, xi, factors, dfts, tws, mode="highest"):
    """The flat multi-level DFT on SoA planes (traced; XLA or in-kernel)."""
    import jax.numpy as jnp
    from kofft_tpu.ops.pallas_kernels import _cdot
    d = len(factors)
    tr = xr.reshape(tuple(factors))
    ti = xi.reshape(tuple(factors))
    for p in range(d):
        fr, fi = dfts[p]
        fr = jnp.asarray(fr)
        fi = jnp.asarray(fi)
        tr, ti = _cdot(fr, fi, tr, ti, ((0,), (p,)), mode)
        # axes now (k_p, k_{p-1}, ..., k_0, j_{p+1}, ..., j_{d-1})
        if p < d - 1:
            for ti_idx, t in enumerate(range(p + 1, d)):
                wr, wi = tws[p][ti_idx]
                wr = jnp.asarray(wr)
                wi = jnp.asarray(wi)
                # broadcast (f_p, ..., f_t, ...): k_p is axis 0, j_t is
                # axis (p + 1) + (t - p - 1) = t
                shape = [1] * d
                shape[0] = factors[p]
                shape[t] = factors[t]
                wr = wr.reshape(shape)
                wi = wi.reshape(shape)
                tr, ti = tr * wr - ti * wi, tr * wi + ti * wr
    n = 1
    for f in factors:
        n *= f
    return tr.reshape(n), ti.reshape(n)


def build_cube_kernel(n: int, factors: tuple, dtype: str = "float32",
                      mode: str = "highest", interpret: bool = False):
    """One-call Pallas variant: whole cube VMEM-resident."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dfts, tws = build_cube_consts(n, list(factors), dtype)
    flat_consts = []
    for fr, fi in dfts:
        flat_consts += [fr, fi]
    for row in tws:
        for wr, wi in row:
            flat_consts += [wr, wi]

    d = len(factors)

    def kern(ar_ref, ai_ref, *rest):
        crefs = rest[:-2]
        yr_ref, yi_ref = rest[-2:]
        idx = 0
        dref = []
        for _ in range(d):
            dref.append((crefs[idx][...], crefs[idx + 1][...]))
            idx += 2
        twref = []
        for p in range(d - 1):
            row = []
            for _ in range(p + 1, d):
                row.append((crefs[idx][...], crefs[idx + 1][...]))
                idx += 2
            twref.append(row)
        from kofft_tpu.ops.pallas_kernels import _cdot
        tr = ar_ref[...].reshape(factors)
        ti = ai_ref[...].reshape(factors)
        for p in range(d):
            fr, fi = dref[p]
            tr, ti = _cdot(fr, fi, tr, ti, ((0,), (p,)), mode)
            if p < d - 1:
                for t_i, t in enumerate(range(p + 1, d)):
                    wr, wi = twref[p][t_i]
                    shape = [1] * d
                    shape[0] = factors[p]
                    shape[t] = factors[t]
                    wr = wr.reshape(shape)
                    wi = wi.reshape(shape)
                    tr, ti = tr * wr - ti * wi, tr * wi + ti * wr
        yr_ref[...] = tr.reshape(n)
        yi_ref[...] = ti.reshape(n)

    vec = pl.BlockSpec((n,), lambda: (0,), memory_space=pltpu.VMEM)
    cspecs = [pl.BlockSpec(c.shape, (lambda nd: lambda: (0,) * nd)(c.ndim),
                           memory_space=pltpu.VMEM) for c in flat_consts]
    f = pl.pallas_call(
        kern, grid=(),
        in_specs=[vec, vec] + cspecs,
        out_specs=[vec, vec],
        out_shape=[jax.ShapeDtypeStruct((n,), jnp.float32)] * 2,
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}),
    )
    return lambda ar, ai: f(ar, ai, *[jnp.asarray(c) for c in flat_consts])


def main():
    import jax
    import jax.numpy as jnp

    import kofft_tpu as kt
    from kofft_tpu.bench import timeit_chained

    from kofft_tpu.ops.dft import snr_db

    rng = np.random.default_rng(0)
    n = 10 ** 6
    factors = _factor_cube(n)
    log(f"n={n} factors={factors}")
    x0r = rng.standard_normal(n).astype(np.float32)
    x0i = rng.standard_normal(n).astype(np.float32)
    ref = np.fft.fft(x0r.astype(np.complex128) + 1j * x0i)
    xr = jnp.asarray(x0r)
    xi = jnp.asarray(x0i)

    # current route (matmul tree)
    t0 = timeit_chained(
        lambda q: tuple(a * 1e-3 for a in kt.fft_split(q[0], q[1])),
        (xr, xi), iters=50)
    log(f"tree route     : {t0*1e6:7.1f} us")

    dfts, tws = build_cube_consts(n, factors)
    for mode in ("highest", "default"):
        f = jax.jit(functools.partial(cube_fft_planes, factors=factors,
                                      dfts=dfts, tws=tws, mode=mode))
        yr, yi = f(xr, xi)
        s = snr_db(ref, np.asarray(yr, np.float64)
                   + 1j * np.asarray(yi, np.float64))
        t = timeit_chained(
            lambda q: tuple(a * 1e-3 for a in f(q[0], q[1])), (xr, xi),
            iters=50)
        log(f"XLA cube {mode:7s}: {t*1e6:7.1f} us  SNR {s:.1f} dB")

    for mode in ("highest", "default"):
        try:
            run = build_cube_kernel(n, tuple(factors), mode=mode)
            g = jax.jit(run)
            yr, yi = g(xr, xi)
            s = snr_db(ref, np.asarray(yr, np.float64)
                       + 1j * np.asarray(yi, np.float64))
            t = timeit_chained(
                lambda q: tuple(a * 1e-3 for a in g(q[0], q[1])),
                (xr, xi), iters=50)
            log(f"PL  cube {mode:7s}: {t*1e6:7.1f} us  SNR {s:.1f} dB")
        except Exception as e:  # noqa: BLE001
            log(f"PL  cube {mode}: FAILED {str(e)[:300]}")


if __name__ == "__main__":
    main()
