"""r5 probe: 256^3 (VERDICT r4 #5 — beat jnp at `highest` or prove floor).

exp_2d_big.py's negative ("fused-2D + einsum loses at both tiers") was
diagnosed as small per-image blocks: a 256^2 image gives 128 KB grid
blocks. The new bt fold in _build_fft2 (r5) runs bt slabs per grid step
as WIDE line FFTs (1 MB+ blocks, fatter dots). Candidate pipeline:

    axes (1,2): _build_fft2(256, 256, bt=B) — ONE kernel round-trip
    axis 0:     dense Gauss einsum 'jk,jmc->kmc' (left-GEMM, no
                transpose: XLA contracts axis 0 in place)

vs the shipped per-axis engine and jnp.fftn, both tiers.

Run: python benchmarks/exp_cube.py
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
    from kofft_tpu.config import set_precision, lax_precision
    from kofft_tpu.ops import pallas_kernels as PK
    from kofft_tpu.ops.ndfft import fftn_split
    from kofft_tpu.ops.dft import snr_db
    from kofft_tpu.plan import tables
    from kofft_tpu.utils.observability import enable_compilation_cache

    enable_compilation_cache()
    m = 256
    rng = np.random.default_rng(9)
    x32r = rng.standard_normal((m, m, m)).astype(np.float32)
    x32i = rng.standard_normal((m, m, m)).astype(np.float32)
    xr = jnp.asarray(x32r)
    xi = jnp.asarray(x32i)
    # subsampled exact oracle (full f64 fftn of 16.7M points is slow):
    # slabs of the k0 axis via W @ fftn(axes=(1,2))
    a = np.fft.fftn(x32r.astype(np.complex128) + 1j * x32i, axes=(1, 2))
    ks = np.linspace(0, m - 1, 4).astype(np.int64)
    w = np.exp(-2j * np.pi * ks[:, None] * np.arange(m)[None, :] / m)
    ref = np.tensordot(w, a, axes=(1, 0))

    def snr_of(yr, yi):
        got = (np.asarray(yr, np.float64)[ks]
               + 1j * np.asarray(yi, np.float64)[ks])
        return snr_db(ref, got)

    def make_candidate(mode, bt):
        run2d = PK._build_fft2(m, m, "float32", False, mode, bt)
        f1r, f1i = tables.dft_matrix(m, "float32")

        def cand(q):
            ar, ai = q
            yr, yi = run2d(m, ar, ai)
            p = lax_precision()
            fr = jnp.asarray(f1r)
            fi = jnp.asarray(f1i)
            t1 = jnp.einsum("jk,jmc->kmc", fr, yr, precision=p)
            t2 = jnp.einsum("jk,jmc->kmc", fi, yi, precision=p)
            t3 = jnp.einsum("jk,jmc->kmc", fr + fi, yr + yi, precision=p)
            return (t1 - t2) * 1e-3, (t3 - t1 - t2) * 1e-3

        return cand

    def jf(q):
        y = jnp.fft.fftn(jax.lax.complex(q[0], q[1]))
        return jnp.real(y) * 1e-3, jnp.imag(y) * 1e-3

    for tier in (None, "default"):
        name = tier or "highest"
        floor = 100.0 if tier is None else 40.0
        log(f"--- tier {name} ---")
        try:
            set_precision(tier)
            t0 = timeit_chained(
                lambda q: tuple(v * 1e-3 for v in fftn_split(q[0], q[1])),
                (xr, xi), iters=10, target_time=0.2)
            log(f"{name:8s} shipped per-axis : {t0*1e6:7.1f} us")
            tj = timeit_chained(jf, (xr, xi), iters=10, target_time=0.2)
            log(f"{name:8s} jnp.fftn         : {tj*1e6:7.1f} us")
            for bt in (8, 16):
                try:
                    cand = make_candidate("default" if tier else "highest",
                                          bt)
                    f = jax.jit(cand)
                    yr, yi = f((xr, xi))
                    s = snr_of(np.asarray(yr) * 1e3, np.asarray(yi) * 1e3)
                    assert s > floor, (bt, s)
                    t = timeit_chained(f, (xr, xi), iters=10,
                                       target_time=0.2)
                    log(f"{name:8s} fused2d bt={bt:2d} + GEMM: "
                        f"{t*1e6:7.1f} us (SNR {s:.1f})")
                except Exception as e:
                    log(f"{name:8s} bt={bt}: FAILED {type(e).__name__}: "
                        f"{str(e)[:140]}")
        finally:
            set_precision(None)


if __name__ == "__main__":
    main()
