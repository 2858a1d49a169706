"""Per-stage chip breakdown of the multilevel FFT kernel at 2^20.

Times each pallas stage in isolation (chained, differential) plus a pure
copy kernel on the same block shapes — the DMA floor. Sweeps tile size.
"""
from __future__ import annotations

import functools
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

    rng = np.random.default_rng(0)
    n = 1 << 20
    n1, n2 = PK._pow2_split(n)
    b = 1
    ar = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))
    ai = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))

    # --- copy-kernel DMA floor on the stage-1 block shape ---
    def copy_floor(t):
        def k(xr, xi, outr, outi):
            outr[...] = xr[...]
            outi[...] = xi[...]

        data = pl.BlockSpec((1, n1, t), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            k, grid=(b, n2 // t),
            in_specs=[data, data], out_specs=[data, data],
            out_shape=[jax.ShapeDtypeStruct((b, n1, n2), jnp.float32)] * 2)
        tt = timeit_chained(lambda p: f(p[0], p[1]), (ar, ai), iters=100)
        log(f"copy t={t}: {tt*1e6:.1f} us "
            f"({4*4*n/tt/1e9:.0f} GB/s eff in+out)")

    import os
    if os.environ.get("EXP_COPY"):
        # measured 2026-08-16: t=128 6.8us / t=256 6.3 / t=512 6.2 —
        # 2.4+ TB/s: chained-loop operands are VMEM-resident (S(1)),
        # so the kernels are compute-bound in the bench regime.
        for t in (128, 256, 512, 1024):
            copy_floor(t)

    # --- per-stage timing at each tile ---
    tiles = tuple(int(s) for s in
                  os.environ.get("EXP_TILES", "128,256").split(","))
    for tile in tiles:
        for mode_bt in (1,):
            n1_, n2_, s1, s1r, s2, s2h = PK._build_ml(
                n, "float32", False, "highest", mode_bt, tile)
            f1 = jax.jit(lambda p: s1(b, p[0], p[1]))
            t1 = timeit_chained(lambda p: f1(p), (ar, ai), iters=100)
            f2 = jax.jit(lambda p: s2(b, p[0], p[1]))
            t2 = timeit_chained(lambda p: f2(p), (ar, ai), iters=100)
            f1r = jax.jit(lambda p: (s1r(b, p[0])[0], p[1]))
            t1r = timeit_chained(lambda p: f1r(p), (ar, ai), iters=100)

            # s2 vs s2h under an identical dependency-carrier wrapper (the
            # carrier costs one extra elementwise pass; it cancels in the
            # comparison)
            def dep(fn):
                def g(p):
                    o1, o2 = fn(b, p[0], p[1])
                    s = (o1[0, 0, 0] + o2[0, 0, 0]) * 1e-20
                    return (p[0] + s, p[1])
                return jax.jit(g)

            t2d = timeit_chained(dep(s2), (ar, ai), iters=100)
            t2hd = timeit_chained(dep(s2h), (ar, ai), iters=100)
            log(f"tile={tile}: s1={t1*1e6:.1f} s2={t2*1e6:.1f} "
                f"s1r={t1r*1e6:.1f} s2/dep={t2d*1e6:.1f} "
                f"s2h/dep={t2hd*1e6:.1f} us")


if __name__ == "__main__":
    main()
