"""Stage-1 cost structure at 2^20: precision passes + relayout probes.

Stage data (tile=128): s1=80.3 us vs a ~49 us HIGHEST MXU floor — where
are the other ~30 us, and do fewer bf16 passes actually pay?

Probes (each timed in isolation on the chip):
  s1 @ highest    18 passes/level (Gauss 3 dots x bf16_6x)      [baseline]
  s1 @ high       12 passes/level (4 dots x manual bf16x3)
  s1 @ default     3 passes/level (Gauss 3 dots x single bf16)
  s2 @ highest    stage 2 baseline (includes (2,0,1) transpose)
  s2-notr         stage-2 WRONG-MATH structure probe: transpose replaced
                  by reshape — isolates the lane<->sublane transpose cost
                  (timing only; results are numerically meaningless)
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

    rng = np.random.default_rng(0)
    n = 1 << 20
    n1, n2 = PK._pow2_split(n)
    b = 1
    ar = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))
    ai = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))

    for mode in ("highest", "high", "default"):
        _, _, s1, _, s2, _ = PK._build_ml(n, "float32", False, mode, 1, 128)
        f1 = jax.jit(lambda p, s1=s1: s1(b, p[0], p[1]))
        t1 = timeit_chained(lambda p, f1=f1: f1(p), (ar, ai), iters=100)
        log(f"s1 @ {mode}: {t1*1e6:.1f} us")
        if mode == "highest":
            f2 = jax.jit(lambda p, s2=s2: s2(b, p[0], p[1]))
            t2 = timeit_chained(lambda p, f2=f2: f2(p), (ar, ai), iters=100)
            log(f"s2 @ {mode}: {t2*1e6:.1f} us")

    # structure probe: stage-2 without the (2,0,1) block transpose
    keys2 = PK._ml_const_keys(n2)
    consts2 = PK._ml_const_arrays(keys2, "float32")
    t = 128

    def s2_notr_kernel(cr, ci, *crefs):
        const_refs, (xr_o, xi_o) = crefs[:-2], crefs[-2:]
        cd = {k: (const_refs[2 * i][...], const_refs[2 * i + 1][...])
              for i, k in enumerate(keys2)}
        br = cr[...].reshape(n2, t)          # WRONG math, same volumes
        bi = ci[...].reshape(n2, t)
        yr, yi = PK._fft_axis0_traced(br, bi, n2, cd, "highest")
        xr_o[...] = yr.reshape(1, n2, t)
        xi_o[...] = yi.reshape(1, n2, t)

    def const_specs(arrs):
        return [pl.BlockSpec(a.shape,
                             (lambda nd: lambda i, j: (0,) * nd)(a.ndim),
                             memory_space=pltpu.VMEM) for a in arrs]

    data_in = pl.BlockSpec((1, t, n2), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    data_out = pl.BlockSpec((1, n2, t), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
    f_notr = pl.pallas_call(
        s2_notr_kernel, grid=(b, n1 // t),
        in_specs=[data_in, data_in] + const_specs(consts2),
        out_specs=[data_out, data_out],
        out_shape=[jax.ShapeDtypeStruct((b, n2, n1), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    f2n = jax.jit(lambda p: f_notr(p[0], p[1],
                                   *[jnp.asarray(c) for c in consts2]))
    t2n = timeit_chained(lambda p: f2n(p), (ar, ai), iters=100)
    log(f"s2-notr (no transpose, wrong math): {t2n*1e6:.1f} us")


if __name__ == "__main__":
    main()
