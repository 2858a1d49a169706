"""Decompose the ~70.5 us relayout-only stage cost (2^20, tile=128).

The identity-leaf probe showed a stage is ~88% relayout/VPU. Which op?
Wrong-math structure probes, each one pallas stage with parts removed:

  full      identity-leaf line FFT, all relayouts     [baseline: 70.5]
  no-mid    level reshapes kept, mid swapaxes+twiddle removed
  no-lvl    no level reshapes at all (flat elementwise only)
  tw-only   only the twiddle multiply (no line FFT structure)
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
    t = 128
    b = 1
    ar = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))
    ai = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))
    a_, c_ = PK._ml_split(n1)          # 32, 32

    def build(body):
        def kern(xr, xi, outr, outi):
            rr, ii = body(xr[0], xi[0])
            outr[0] = rr
            outi[0] = ii

        data = pl.BlockSpec((1, n1, t), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            kern, grid=(b, n2 // t),
            in_specs=[data, data], out_specs=[data, data],
            out_shape=[jax.ShapeDtypeStruct((b, n1, n2), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))
        return jax.jit(lambda p: f(p[0], p[1]))

    def full(xr, xi):
        # identity-leaf line FFT: all relayouts, no dots, with twiddle
        def rec(m, vr, vi):
            if m <= PK._ML_LEAF:
                return vr, vi
            aa, bb = PK._ml_split(m)
            tc = vr.shape[-1]
            vr = vr.reshape(aa, bb * tc)
            vi = vi.reshape(aa, bb * tc)
            vr, vi = rec(aa, vr, vi)
            vr = vr.reshape(aa, bb, tc)
            vi = vi.reshape(aa, bb, tc)
            cr = vr * 1.000001 - vi * 0.000001      # twiddle-shaped mul
            ci = vr * 0.000001 + vi * 1.000001
            cr = jnp.swapaxes(cr, 0, 1).reshape(bb, aa * tc)
            ci = jnp.swapaxes(ci, 0, 1).reshape(bb, aa * tc)
            cr, ci = rec(bb, cr, ci)
            return cr.reshape(m, tc), ci.reshape(m, tc)
        return rec(n1, xr, xi)

    def no_mid(xr, xi):
        # level reshapes only, no swapaxes/twiddle between levels
        def rec(m, vr, vi):
            if m <= PK._ML_LEAF:
                return vr, vi
            aa, bb = PK._ml_split(m)
            tc = vr.shape[-1]
            vr = vr.reshape(aa, bb * tc)
            vi = vi.reshape(aa, bb * tc)
            vr, vi = rec(aa, vr, vi)
            vr = vr.reshape(bb, aa * tc)   # reshape WITHOUT swap (wrong)
            vi = vi.reshape(bb, aa * tc)
            vr, vi = rec(bb, vr, vi)
            return vr.reshape(m, tc), vi.reshape(m, tc)
        return rec(n1, xr, xi)

    def no_lvl(xr, xi):
        return xr * 1.000001 + xi * 0.000001, xi * 1.000001

    def tw_only(xr, xi):
        v = xr.reshape(a_, c_, t)
        w = xi.reshape(a_, c_, t)
        cr = jnp.swapaxes(v, 0, 1).reshape(n1, t)
        ci = jnp.swapaxes(w, 0, 1).reshape(n1, t)
        return cr, ci

    for name, body in (("full", full), ("no-mid", no_mid),
                       ("no-lvl", no_lvl), ("tw-only(1 swap)", tw_only)):
        f = build(body)
        tt = timeit_chained(f, (ar, ai), iters=100)
        log(f"{name}: {tt*1e6:.1f} us")


if __name__ == "__main__":
    main()
