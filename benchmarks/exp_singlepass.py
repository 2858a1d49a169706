"""Single-pallas-call 2^20 FFT retry, justified by the r2 cost model.

The r1 negative result ("in-VMEM transpose costs what the saved HBM pass
saves") was concluded under the DMA-bound model. r2 isolation showed the
composed two-call path pays ~57 us of inter-call materialization while
in-VMEM block transposes measure ~7 us — so a fused single call should
now win if Mosaic accepts the shapes and the VMEM budget holds
(in 8 + tw 8 + out 8 MB + line-FFT temporaries at 2^20).

OUTCOME (r2, measured): the kernel compiles and executes, but Mosaic
takes ~350 s to compile the full-width traced body (two 1024-line FFT
recursions + a 1024x1024 in-VMEM transpose in one kernel), and the
process then stalls on post-run host downloads. Disqualified on compile
time regardless of runtime — kept as the recorded retry so the negative
result carries its evidence.
"""
from __future__ import annotations

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


@functools.lru_cache(maxsize=None)
def build_sp(n: int, mode: str = "highest", real: bool = False,
             interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kofft_tpu.ops import pallas_kernels as PK
    from kofft_tpu.plan import tables

    n1, n2 = PK._pow2_split(n)
    keys1 = PK._ml_const_keys(n1)
    keys2 = PK._ml_const_keys(n2)
    consts1 = PK._ml_const_arrays(keys1, "float32")
    consts2 = PK._ml_const_arrays(keys2, "float32")
    twr, twi = tables.twiddle(n1, n2, "float32")
    nc1 = len(consts1)

    def unpack(keys, refs):
        return {k: (refs[2 * i][...], refs[2 * i + 1][...])
                for i, k in enumerate(keys)}

    def kern(*refs):
        if real:
            ar, = refs[:1]
            rest = refs[1:]
            ai = None
        else:
            ar, ai = refs[:2]
            rest = refs[2:]
        twr_r, twi_r = rest[:2]
        cr1 = rest[2: 2 + nc1]          # nc1 arrays (2 per key)
        rest2 = rest[2 + nc1:]
        cr2, (out_r, out_i) = rest2[:-2], rest2[-2:]
        cd1 = unpack(keys1, cr1)
        cd2 = unpack(keys2, cr2)
        yr, yi = PK._fft_axis0_traced(ar[0], None if real else ai[0],
                                      n1, cd1, mode)      # (n1, n2)
        w_r = twr_r[...]
        w_i = twi_r[...]
        cr = yr * w_r - yi * w_i
        ci = yr * w_i + yi * w_r
        crt = cr.T                                        # (n2, n1)
        cit = ci.T
        zr, zi = PK._fft_axis0_traced(crt, cit, n2, cd2, mode)
        out_r[0] = zr
        out_i[0] = zi

    def const_specs(arrs):
        return [pl.BlockSpec(a.shape,
                             (lambda nd: lambda i: (0,) * nd)(a.ndim),
                             memory_space=pltpu.VMEM) for a in arrs]

    data_in = pl.BlockSpec((1, n1, n2), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    data_out = pl.BlockSpec((1, n2, n1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    nin = 1 if real else 2

    def run(b, ar, ai=None):
        args = (ar,) if real else (ar, ai)
        import jax.numpy as jnp
        return pl.pallas_call(
            kern, grid=(b,),
            in_specs=[data_in] * nin + const_specs([twr, twi])
            + const_specs(consts1) + const_specs(consts2),
            out_specs=[data_out, data_out],
            out_shape=[jax.ShapeDtypeStruct((b, n2, n1), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            interpret=interpret,
        )(*args, jnp.asarray(twr), jnp.asarray(twi),
          *[jnp.asarray(c) for c in consts1],
          *[jnp.asarray(c) for c in consts2])

    return run


def main():
    import jax
    import jax.numpy as jnp

    from kofft_tpu.bench import timeit_chained
    from kofft_tpu.ops.dft import snr_db

    rng = np.random.default_rng(0)
    n = 1 << 20
    b = 1
    import kofft_tpu.ops.pallas_kernels as PK
    n1, n2 = PK._pow2_split(n)
    xr = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))

    run = build_sp(n)
    zr, zi = jax.jit(lambda p: run(b, p[0], p[1]))((xr, xi))
    got = (np.asarray(zr)[0].T.reshape(n)
           + 1j * np.asarray(zi)[0].T.reshape(n))
    ref = np.fft.fft(np.asarray(xr)[0].reshape(n).astype(np.complex128)
                     + 1j * np.asarray(xi)[0].reshape(n).astype(np.float64))
    log(f"single-pass SNR: {snr_db(ref, got):.1f} dB")

    t = timeit_chained(jax.jit(lambda p: run(b, p[0], p[1])), (xr, xi),
                       iters=100)
    log(f"single-pass 2^20 c32: {t*1e6:.1f} us  (two-call path: ~174)")

    runr = build_sp(n, real=True)
    tr = timeit_chained(jax.jit(lambda p: runr(b, p[0])), (xr,), iters=100)
    log(f"single-pass 2^20 real-input: {tr*1e6:.1f} us")


if __name__ == "__main__":
    main()
