"""Phased one-call FFT: both four-step stages in ONE pallas_call, the
inter-stage C matrix held in persistent VMEM scratch across grid steps.

Unlike the full-width single-pass retry (exp_singlepass.py — ~350 s
Mosaic compile, disqualified), each grid step here traces only a
TILE-width body: steps 0..n2/t-1 run stage 1 (write C tile into
scratch), steps n2/t.. run stage 2 (read C rows from scratch, write the
output tile). Removes the inter-call C materialization: ~17 us of XLA
boundary for VMEM-carried single transforms, and 16 MB/row of REAL HBM
round trip in the batched regime (8x2^20: 128 of 256 MB total traffic).

Scratch layout: (n2/t, n1, t) — stage-1 step i writes chunk [i] (leading
-dim dynamic index, always supported); stage-2 step j concatenates the
(t, t) row-slices of every chunk into its (t, n2) line block.
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
def build_phased(n: int, mode: str = "highest", interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kofft_tpu.ops import pallas_kernels as PK

    n1, n2 = PK._pow2_split(n)
    t = min(PK._ML_TILE, n1)
    ph1 = n2 // t                      # stage-1 steps
    ph2 = n1 // t                      # stage-2 steps
    keys1 = PK._ml_const_keys(n1)
    keys2 = PK._ml_const_keys(n2)
    consts1 = PK._ml_const_arrays(keys1, "float32")
    consts2 = PK._ml_const_arrays(keys2, "float32")
    nc1 = len(consts1)
    ebr, ebi, ecr, eci = PK._twiddle_factors(n1, n2, t, "float32")

    def unpack(keys, refs):
        return {k: (refs[2 * i][...], refs[2 * i + 1][...])
                for i, k in enumerate(keys)}

    def kern(ar, ai, ebr_r, ebi_r, ecr_r, eci_r, *rest):
        crefs = rest[: nc1 + len(consts2)]
        out_r, out_i, scr_r, scr_i = rest[nc1 + len(consts2):]
        cd1 = unpack(keys1, crefs[:nc1])
        cd2 = unpack(keys2, crefs[nc1:])
        i = pl.program_id(1)

        @pl.when(i < ph1)
        def _stage1():
            # column tile i: FFT each length-n1 column, twiddle, stash
            yr, yi = PK._fft_axis0_traced(ar[0], ai[0], n1, cd1, mode)
            tbl_r = ecr_r[...]
            tbl_i = eci_r[...]
            lane = jax.lax.broadcasted_iota(jnp.int32, tbl_r.shape, 1)
            sel = (lane == i).astype(tbl_r.dtype)
            c_r = jnp.sum(tbl_r * sel, axis=1, keepdims=True)
            c_i = jnp.sum(tbl_i * sel, axis=1, keepdims=True)
            w_r = c_r * ebr_r[...] - c_i * ebi_r[...]
            w_i = c_r * ebi_r[...] + c_i * ebr_r[...]
            scr_r[i] = yr * w_r - yi * w_i
            scr_i[i] = yr * w_i + yi * w_r

        @pl.when(i >= ph1)
        def _stage2():
            j = i - ph1
            # gather line block (t, n2): rows [j*t, j*t+t) of the
            # (n1, n2) C view = the same row range of every chunk
            br = jnp.concatenate(
                [scr_r[c, pl.ds(j * t, t), :] for c in range(ph1)], axis=1)
            bi = jnp.concatenate(
                [scr_i[c, pl.ds(j * t, t), :] for c in range(ph1)], axis=1)
            zr, zi = PK._fft_axis0_traced(br.T, bi.T, n2, cd2, mode)
            out_r[0] = zr                      # (n2, t)
            out_i[0] = zi

    def const_specs(arrs):
        return [pl.BlockSpec(a.shape,
                             (lambda nd: lambda b_, i: (0,) * nd)(a.ndim),
                             memory_space=pltpu.VMEM) for a in arrs]

    data_in = pl.BlockSpec((1, n1, t),
                           lambda b_, i: (b_, 0, jnp.minimum(i, ph1 - 1)),
                           memory_space=pltpu.VMEM)
    data_out = pl.BlockSpec(
        (1, n2, t),
        lambda b_, i: (b_, 0, jnp.maximum(i - ph1, 0)),
        memory_space=pltpu.VMEM)
    base = pl.BlockSpec((n1, t), lambda b_, i: (0, 0),
                        memory_space=pltpu.VMEM)
    col = pl.BlockSpec((n1, n2 // t), lambda b_, i: (0, 0),
                       memory_space=pltpu.VMEM)

    def run(b, ar, ai):
        import jax.numpy as jnp
        return pl.pallas_call(
            kern, grid=(b, ph1 + ph2),
            in_specs=[data_in, data_in, base, base, col, col]
            + const_specs(consts1) + const_specs(consts2),
            out_specs=[data_out, data_out],
            out_shape=[jax.ShapeDtypeStruct((b, n2, n1), jnp.float32)] * 2,
            scratch_shapes=[pltpu.VMEM((ph1, n1, t), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(ar, ai, jnp.asarray(ebr), jnp.asarray(ebi), jnp.asarray(ecr),
          jnp.asarray(eci), *[jnp.asarray(c) for c in consts1],
          *[jnp.asarray(c) for c in consts2])

    return run


def main():
    import jax
    import jax.numpy as jnp

    from kofft_tpu.bench import timeit_chained
    from kofft_tpu.ops.dft import snr_db
    import kofft_tpu.ops.pallas_kernels as PK

    rng = np.random.default_rng(0)
    n = 1 << 20
    n1, n2 = PK._pow2_split(n)

    for b in (1, 8):
        xr = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))
        run = build_phased(n)
        f = jax.jit(lambda p, run=run, b=b: run(b, p[0], p[1]))
        zr, zi = jax.block_until_ready(f((xr, xi)))
        if b == 1:
            got = (np.asarray(zr)[0].reshape(n)
                   + 1j * np.asarray(zi)[0].reshape(n))
            ref = np.fft.fft(
                np.asarray(xr)[0].reshape(n).astype(np.complex128)
                + 1j * np.asarray(xi)[0].reshape(n).astype(np.float64))
            log(f"phased SNR: {snr_db(ref, got):.1f} dB")
        tt = timeit_chained(f, (xr, xi), iters=50)
        log(f"phased {b}x2^20: {tt*1e6:.1f} us = {b*n/tt/1e9:.2f} Gpts/s "
            f"(two-call: {174 if b == 1 else 1478} us)")


if __name__ == "__main__":
    main()
