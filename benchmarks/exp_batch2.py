"""Batched phased kernel, round 4: where do the ~25 us/row go?

BENCH_r03 shows batched large transforms SLOWER per row than singles at
both tiers (8x2^20: 166 vs 141 us/row HIGHEST, 95 vs 70 DEFAULT) — a
fixed ~25 us/row overhead, consistent with a pipeline bubble at each
batch-row transition of the (b, phases) grid: stage-2 steps of row b
read only scratch (input DMA idle), then row b+1's stage-1 suddenly
needs input blocks again while the row-b output tail drains.

Variants measured here (raw kernel, pre-tiled (b, n1, n2) operands):

  V0  shipped batched grid (b, ph1+ph2)          [baseline]
  V1  V0 + ping-pong scratch indexed by row parity (tests whether the
      cross-row scratch WAR hazard serializes Mosaic's pipeline)
  V2  interleaved software pipeline: grid (b+1, ph); step (r, i) runs
      stage-1 of row r column i AND stage-2 of row r-1 line i — input
      fetch, compute, and output drain all stay active at every step,
      no row-boundary bubble by construction
  V3  bt=2 rows per grid step (amortizes transitions 2x, doubles block
      size)

Run: python benchmarks/exp_batch2.py   (on the attached TPU)
Results (v5e, 8x2^20 c32, chained differential timing): see bottom.
"""
from __future__ import annotations

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_interleaved(n: int, dtype: str, mode: str, nb: int,
                      interpret: bool = False):
    """V2: cross-row software pipeline (complex, tiled I/O)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kofft_tpu.ops import pallas_kernels as PK

    n1, n2 = PK._pow2_split(n)
    t = min(PK._ML_TILE, n1)
    ph1 = n2 // t
    ph2 = n1 // t
    ph = max(ph1, ph2)
    keys1 = PK._ml_const_keys(n1)
    keys2 = PK._ml_const_keys(n2)
    consts1 = PK._ml_const_arrays(keys1, dtype)
    consts2 = PK._ml_const_arrays(keys2, dtype)
    nc1 = len(consts1)
    ebr, ebi, ecr, eci = PK._twiddle_factors(n1, n2, t, dtype)

    def kern(*refs):
        (ar, ai), rest = refs[:2], refs[2:]
        ebr_r, ebi_r, ecr_r, eci_r = rest[:4]
        crefs = rest[4: 4 + nc1 + len(consts2)]
        out_r, out_i, scr_r, scr_i = rest[4 + nc1 + len(consts2):]
        cd1 = PK._unpack_consts(keys1, crefs[:nc1])
        cd2 = PK._unpack_consts(keys2, crefs[nc1:])
        r = pl.program_id(0)
        i = pl.program_id(1)
        sel = jax.lax.rem(r, 2)          # stage-1 writes scratch[sel]
        osel = jax.lax.rem(r + 1, 2)     # stage-2 reads the other

        @pl.when(jnp.logical_and(r < nb, i < ph1))
        def _stage1():
            yr, yi = PK._fft_axis0_traced(ar[0], ai[0], n1, cd1, mode)
            tbl_r = ecr_r[...]
            tbl_i = eci_r[...]
            lane = jax.lax.broadcasted_iota(jnp.int32, tbl_r.shape, 1)
            s = (lane == i).astype(tbl_r.dtype)
            c_r = jnp.sum(tbl_r * s, axis=1, keepdims=True)
            c_i = jnp.sum(tbl_i * s, axis=1, keepdims=True)
            w_r = c_r * ebr_r[...] - c_i * ebi_r[...]
            w_i = c_r * ebi_r[...] + c_i * ebr_r[...]
            cr = yr * w_r - yi * w_i
            ci = yr * w_i + yi * w_r
            scr_r[sel * ph1 + i] = cr
            scr_i[sel * ph1 + i] = ci

        @pl.when(jnp.logical_and(r >= 1, i < ph2))
        def _stage2():
            br = jnp.concatenate(
                [scr_r[osel * ph1 + c, pl.ds(i * t, t), :]
                 for c in range(ph1)], axis=1)
            bi = jnp.concatenate(
                [scr_i[osel * ph1 + c, pl.ds(i * t, t), :]
                 for c in range(ph1)], axis=1)
            zr, zi = PK._fft_axis0_traced(br.T, bi.T, n2, cd2, mode)
            out_r[0] = zr
            out_i[0] = zi

    # input: row r column i while r < nb; drain row pins to the last
    # fetched block (no refetch, no wasted DMA)
    data_in = pl.BlockSpec(
        (1, n1, t),
        lambda r, i: (jnp.minimum(r, nb - 1),
                      0,
                      jnp.where(r >= nb, ph1 - 1, jnp.minimum(i, ph1 - 1))),
        memory_space=pltpu.VMEM)
    # output: row r-1 line i once r >= 1; during row 0 pin constant so
    # the unwritten block is fetched once and flushed once
    data_out = pl.BlockSpec(
        (1, n2, t),
        lambda r, i: (jnp.maximum(r - 1, 0),
                      0,
                      jnp.where(r == 0, 0, jnp.minimum(i, ph2 - 1))),
        memory_space=pltpu.VMEM)
    base = pl.BlockSpec((n1, t), lambda r, i: (0, 0),
                        memory_space=pltpu.VMEM)
    col = pl.BlockSpec((n1, n2 // t), lambda r, i: (0, 0),
                       memory_space=pltpu.VMEM)

    def run(ar, ai):
        return pl.pallas_call(
            kern, grid=(nb + 1, ph),
            in_specs=[data_in, data_in, base, base, col, col]
            + PK._const_vmem_specs(consts1) + PK._const_vmem_specs(consts2),
            out_specs=[data_out, data_out],
            out_shape=[jax.ShapeDtypeStruct((nb, n2, n1), jnp.float32)] * 2,
            scratch_shapes=[pltpu.VMEM((2 * ph1, n1, t), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=32 * nb * n * max(1, n.bit_length() // 5),
                bytes_accessed=4 * 2 * nb * n * 2,
                transcendentals=0),
            **({} if interpret else {"compiler_params":
                pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)}),
            interpret=interpret,
        )(ar, ai, jnp.asarray(ebr), jnp.asarray(ebi), jnp.asarray(ecr),
          jnp.asarray(eci), *[jnp.asarray(c) for c in consts1],
          *[jnp.asarray(c) for c in consts2])

    return run


def build_pingpong(n: int, dtype: str, mode: str, interpret: bool = False):
    """V1: shipped grid shape, scratch doubled and indexed by row parity."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kofft_tpu.ops import pallas_kernels as PK

    n1, n2 = PK._pow2_split(n)
    t = min(PK._ML_TILE, n1)
    ph1 = n2 // t
    ph2 = n1 // t
    keys1 = PK._ml_const_keys(n1)
    keys2 = PK._ml_const_keys(n2)
    consts1 = PK._ml_const_arrays(keys1, dtype)
    consts2 = PK._ml_const_arrays(keys2, dtype)
    nc1 = len(consts1)
    ebr, ebi, ecr, eci = PK._twiddle_factors(n1, n2, t, dtype)

    def kern(*refs):
        (ar, ai), rest = refs[:2], refs[2:]
        ebr_r, ebi_r, ecr_r, eci_r = rest[:4]
        crefs = rest[4: 4 + nc1 + len(consts2)]
        out_r, out_i, scr_r, scr_i = rest[4 + nc1 + len(consts2):]
        cd1 = PK._unpack_consts(keys1, crefs[:nc1])
        cd2 = PK._unpack_consts(keys2, crefs[nc1:])
        b_ = pl.program_id(0)
        i = pl.program_id(1)
        sel = jax.lax.rem(b_, 2)

        @pl.when(i < ph1)
        def _stage1():
            yr, yi = PK._fft_axis0_traced(ar[0], ai[0], n1, cd1, mode)
            tbl_r = ecr_r[...]
            tbl_i = eci_r[...]
            lane = jax.lax.broadcasted_iota(jnp.int32, tbl_r.shape, 1)
            s = (lane == i).astype(tbl_r.dtype)
            c_r = jnp.sum(tbl_r * s, axis=1, keepdims=True)
            c_i = jnp.sum(tbl_i * s, axis=1, keepdims=True)
            w_r = c_r * ebr_r[...] - c_i * ebi_r[...]
            w_i = c_r * ebi_r[...] + c_i * ebr_r[...]
            scr_r[sel * ph1 + i] = yr * w_r - yi * w_i
            scr_i[sel * ph1 + i] = yr * w_i + yi * w_r

        @pl.when(i >= ph1)
        def _stage2():
            j = i - ph1
            br = jnp.concatenate(
                [scr_r[sel * ph1 + c, pl.ds(j * t, t), :]
                 for c in range(ph1)], axis=1)
            bi = jnp.concatenate(
                [scr_i[sel * ph1 + c, pl.ds(j * t, t), :]
                 for c in range(ph1)], axis=1)
            zr, zi = PK._fft_axis0_traced(br.T, bi.T, n2, cd2, mode)
            out_r[0] = zr
            out_i[0] = zi

    data_in = pl.BlockSpec((1, n1, t),
                           lambda b_, i: (b_, 0, jnp.minimum(i, ph1 - 1)),
                           memory_space=pltpu.VMEM)
    data_out = pl.BlockSpec(
        (1, n2, t), lambda b_, i: (b_, 0, jnp.maximum(i - ph1, 0)),
        memory_space=pltpu.VMEM)
    base = pl.BlockSpec((n1, t), lambda b_, i: (0, 0),
                        memory_space=pltpu.VMEM)
    col = pl.BlockSpec((n1, n2 // t), lambda b_, i: (0, 0),
                       memory_space=pltpu.VMEM)

    def run(b, ar, ai):
        return pl.pallas_call(
            kern, grid=(b, ph1 + ph2),
            in_specs=[data_in, data_in, base, base, col, col]
            + PK._const_vmem_specs(consts1) + PK._const_vmem_specs(consts2),
            out_specs=[data_out, data_out],
            out_shape=[jax.ShapeDtypeStruct((b, n2, n1), jnp.float32)] * 2,
            scratch_shapes=[pltpu.VMEM((2 * ph1, n1, t), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=32 * b * n * max(1, n.bit_length() // 5),
                bytes_accessed=4 * 2 * b * n * 2,
                transcendentals=0),
            **({} if interpret else {"compiler_params":
                pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)}),
            interpret=interpret,
        )(ar, ai, jnp.asarray(ebr), jnp.asarray(ebi), jnp.asarray(ecr),
          jnp.asarray(eci), *[jnp.asarray(c) for c in consts1],
          *[jnp.asarray(c) for c in consts2])

    return run


def main():
    import jax
    import jax.numpy as jnp

    from kofft_tpu.bench import timeit_chained
    from kofft_tpu.ops import pallas_kernels as PK
    from kofft_tpu.ops.dft import snr_db

    rng = np.random.default_rng(0)
    n = 1 << 20
    n1, n2 = PK._pow2_split(n)
    b = 8
    ar = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))
    ai = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))

    # parity oracle for V2 once (highest): flat row-major of (n2, n1)
    # output = natural-order spectrum
    run2 = build_interleaved(n, "float32", "highest", b)
    yr, yi = jax.jit(lambda p: run2(p[0], p[1]))((ar, ai))
    x = (np.asarray(ar) + 1j * np.asarray(ai)).reshape(b, n)
    ref = np.fft.fft(x.astype(np.complex128))
    got = (np.asarray(yr) + 1j * np.asarray(yi)).reshape(b, n)
    s = snr_db(ref, got)
    log(f"V2 parity SNR: {s:.1f} dB")
    assert s > 100.0

    for mode in ("highest", "default"):
        r0 = PK._build_phased(n, "float32", False, mode)
        f0 = jax.jit(lambda p, r=r0: r(b, p[0], p[1]))
        t0 = timeit_chained(f0, (ar, ai), iters=30)
        log(f"{mode:8s} V0 shipped grid : {t0*1e6/b:7.1f} us/row")

        r1 = build_pingpong(n, "float32", mode)
        f1 = jax.jit(lambda p, r=r1: r(b, p[0], p[1]))
        t1 = timeit_chained(f1, (ar, ai), iters=30)
        log(f"{mode:8s} V1 ping-pong    : {t1*1e6/b:7.1f} us/row")

        r2 = build_interleaved(n, "float32", mode, b)
        f2 = jax.jit(lambda p, r=r2: r(p[0], p[1]))
        t2 = timeit_chained(f2, (ar, ai), iters=30)
        log(f"{mode:8s} V2 interleaved  : {t2*1e6/b:7.1f} us/row")

        # single-row reference line
        rs = PK._build_phased(n, "float32", False, mode)
        fs = jax.jit(lambda p, r=rs: r(1, p[0], p[1]))
        ts = timeit_chained(fs, (ar[:1], ai[:1]), iters=30)
        log(f"{mode:8s} single (b=1)    : {ts*1e6:7.1f} us/row")


if __name__ == "__main__":
    main()
