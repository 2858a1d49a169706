"""Batched phased kernel, part 4 (r4): the two untried levers from
VERDICT r3 next-#1 — (a) Mosaic ``dimension_semantics`` marking the
batch grid axis parallel, (b) bt=2 rows per grid step (the V3 variant
exp_batch2.py listed but never ran: halves row transitions, doubles
DMA block size to 1 MB, doubles scratch).

Context (exp_batch2/2b): the gap vs b=1 is NOT a row-boundary bubble
(ping-pong scratch, full cross-row interleave: identical) and the b=1
number is flattered by XLA pinning the chained-loop carry into VMEM.
These two variants attack the remaining candidates: Mosaic scheduling
conservatism across the batch axis, and DMA-count granularity.

Parity is asserted for every variant (marking the batch axis parallel
while rows REUSE the same scratch buffer is a WAR hazard if Mosaic
actually reorders — a wrong result here kills the variant).

Run: python benchmarks/exp_batch3.py
"""
from __future__ import annotations

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_batched(n: int, mode: str, bt: int = 1, semantics=None,
                  interpret: bool = False):
    """Phased complex kernel (non-flat) with bt rows per grid step and
    optional dimension_semantics."""
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
    consts1 = PK._ml_const_arrays(keys1, "float32")
    consts2 = PK._ml_const_arrays(keys2, "float32")
    nc1 = len(consts1)
    ebr, ebi, ecr, eci = PK._twiddle_factors(n1, n2, t, "float32")

    def kern(*refs):
        (ar, ai), rest = refs[:2], refs[2:]
        ebr_r, ebi_r, ecr_r, eci_r = rest[:4]
        crefs = rest[4: 4 + nc1 + len(consts2)]
        out_r, out_i, scr_r, scr_i = rest[4 + nc1 + len(consts2):]
        cd1 = PK._unpack_consts(keys1, crefs[:nc1])
        cd2 = PK._unpack_consts(keys2, crefs[nc1:])
        i = pl.program_id(1)

        @pl.when(i < ph1)
        def _stage1():
            tbl_r = ecr_r[...]
            tbl_i = eci_r[...]
            lane = jax.lax.broadcasted_iota(jnp.int32, tbl_r.shape, 1)
            sel = (lane == i).astype(tbl_r.dtype)
            c_r = jnp.sum(tbl_r * sel, axis=1, keepdims=True)
            c_i = jnp.sum(tbl_i * sel, axis=1, keepdims=True)
            w_r = c_r * ebr_r[...] - c_i * ebi_r[...]
            w_i = c_r * ebi_r[...] + c_i * ebr_r[...]
            for r in range(bt):
                yr, yi = PK._fft_axis0_traced(ar[r], ai[r], n1, cd1, mode)
                scr_r[r, i] = yr * w_r - yi * w_i
                scr_i[r, i] = yr * w_i + yi * w_r

        @pl.when(i >= ph1)
        def _stage2():
            j = i - ph1
            for r in range(bt):
                br = jnp.concatenate(
                    [scr_r[r, c, pl.ds(j * t, t), :] for c in range(ph1)],
                    axis=1)
                bi = jnp.concatenate(
                    [scr_i[r, c, pl.ds(j * t, t), :] for c in range(ph1)],
                    axis=1)
                zr, zi = PK._fft_axis0_traced(br.T, bi.T, n2, cd2, mode)
                out_r[r] = zr
                out_i[r] = zi

    data_in = pl.BlockSpec((bt, n1, t),
                           lambda b_, i: (b_, 0, jnp.minimum(i, ph1 - 1)),
                           memory_space=pltpu.VMEM)
    data_out = pl.BlockSpec(
        (bt, n2, t), lambda b_, i: (b_, 0, jnp.maximum(i - ph1, 0)),
        memory_space=pltpu.VMEM)
    base = pl.BlockSpec((n1, t), lambda b_, i: (0, 0),
                        memory_space=pltpu.VMEM)
    col = pl.BlockSpec((n1, n2 // t), lambda b_, i: (0, 0),
                       memory_space=pltpu.VMEM)
    cp = dict(vmem_limit_bytes=110 * 1024 * 1024)
    if semantics is not None:
        cp["dimension_semantics"] = semantics

    def run(b, ar, ai):
        return pl.pallas_call(
            kern, grid=(b // bt, ph1 + ph2),
            in_specs=[data_in, data_in, base, base, col, col]
            + PK._const_vmem_specs(consts1) + PK._const_vmem_specs(consts2),
            out_specs=[data_out, data_out],
            out_shape=[jax.ShapeDtypeStruct((b, n2, n1), jnp.float32)] * 2,
            scratch_shapes=[pltpu.VMEM((bt, ph1, n1, t), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(**cp),
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
    a0r = rng.standard_normal((b, n1, n2)).astype(np.float32)
    a0i = rng.standard_normal((b, n1, n2)).astype(np.float32)
    ref = np.fft.fft((a0r + 1j * a0i).reshape(b, n).astype(np.complex128))
    ar = jnp.asarray(a0r)
    ai = jnp.asarray(a0i)

    variants = [
        ("B0 shipped grid      ", dict(bt=1, semantics=None)),
        ("B1 parallel batch dim", dict(bt=1,
                                       semantics=("parallel", "arbitrary"))),
        ("B2 bt=2 rows/step    ", dict(bt=2, semantics=None)),
        ("B3 bt=2 + parallel   ", dict(bt=2,
                                       semantics=("parallel", "arbitrary"))),
        ("B4 bt=4 rows/step    ", dict(bt=4, semantics=None)),
    ]
    for mode in ("highest", "default"):
        for name, kw in variants:
            try:
                run = build_batched(n, mode, **kw)
                f = jax.jit(lambda p, r=run: r(b, p[0], p[1]))
                yr, yi = f((ar, ai))
                got = (np.asarray(yr, np.float64)
                       + 1j * np.asarray(yi, np.float64)).reshape(b, n)
                s = snr_db(ref, got)
                t = timeit_chained(f, (ar, ai), iters=30)
                log(f"{mode:8s} {name}: {t*1e6/b:7.1f} us/row  "
                    f"SNR {s:.1f} dB")
            except Exception as e:  # noqa: BLE001
                log(f"{mode:8s} {name}: FAILED "
                    f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
