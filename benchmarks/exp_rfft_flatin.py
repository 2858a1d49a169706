"""rfft default-tier floor (r4, VERDICT r3 weak #4): kill the input
relayout with an in-kernel flat-input phase 0.

Accounting (2^20 real, f32, default tier): input (n,) 4 MB; the XLA
(n,) -> (1, n1, n2) relayout reads 4 + writes 4; the kernel reads 4 and
writes the one-sided planes 4 — 16 MB total at the measured ~245 GB/s
= the observed 65 us. A phase 0 that DMAs the RANK-1 flat input
(contiguous (tr, n2) row stripes) into a VMEM input scratch removes the
relayout: 8 MB total => ~40 us if the in-kernel (w,) -> (tr, n2)
shape-cast is free. The r3 flat-input probe lost at HIGHEST (+12.8 us
scatter overhead, hidden savings — the tier is dot-bound); at the
HBM-bound default tier the saving is ~25 us, so the trade may flip.
This probe settles it for the real path at both tiers.

Run: python benchmarks/exp_rfft_flatin.py
"""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_rfft_flatin(n: int, mode: str, interpret: bool = False):
    """Phased real flat kernel with an extra phase 0 that streams the
    rank-1 input into a VMEM scratch (no XLA input relayout)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kofft_tpu.ops import pallas_kernels as PK

    n1, n2 = PK._pow2_split(n)
    t = min(PK._ML_TILE, n1)
    tr = t                              # input rows per phase-0 step
    ph0 = n1 // tr
    ph1 = n2 // t
    ph2 = n1 // t
    h = n2 // 2
    tk = min(PK._ML_TILE, h)
    w = tk * n1
    m_flat = n // 2 + 1
    ph3 = (h // tk) + 1
    keys1 = PK._ml_const_keys(n1)
    keys2 = PK._ml_const_keys(n2)
    consts1 = PK._ml_const_arrays(keys1, "float32")
    consts2 = PK._ml_const_arrays(keys2, "float32")
    nc1 = len(consts1)
    ebr, ebi, ecr, eci = PK._twiddle_factors(n1, n2, t, "float32")
    win = tr * n2                       # phase-0 flat block width

    def kern(*refs):
        (ar,), rest = refs[:1], refs[1:]
        ebr_r, ebi_r, ecr_r, eci_r = rest[:4]
        crefs = rest[4: 4 + nc1 + len(consts2)]
        outs = rest[4 + nc1 + len(consts2):]
        out_r, out_i, scr_in, scr_r, scr_i, sc2_r, sc2_i = outs
        cd1 = PK._unpack_consts(keys1, crefs[:nc1])
        cd2 = PK._unpack_consts(keys2, crefs[nc1:])
        i = pl.program_id(0)

        @pl.when(i < ph0)
        def _stage0():
            # contiguous rows [i*tr, (i+1)*tr) of the (n1, n2) view
            scr_in[pl.ds(i * tr, tr), :] = ar[...].reshape(tr, n2)

        @pl.when(jnp.logical_and(i >= ph0, i < ph0 + ph1))
        def _stage1():
            j = i - ph0
            tbl_r = ecr_r[...]
            tbl_i = eci_r[...]
            lane = jax.lax.broadcasted_iota(jnp.int32, tbl_r.shape, 1)
            sel = (lane == j).astype(tbl_r.dtype)
            c_r = jnp.sum(tbl_r * sel, axis=1, keepdims=True)
            c_i = jnp.sum(tbl_i * sel, axis=1, keepdims=True)
            w_r = c_r * ebr_r[...] - c_i * ebi_r[...]
            w_i = c_r * ebi_r[...] + c_i * ebr_r[...]
            col = scr_in[:, pl.ds(j * t, t)]
            yr, yi = PK._fft_axis0_traced(col, None, n1, cd1, mode)
            scr_r[j] = yr * w_r - yi * w_i
            scr_i[j] = yr * w_i + yi * w_r

        @pl.when(jnp.logical_and(i >= ph0 + ph1, i < ph0 + ph1 + ph2))
        def _stage2():
            j = i - ph0 - ph1
            br = jnp.concatenate(
                [scr_r[c, pl.ds(j * t, t), :] for c in range(ph1)], axis=1)
            bi = jnp.concatenate(
                [scr_i[c, pl.ds(j * t, t), :] for c in range(ph1)], axis=1)
            zr, zi = PK._fft_axis0_traced(br.T, bi.T, n2, cd2, mode)
            sc2_r[j] = zr[:h]
            sc2_i[j] = zi[:h]

        @pl.when(i >= ph0 + ph1 + ph2)
        def _stage3():
            p = i - ph0 - ph1 - ph2
            is_tail = (p == ph3 - 1)

            @pl.when(jnp.logical_not(is_tail))
            def _rows():
                rs = jnp.concatenate(
                    [sc2_r[c, pl.ds(p * tk, tk), :] for c in range(ph2)],
                    axis=1)
                im = jnp.concatenate(
                    [sc2_i[c, pl.ds(p * tk, tk), :] for c in range(ph2)],
                    axis=1)
                out_r[...] = rs.reshape(w)
                out_i[...] = im.reshape(w)

            @pl.when(is_tail)
            def _nyquist():
                sgn = 1.0 - 2.0 * (jax.lax.broadcasted_iota(
                    jnp.int32, (1, t), 1) % 2).astype(jnp.float32)
                acc_r = jnp.float32(0.0)
                acc_i = jnp.float32(0.0)
                for c in range(ph1):
                    acc_r += jnp.sum(scr_r[c, 0:1, :] * sgn)
                    acc_i += jnp.sum(scr_i[c, 0:1, :] * sgn)
                lane = jax.lax.iota(jnp.int32, w)
                out_r[...] = jnp.where(lane == 0, acc_r, 0.0)
                out_i[...] = jnp.where(lane == 0, acc_i, 0.0)

    # rank-1 input: phase-0 step i reads flat block i; later steps pin
    # to the last block (revisited unread)
    data_in = pl.BlockSpec((win,), lambda i: (jnp.minimum(i, ph0 - 1),),
                           memory_space=pltpu.VMEM)
    data_out = pl.BlockSpec(
        (w,), lambda i: (jnp.maximum(i - ph0 - ph1 - ph2, 0),),
        memory_space=pltpu.VMEM)
    base = pl.BlockSpec((n1, t), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    col = pl.BlockSpec((n1, n2 // t), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)

    def run(x):
        return pl.pallas_call(
            kern, grid=(ph0 + ph1 + ph2 + ph3,),
            in_specs=[data_in, base, base, col, col]
            + PK._const_vmem_specs(consts1) + PK._const_vmem_specs(consts2),
            out_specs=[data_out, data_out],
            out_shape=[jax.ShapeDtypeStruct((m_flat,), jnp.float32)] * 2,
            scratch_shapes=[pltpu.VMEM((n1, n2), jnp.float32)]
            + [pltpu.VMEM((ph1, n1, t), jnp.float32)] * 2
            + [pltpu.VMEM((ph2, h, t), jnp.float32)] * 2,
            interpret=interpret,
            **({} if interpret else {"compiler_params":
                pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024)}),
        )(x, jnp.asarray(ebr), jnp.asarray(ebi), jnp.asarray(ecr),
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
    x0 = rng.standard_normal(n).astype(np.float32)
    ref = np.fft.rfft(x0.astype(np.float64))
    x = jnp.asarray(x0)

    def pp(yr, yi):
        return (jnp.concatenate([yr[: n // 2], yi[: n // 2]]) * 1e-3,)

    for mode in ("default", "highest"):
        # baseline: shipped flat kernel ((1, n1, n2) operand + relayout)
        run0 = PK._build_phased(n, "float32", False, mode, real=True,
                                flat=True)
        f0 = jax.jit(lambda p: pp(*run0(1, p[0].reshape(1, n1, n2))))
        t0 = timeit_chained(f0, (x,), iters=100)
        yr, yi = run0(1, x.reshape(1, n1, n2))
        s0 = snr_db(ref, np.asarray(yr, np.float64)
                    + 1j * np.asarray(yi, np.float64))
        log(f"{mode:7s} shipped flat : {t0*1e6:6.1f} us  SNR {s0:.1f} dB")
        try:
            run1 = build_rfft_flatin(n, mode)
            f1 = jax.jit(lambda p: pp(*run1(p[0])))
            yr, yi = run1(x)
            s1 = snr_db(ref, np.asarray(yr, np.float64)
                        + 1j * np.asarray(yi, np.float64))
            t1 = timeit_chained(f1, (x,), iters=100)
            log(f"{mode:7s} flat-in ph0  : {t1*1e6:6.1f} us  "
                f"SNR {s1:.1f} dB")
        except Exception as e:  # noqa: BLE001
            log(f"{mode:7s} flat-in ph0: FAILED {str(e)[:250]}")


if __name__ == "__main__":
    main()
