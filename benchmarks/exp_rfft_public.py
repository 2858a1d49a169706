"""r3 experiment: where does the public rfft's ~40 us over the raw
kernel go, and can a Pallas flat-assembly phase reclaim it?

Public rfft_split at 2^20 measured 163.6 us (r2 bench) vs 122.0 for the
raw phased real kernel; the delta is the flat one-sided assembly
(reshape (b,h,n1)->(b,n/2) relayout + Nyquist concat) plus the flat
input relayout. This script measures each piece ping-pong-chained
(methodology-matched with bench.py's rows) and prototypes a standalone
"flatten+append" Pallas kernel that emits the (b, n/2+1) flat planes
directly from the tiled kernel outputs in one pass.

Run on the chip: python benchmarks/exp_rfft_public.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import kofft_tpu as kt
from kofft_tpu.bench.harness import timeit_chained
from kofft_tpu.ops.pallas_kernels import (_build_phased, _pow2_split,
                                          _kernel_precision)

N = 1 << 20
N1, N2 = _pow2_split(N)
H = N2 // 2


def pingpong(fn, planes):
    """timeit_chained over a self-feeding tuple."""
    return timeit_chained(fn, planes, iters=50)


def main():
    rng = np.random.default_rng(7)
    run = _build_phased(N, "float32", False, _kernel_precision(), real=True)

    # A. raw kernel on tiled operands (the 122 us baseline)
    xt = jnp.asarray(rng.standard_normal((1, N1, N2)).astype(np.float32))

    def raw(p):
        hr, hi, c0r, c0i = run(1, p[0])
        # rebuild a tiled real input from the outputs (ping-pong)
        nxt = jnp.concatenate([hr, hi], axis=1).reshape(1, N1, N2) * 1e-3
        return (nxt,)

    t = pingpong(raw, (xt,))
    print(f"A raw phased real kernel (tiled io): {t*1e6:.1f} us")

    # B. + flat input (relayout on the way in)
    xf = jnp.asarray(rng.standard_normal((1, N)).astype(np.float32))

    def flat_in(p):
        hr, hi, c0r, c0i = run(1, p[0].reshape(1, N1, N2))
        nxt = jnp.concatenate([hr, hi], axis=1).reshape(1, N) * 1e-3
        return (nxt,)

    t = pingpong(flat_in, (xf,))
    print(f"B + flat input reshape:              {t*1e6:.1f} us")

    # C. + flat one-sided assembly (the current public path shape)
    def public_shape(p):
        yr, yi = kt.rfft_split(p[0])
        nxt = jnp.concatenate([yr[..., : N // 2], yi[..., : N // 2]],
                              axis=-1) * 1e-3
        return (nxt,)

    t = pingpong(public_shape, (xf,))
    print(f"C public rfft_split (reshape+concat): {t*1e6:.1f} us")

    # D. assembly variants, isolated: start from tiled kernel outputs
    hr0, hi0, c0r0, c0i0 = run(1, xt)
    hr0 = jax.block_until_ready(hr0)

    signs = jnp.asarray(np.where(np.arange(N2) % 2 == 0, 1.0, -1.0)
                        .astype(np.float32))

    def asm_reshape_concat(p):
        hr, hi, c0r, c0i = p
        nr = jnp.sum(c0r[:, 0, :] * signs, axis=-1)[:, None]
        ni = jnp.sum(c0i[:, 0, :] * signs, axis=-1)[:, None]
        yr = jnp.concatenate([hr.reshape(1, N // 2), nr], axis=-1)
        yi = jnp.concatenate([hi.reshape(1, N // 2), ni], axis=-1)
        # feed back: slice to n/2 and retile
        nhr = yr[:, : N // 2].reshape(1, H, N1)
        nhi = yi[:, : N // 2].reshape(1, H, N1)
        return nhr * 1e-3, nhi * 1e-3, c0r, c0i

    t = pingpong(asm_reshape_concat, (hr0, hi0, c0r0, c0i0))
    print(f"D assembly reshape+concat (current): {t*1e6:.1f} us "
          f"(incl. feedback retile)")

    # E. Pallas flatten+append kernel
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = N // 2 + 1

    def make_flatten(tk: int):
        nblk = (M + tk * N1 - 1) // (tk * N1)
        w = tk * N1

        def kern(hr_ref, hi_ref, nr_ref, ni_ref, or_ref, oi_ref):
            p = pl.program_id(1)
            is_tail = p == nblk - 1

            @pl.when(jnp.logical_not(is_tail))
            def _body():
                or_ref[...] = hr_ref[0].reshape(1, w)
                oi_ref[...] = hi_ref[0].reshape(1, w)

            @pl.when(is_tail)
            def _tail():
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
                or_ref[...] = jnp.where(lane == 0, nr_ref[0, 0], 0.0)
                oi_ref[...] = jnp.where(lane == 0, ni_ref[0, 0], 0.0)

        data = pl.BlockSpec((1, tk, N1),
                            lambda b, p: (b, jnp.minimum(p, H // tk - 1), 0),
                            memory_space=pltpu.VMEM)
        nspec = pl.BlockSpec((1, 1), lambda b, p: (b, 0),
                             memory_space=pltpu.VMEM)
        out = pl.BlockSpec((1, w), lambda b, p: (b, p),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, grid=(1, nblk),
            in_specs=[data, data, nspec, nspec],
            out_specs=[out, out],
            out_shape=[jax.ShapeDtypeStruct((1, M), jnp.float32)] * 2,
        )

    for tk in (8, 32, 128):
        flat = make_flatten(tk)
        hr3 = hr0.reshape(1, H, N1)
        hi3 = hi0.reshape(1, H, N1)
        nr0 = jnp.sum(c0r0[:, 0, :] * signs, axis=-1)[:, None]
        ni0 = jnp.sum(c0i0[:, 0, :] * signs, axis=-1)[:, None]

        def asm_pallas(p, flat=flat):
            hr, hi, nr, ni = p
            yr, yi = flat(hr, hi, nr, ni)
            nhr = yr[:, : N // 2].reshape(1, H, N1)
            nhi = yi[:, : N // 2].reshape(1, H, N1)
            return nhr * 1e-3, nhi * 1e-3, nr, ni

        try:
            t = pingpong(asm_pallas, (hr3, hi3, nr0, ni0))
            print(f"E pallas flatten tk={tk}:             {t*1e6:.1f} us "
                  f"(incl. feedback retile)")
        except Exception as e:
            print(f"E pallas flatten tk={tk}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")

    # F. feedback-retile-only control (what D/E's feedback costs)
    def retile_only(p):
        yr, yi = p
        nhr = yr[:, : N // 2].reshape(1, H, N1)
        yr2 = jnp.concatenate([nhr.reshape(1, N // 2), yr[:, N // 2:]],
                              axis=-1)
        return yr2 * 1e-3 + 1e-9, yi

    yr0 = jnp.concatenate([hr0.reshape(1, N // 2),
                           jnp.zeros((1, 1), jnp.float32)], axis=-1)
    yi0 = jnp.concatenate([hi0.reshape(1, N // 2),
                           jnp.zeros((1, 1), jnp.float32)], axis=-1)
    t = pingpong(retile_only, (yr0, yi0))
    print(f"F control slice+retile+reshape+concat one plane: {t*1e6:.1f} us")


if __name__ == "__main__":
    main()
