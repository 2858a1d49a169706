"""Isolate the rfft one-sided assembly epilogue cost at 2^20.

Per-stage chip data (exp_stage, tile=128): s1r=64.8 s2h~81 us, but the
full rfft measures ~206 us — where do the other ~60 us go? Suspects: the
(b, n/2)+(b, 1) concatenate to the lane-hostile 524289 width, the
Nyquist reduction, or the scalar-carry harness's input perturbation.
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

    from kofft_tpu.bench import timeit_chained, timeit_chained_scalar
    from kofft_tpu.ops import pallas_kernels as PK

    rng = np.random.default_rng(0)
    n = 1 << 20
    b = 1
    x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

    # (a) full current rfft kernel path incl. epilogue
    def rfft_step(a, acc):
        yr, yi = PK.fused_multilevel_rfft(a * (1.0 + 1e-7 * acc), n)
        return acc + yr[0, 0] * 1e-20 + yi[0, 0] * 1e-20

    t_full = timeit_chained_scalar(rfft_step, x)
    log(f"full rfft (kernel+epilogue): {t_full*1e6:.1f} us")

    # (b) kernel stages only (no one-sided assembly): s1r + s2h, carry
    n1, n2 = PK._pow2_split(n)
    _, _, _, s1r, _, s2h = PK._build_ml(n, "float32", False, "highest",
                                        PK._ml_batch_tile(b, n1, n2))

    def stages_step(a, acc):
        cr, ci = s1r(b, (a * (1.0 + 1e-7 * acc)).reshape(b, n1, n2))
        hr, hi = s2h(b, cr, ci)
        return acc + hr[0, 0, 0] * 1e-20 + hi[0, 0, 0] * 1e-20

    t_st = timeit_chained_scalar(stages_step, x)
    log(f"s1r+s2h only:               {t_st*1e6:.1f} us")

    # (c) epilogue only: one-sided assembly from stage outputs
    cr0, ci0 = s1r(b, x.reshape(b, n1, n2))
    hr0, hi0 = s2h(b, cr0, ci0)
    hr0, hi0 = jax.block_until_ready((hr0, hi0))
    signs = jnp.asarray(np.where(np.arange(n2) % 2 == 0, 1.0, -1.0)
                        .astype(np.float32))

    def epi(hr, hi, cr, ci):
        nr = jnp.sum(cr[:, 0, :] * signs, axis=-1)[:, None]
        ni = jnp.sum(ci[:, 0, :] * signs, axis=-1)[:, None]
        yr = jnp.concatenate([hr.reshape(b, n // 2), nr], axis=-1)
        yi = jnp.concatenate([hi.reshape(b, n // 2), ni], axis=-1)
        return yr, yi

    def epi_step(opnds, acc):
        hr, hi, cr, ci = opnds
        yr, yi = epi(hr * (1.0 + 1e-7 * acc), hi, cr, ci)
        return acc + yr[0, 0] * 1e-20 + yi[0, -1] * 1e-20

    t_epi = timeit_chained_scalar(epi_step, (hr0, hi0, cr0, ci0))
    log(f"epilogue only (nyq+concat): {t_epi*1e6:.1f} us")

    # (d) concat alone (pure layout cost of the odd width)
    fr = jnp.asarray(rng.standard_normal((b, n // 2)).astype(np.float32))
    one = jnp.asarray(np.zeros((b, 1), np.float32))

    def cat_step(p, acc):
        y = jnp.concatenate([p * (1.0 + 1e-7 * acc), one], axis=-1)
        return acc + y[0, 0] * 1e-20 + y[0, -1] * 1e-20

    t_cat = timeit_chained_scalar(cat_step, fr)
    log(f"concat to n/2+1 alone:      {t_cat*1e6:.1f} us")

    # (e) harness floor: the input-perturbation multiply itself
    def mul_step(p, acc):
        y = p * (1.0 + 1e-7 * acc)
        return acc + y[0, 0] * 1e-20

    t_mul = timeit_chained_scalar(mul_step, x)
    log(f"input-perturb multiply:     {t_mul*1e6:.1f} us")


if __name__ == "__main__":
    main()
