"""Batched flat phase-3 output vs the tiled batched grid (r4, VERDICT
r3 next #1: make batched >= single per row at both tiers).

The single transform's win over the batched per-row time is the rank-1
flat phase-3 output (sublane-dense linearization from the second VMEM
scratch, ~6 us vs the relayout the tiled output pays downstream). r4
extends flat mode to batched complex rows: output is one rank-1 (b*n,)
plane, block index b_*ph3 + p — every block keeps the 1-D layout.

Candidates at 8 x 2^20, both tiers, PUBLIC (b, n) operands:
  A. current route (tiled grid, rows=2 fold[, bf16-in at default])
  B. flat-batched kernel on pre-tiled operands + (b*n,)->(b,n) reshape
  C. B behind the public flat->tiled input relayout (the real contract)
  D. B with bf16 input cast at default tier

Run: python benchmarks/exp_batch_flat.py
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

    import kofft_tpu as kt
    from kofft_tpu.bench import timeit_chained
    from kofft_tpu.config import set_precision
    from kofft_tpu.ops import pallas_kernels as PK
    from kofft_tpu.ops.dft import snr_db

    rng = np.random.default_rng(0)
    n = 1 << 20
    b = 8
    n1, n2 = PK._pow2_split(n)
    x0r = rng.standard_normal((b, n)).astype(np.float32)
    x0i = rng.standard_normal((b, n)).astype(np.float32)
    xr = jnp.asarray(x0r)
    xi = jnp.asarray(x0i)
    art = jnp.asarray(x0r.reshape(b, n1, n2))
    ait = jnp.asarray(x0i.reshape(b, n1, n2))
    ref0 = np.fft.fft(x0r[0].astype(np.complex128) + 1j * x0i[0])

    def snr(yr, yi):
        y = (np.asarray(yr, np.float64)
             + 1j * np.asarray(yi, np.float64)).reshape(b, n)
        return snr_db(ref0, y[0])

    for mode in ("highest", "default"):
        log(f"--- tier {mode} ---")
        # A: public route today
        try:
            set_precision(None if mode == "highest" else mode)
            f = jax.jit(lambda q: kt.fft_split(q[0], q[1]))
            jax.block_until_ready(f((xr, xi)))
            t = timeit_chained(f, (xr, xi), iters=30)
            log(f"A public current   : {t*1e6/b:7.1f} us/row")
        finally:
            set_precision(None)

        # B: flat-batched kernel, pre-tiled operands
        run = PK._build_phased(n, "float32", False, mode, flat=True)
        fB = jax.jit(lambda q: tuple(
            z.reshape(b, n) for z in run(b, q[0], q[1])))
        try:
            yr, yi = jax.block_until_ready(fB((art, ait)))
            t = timeit_chained(fB, (art, ait), iters=30)
            log(f"B flat pre-tiled   : {t*1e6/b:7.1f} us/row "
                f"(SNR {snr(yr, yi):.1f} dB)")
        except Exception as e:  # noqa: BLE001
            log(f"B flat pre-tiled   : FAILED {str(e)[:160]}")

        # C: flat-batched behind the public (b, n) relayout
        fC = jax.jit(lambda q: tuple(
            z.reshape(b, n) for z in run(
                b, q[0].reshape(b, n1, n2), q[1].reshape(b, n1, n2))))
        try:
            yr, yi = jax.block_until_ready(fC((xr, xi)))
            t = timeit_chained(fC, (xr, xi), iters=30)
            log(f"C flat public      : {t*1e6/b:7.1f} us/row "
                f"(SNR {snr(yr, yi):.1f} dB)")
        except Exception as e:  # noqa: BLE001
            log(f"C flat public      : FAILED {str(e)[:160]}")

        # D: default tier only — bf16 input cast (asymmetric I/O)
        if mode == "default":
            fD = jax.jit(lambda q: tuple(
                z.reshape(b, n) for z in run(
                    b,
                    q[0].reshape(b, n1, n2).astype(jnp.bfloat16),
                    q[1].reshape(b, n1, n2).astype(jnp.bfloat16))))
            try:
                yr, yi = jax.block_until_ready(fD((xr, xi)))
                t = timeit_chained(fD, (xr, xi), iters=30)
                log(f"D flat public bf16 : {t*1e6/b:7.1f} us/row "
                    f"(SNR {snr(yr, yi):.1f} dB)")
            except Exception as e:  # noqa: BLE001
                log(f"D flat public bf16 : FAILED {str(e)[:160]}")


if __name__ == "__main__":
    main()
