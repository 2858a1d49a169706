"""Quantify the chaining-structure bias: ping-pong vs scalar-carry.

bench.py times the complex FFT with timeit_chained (outputs feed the next
iteration's inputs — XLA ping-pongs two hot buffer sets) but rfft with
timeit_chained_scalar (fixed input re-perturbed per iteration; all
intermediates are fresh allocations inside the loop body). If the two
structures cost differently, the recorded rfft-vs-complex comparison is
biased. Measures both transforms under BOTH structures.
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
    from kofft_tpu.bench import timeit_chained, timeit_chained_scalar

    rng = np.random.default_rng(0)
    n = 1 << 20
    b = 1
    xr = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

    # complex, ping-pong (the bench.py methodology for this row)
    t_c_pp = timeit_chained(lambda p: kt.fft_split(p[0], p[1]), (xr, xi),
                            iters=100)
    log(f"complex ping-pong:     {t_c_pp*1e6:.1f} us")

    # complex, scalar-carry (same op, the rfft row's methodology)
    def cfft_step(p, acc):
        yr, yi = kt.fft_split(p[0] * (1.0 + 1e-7 * acc), p[1])
        return acc + yr[0, 0] * 1e-20 + yi[0, 0] * 1e-20

    t_c_sc = timeit_chained_scalar(cfft_step, (xr, xi))
    log(f"complex scalar-carry:  {t_c_sc*1e6:.1f} us")

    # rfft, scalar-carry (current bench methodology)
    def rfft_step(a, acc):
        yr, yi = kt.rfft_split(a * (1.0 + 1e-7 * acc))
        return acc + yr[0, 0] * 1e-20 + yi[0, 0] * 1e-20

    t_r_sc = timeit_chained_scalar(rfft_step, xr)
    log(f"rfft scalar-carry:     {t_r_sc*1e6:.1f} us")

    # rfft, ping-pong: rebuild a same-shape real input from the output
    # planes (one cheap concat; measured 1.0 us) so outputs feed inputs
    def rfft_pp(a):
        yr, yi = kt.rfft_split(a)
        nxt = jnp.concatenate([yr[..., : n // 2], yi[..., : n // 2]],
                              axis=-1) * 1e-3
        return (nxt,)

    t_r_pp = timeit_chained(lambda p: rfft_pp(p[0]), (xr,), iters=100)
    log(f"rfft ping-pong:        {t_r_pp*1e6:.1f} us")


if __name__ == "__main__":
    main()
