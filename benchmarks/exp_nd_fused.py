"""Fused one-call N-D kernel probes (r3).

All axis passes of a VMEM-resident grid in one pallas_call: per pass the
current last axis contracts with its dense DFT matrix as the dot LHS,
whose (lhs-free, rhs-free) output order is the cyclic axis rotation —
no explicit transposes, only row-major reshapes between passes.

Measured (v5e, HIGHEST, chained-dependency timing):

    shape            fused      prior path        note
    128^3            175.4 us   211.9 (einsum)    -17%, SNR 135.3 dB
    512^2             50.8 us    55.8 (engine)    -9%
    1024^2           404.3 us   147   (jnp zone)  dense O(n^2) axis LOSES
    64^3             Mosaic remote-compile crash (HTTP 500)
    256^3 / 256x256x128 / 512x512x64: exceed VMEM; measured 3.49 / 1.51 /
        5.82 ms on BOTH jnp.fft.fftn and our per-axis engine (within 2%)
        — transpose/HBM-bound on every engine, no fused win available
        without a slab-pipelined variant.

Hence the shipped zone (`pallas_kernels.fused_nd_zone`): all dims
transformed, each a pow2 in [128, 512], total points in [2^17, 2^21].
Compile cost at 128^3 is ~245 s (54 MXU loop nests traced at HIGHEST) —
amortized by the persistent compilation cache.

r3 negative result (do not retry): a SLAB kernel for beyond-VMEM 3-D
grids — grid over axis 0, per step both trailing axes of one
(1, 256, 256) slab via the factored in-kernel line FFT
(_fft_axis0_traced) with .T between axes — measured 2574 us for
axes (1, 2) of 256^3 vs 2117 for the existing per-axis engine on the
same two axes (SNR parity). At slab granularity the in-VMEM
lane<->sublane transposes (3 per slab) and the k=32-leaf dots on
narrow 256-lane operands eat the saved HBM pass; the engine's big
batched matmuls win. Beyond-VMEM grids therefore stay on the
per-axis/jnp paths (all engines within 2% there).

Run: python benchmarks/exp_nd_fused.py   (on the attached TPU)
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from kofft_tpu.bench import timeit_chained
    from kofft_tpu.ops import ndfft as NF
    from kofft_tpu.ops import pallas_kernels as PK
    from kofft_tpu.ops.dft import snr_db

    rng = np.random.default_rng(0)
    for shape in [(128, 128, 128), (512, 512), (512, 256)]:
        xr = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        run = PK._build_fused_nd(shape)
        t0 = time.time()
        yr, yi = jax.jit(run)(xr, xi)
        ref = np.fft.fftn(np.asarray(xr).astype(np.float64)
                          + 1j * np.asarray(xi).astype(np.float64))
        s = snr_db(ref, np.asarray(yr) + 1j * np.asarray(yi))
        t = timeit_chained(lambda p, run=run: run(p[0], p[1]),
                           (xr, xi), iters=50)
        te = timeit_chained(lambda p: NF.fftn_split(p[0], p[1],
                                                    backend="xla"),
                            (xr, xi), iters=50)
        log(f"{shape}: fused {t*1e6:.1f} us vs xla-path {te*1e6:.1f} us, "
            f"SNR {s:.1f} dB (compile {time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
