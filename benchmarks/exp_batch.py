"""Batched 8x2^20 pipelining probes.

The batched case pays real HBM traffic (operands exceed VMEM): 4 passes
x 64 MB = 256 MB -> 1.11 ms at the 230 GB/s single-stream rate, 0.78 ms
at the 320-340 GB/s pipelined rate. Measured r1: 1.487 ms — the grid is
not riding the pipelined rate. Probes: tile width (DMA transfer size per
grid step) and Mosaic dimension_semantics hints.
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

    from kofft_tpu.bench import timeit_chained
    from kofft_tpu.ops import pallas_kernels as PK

    rng = np.random.default_rng(0)
    n = 1 << 20
    bt = 8
    n1, n2 = PK._pow2_split(n)
    ar = jnp.asarray(rng.standard_normal((bt, n1, n2)).astype(np.float32))
    ai = jnp.asarray(rng.standard_normal((bt, n1, n2)).astype(np.float32))

    import os
    tiles = tuple(int(s) for s in
                  os.environ.get("EXP_TILES", "128,256,512").split(","))
    for tile in tiles:
        _, _, s1, _, s2, _ = PK._build_ml(n, "float32", False, "highest",
                                          1, tile)
        f1 = jax.jit(lambda p, s1=s1: s1(bt, p[0], p[1]))
        t1 = timeit_chained(lambda p, f1=f1: f1(p), (ar, ai), iters=30)
        log(f"batched s1 tile={tile}: {t1*1e6:.1f} us "
            f"({4*4*bt*n/t1/1e9:.0f} GB/s)")

    # full two-stage batched at the best tile from above (set via env)
    best = int(os.environ.get("EXP_BEST", "0"))
    if best:
        _, _, s1, _, s2, _ = PK._build_ml(n, "float32", False, "highest",
                                          1, best)

        def full(p):
            cr, ci = s1(bt, p[0], p[1])
            return s2(bt, cr, ci)

        tf = timeit_chained(jax.jit(full), (ar, ai), iters=30)
        log(f"batched full tile={best}: {tf*1e3:.3f} ms = "
            f"{bt*n/tf/1e9:.2f} Gpts/s")


if __name__ == "__main__":
    main()
