"""Batched large transforms: lax.scan of the b=1 phased kernel vs the
batched sequential grid — NEGATIVE RESULT for the public path.

Motivation: chained-dependency timing of the SINGLE-row phased kernel
(137.0 us at 2^20 HIGHEST) came in faster per row than the batched grid
(157.9 us/row at b=8) — launching the same kernel 8 times pipelines
better than one launch whose grid iterates (batch, phases).

Raw kernel on PRE-TILED (b, n1, n2) operands (v5e, 8x2^20 c32, r3):

    complex HIGHEST   grid 157.9 us/row   scan 131.1 us/row   (-17%)
    complex DEFAULT   grid  85.5 us/row   scan  65.3 us/row   (-24%)
    real    HIGHEST   grid 138.6 us/row   scan 145.1 us/row   (+5%, loss)

But behind the PUBLIC flat (b, n) boundary the ordering flips:

    A  reshape -> scan of b=1      1.443 ms   (180.4 us/row)
    B  scan flat rows, in-body     3.942 ms   (492.8 us/row)
       reshape (1, n) slice
    C  reshape -> batched grid     1.343 ms   (167.8 us/row)  [shipped]

Why: the flat (b, n) -> tiled (b, n1, n2) relayout copy is ELIDED by
XLA when the whole array feeds ONE custom-call (C pays ~80 us over the
1.263 ms raw grid, impossible if 128 MB of copies materialized), but a
lax.scan's dynamic-slice forces the relayouted array to materialize in
default layout first (A pays the full ~390 us copy, losing more than
the scan saves). Variant B's per-row slice of the row-tiled rank-2
array is catastrophic (sublane gather). The real kernel's grid already
overlaps (stage 1 reads one plane — half the input DMA — and its 4
outputs drain smaller blocks), so even raw scan loses there.

Verdict: the batched grid stays the public path for all kernels.

r3 addendum — the scan win is also COMPILER-DEPENDENT: a tiled-layout
escape hatch (`fft_split_tiled`) was built to capture it, but by then
the session's axon compile helper had restarted and the identical scan
program stopped compiling — XLA pins the scan-sliced pallas result
into VMEM (S(1)) and overflows the 16 MB scoped-vmem stack ("Scoped
allocation with size 16.89M and limit 16.00M"; the knob,
xla_tpu_scoped_vmem_limit_kib, is backend-side and not
client-settable). An optimization_barrier around the kernel call makes
it compile but measures 158.9 us/row — the grid's time, win gone. The
tiled API therefore ships on the batched grid (its relayout-skipping
pipeline value stands on its own); re-attempt the scan only after
compiling it on the current toolchain.

Run: python benchmarks/exp_batch_scan.py   (on the attached TPU)
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
    from jax import lax

    from kofft_tpu.bench import timeit_chained
    from kofft_tpu.ops import pallas_kernels as PK

    rng = np.random.default_rng(0)
    n = 1 << 20
    n1, n2 = PK._pow2_split(n)
    b = 8
    ar = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))
    ai = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))
    xr = jnp.asarray(np.asarray(ar).reshape(b, n))
    xi = jnp.asarray(np.asarray(ai).reshape(b, n))

    for mode in ("highest", "default"):
        run = PK._build_phased(n, "float32", False, mode)
        fg = jax.jit(lambda p, run=run: run(b, p[0], p[1]))
        tg = timeit_chained(lambda p, fg=fg: fg(p), (ar, ai), iters=30)
        log(f"raw complex {mode} grid: {tg*1e6/b:.1f} us/row")

        def scanned(p, run=run):
            def body(c, row):
                yr, yi = run(1, row[0][None], row[1][None])
                return c, (yr[0], yi[0])
            _, o = lax.scan(body, 0, p)
            return o

        ts = timeit_chained(jax.jit(scanned), (ar, ai), iters=30)
        log(f"raw complex {mode} scan: {ts*1e6/b:.1f} us/row")

    run = PK._build_phased(n, "float32", False, "highest")

    def pub_scan(p):
        a = p[0].reshape(b, n1, n2)
        c = p[1].reshape(b, n1, n2)

        def body(cr, row):
            yr, yi = run(1, row[0][None], row[1][None])
            return cr, (yr[0], yi[0])

        _, (yr, yi) = lax.scan(body, 0, (a, c))
        return yr.reshape(b, n), yi.reshape(b, n)

    tA = timeit_chained(jax.jit(pub_scan), (xr, xi), iters=30)
    log(f"public A relayout->scan: {tA*1e3:.3f} ms ({tA*1e6/b:.1f} us/row)")

    def pub_grid(p):
        yr, yi = run(b, p[0].reshape(b, n1, n2), p[1].reshape(b, n1, n2))
        return yr.reshape(b, n), yi.reshape(b, n)

    tC = timeit_chained(jax.jit(pub_grid), (xr, xi), iters=30)
    log(f"public C relayout->grid: {tC*1e3:.3f} ms ({tC*1e6/b:.1f} us/row)")


if __name__ == "__main__":
    main()
