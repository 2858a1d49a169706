"""Batched phased kernel, part 2: is the single-row baseline an artifact?

exp_batch2.py found the ~21 us/row batched-vs-single gap is IDENTICAL at
both tiers and survives ping-pong scratch AND a full cross-row software
pipeline — so it is not a row-transition bubble. Remaining hypothesis:
the b=1 chained-timing baseline keeps its 32 MB in/out working set
VMEM-resident across the fori_loop (XLA pins loop intermediates into
S(1)/VMEM when they fit; v5e VMEM = 128 MB), while b>=4 footprints
(128+ MB) must stream from HBM — i.e. the "single" number is partly a
harness artifact, and the batched grid is the TRUE HBM-resident rate.

Tests:
  T1  us/row vs batch size b in {1, 2, 4, 8, 16} at default tier —
      a jump where the footprint crosses VMEM capacity confirms
  T2  compiled-HLO memory-space audit of the chained b=1 loop (count
      S(1) buffer annotations on the loop carry)
  T3  wider stage-1 DMA blocks (t=256) at b=8 — if the batched grid is
      DMA-stream-bound (~186 GB/s effective vs the 230 single-stream /
      320 pipelined measured ceilings), halving the DMA count should
      raise it

Run: python benchmarks/exp_batch2b.py
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
    n1, n2 = PK._pow2_split(n)

    # T1: footprint scan (default tier; 4 arrays x b x 4 MB footprint)
    run = PK._build_phased(n, "float32", False, "default")
    for b in (1, 2, 4, 8, 16):
        ar = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))
        ai = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))
        f = jax.jit(lambda p, b=b: run(b, p[0], p[1]))
        t = timeit_chained(f, (ar, ai), iters=30)
        log(f"T1 default b={b:2d} (footprint {b*16} MB): "
            f"{t*1e6/b:7.1f} us/row")

    # T2: memory-space audit of the chained loop at b=1 vs b=8
    for b in (1, 8):
        ar = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))
        ai = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))

        @jax.jit
        def chained(p, b=b):
            return jax.lax.fori_loop(
                0, 8, lambda _, q: run(b, q[0], q[1]), p)

        txt = chained.lower((ar, ai)).compile().as_text()
        s1 = txt.count("S(1)")
        log(f"T2 b={b}: compiled chained loop has {s1} S(1) "
            f"(VMEM-space) buffer annotations")

    # T3: wider stage-1 blocks via the two-call multilevel kernels
    # (tile=256) vs the phased kernel at b=8
    b = 8
    ar = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))
    ai = jnp.asarray(rng.standard_normal((b, n1, n2)).astype(np.float32))
    for mode in ("default", "highest"):
        for tile in (128, 256):
            try:
                _, _, s1f, _, s2f, _ = PK._build_ml(
                    n, "float32", False, mode, 1, tile)
                f = jax.jit(lambda p, s1f=s1f, s2f=s2f: s2f(
                    b, *s1f(b, p[0], p[1])))
                t = timeit_chained(f, (ar, ai), iters=30)
                log(f"T3 two-call {mode:8s} tile={tile}: "
                    f"{t*1e6/b:7.1f} us/row")
            except Exception as e:
                log(f"T3 two-call {mode:8s} tile={tile}: FAILED "
                    f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
