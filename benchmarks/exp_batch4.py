"""Batched phased kernel, part 5 (r5): the wide-dot rows fuse.

Context (exp_batch2/2b/3, ARCHITECTURE.md "Batched vs single"): the
apparent 8x2^20 batched-vs-single gap is largely the b=1 VMEM-pinning
measurement artifact, and the structural variants tried so far are all
measured zeros (ping-pong scratch, cross-row software pipeline,
dimension_semantics, rows=4 at HIGHEST, batched rank-1 flat output).
One lever was never tried: the rows>1 fold still runs a PYTHON LOOP of
narrow (n1, t) line FFTs per grid step, so every MXU leaf dot streams
only t=128 columns and pays its pipeline fill per row. ``wide=True``
concatenates the folded rows into ONE (n1, rows*t) line FFT — same MACs,
half/quarter the dot count, plus fatter VPU twiddle/swap ops.

Variants (8 x 2^20, both tiers, parity-asserted):
  V0  shipped grid rows=2            (baseline)
  V1  rows=2 wide
  V2  rows=4 wide                    (scratch 64 MB at 2^20 — fits)
  V3  two-call _build_ml bt=8        (never probed: exp_batch2b's T3 ran
                                      bt=1; bt=8 folds all rows into one
                                      grid step per tile, 4 MB blocks)
  ref single b=1 flat                (the public single-transform row)

Run: python benchmarks/exp_batch4.py
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
    from kofft_tpu.ops.dft import snr_db
    from kofft_tpu.utils.observability import enable_compilation_cache

    enable_compilation_cache()
    n = 1 << 20
    b = 8
    n1, n2 = PK._pow2_split(n)
    rng = np.random.default_rng(3)
    a32r = rng.standard_normal((b, n1, n2)).astype(np.float32)
    a32i = rng.standard_normal((b, n1, n2)).astype(np.float32)
    ar = jnp.asarray(a32r)
    ai = jnp.asarray(a32i)
    ref = np.fft.fft(a32r.reshape(b, n).astype(np.float64)
                     + 1j * a32i.reshape(b, n).astype(np.float64))

    def check(fn, name):
        yr, yi = fn((ar, ai))
        got = (np.asarray(yr, np.float64)
               + 1j * np.asarray(yi, np.float64)).reshape(b, n)
        s = snr_db(ref, got)
        log(f"  parity {name}: {s:.1f} dB")
        assert s > 40.0, (name, s)

    for mode in ("highest", "default"):
        floor = 100.0 if mode == "highest" else 40.0
        log(f"--- tier {mode} ---")
        r0 = PK._build_phased(n, "float32", False, mode, rows=2)
        f0 = jax.jit(lambda p, r=r0: r(b, p[0], p[1]))
        t0 = timeit_chained(f0, (ar, ai), iters=30)
        log(f"{mode:8s} V0 rows=2 shipped : {t0*1e6/b:7.1f} us/row")

        for rows in (2, 4):
            try:
                r1 = PK._build_phased(n, "float32", False, mode,
                                      rows=rows, wide=True)
                f1 = jax.jit(lambda p, r=r1: r(b, p[0], p[1]))
                yr, yi = f1((ar, ai))
                got = (np.asarray(yr, np.float64)
                       + 1j * np.asarray(yi, np.float64)).reshape(b, n)
                s = snr_db(ref, got)
                assert s > floor, (rows, s)
                t1 = timeit_chained(f1, (ar, ai), iters=30)
                log(f"{mode:8s} V{rows//2} rows={rows} wide  : "
                    f"{t1*1e6/b:7.1f} us/row  (SNR {s:.1f})")
            except Exception as e:
                log(f"{mode:8s} rows={rows} wide: FAILED "
                    f"{type(e).__name__}: {str(e)[:140]}")

        try:
            _, _, s1f, _, s2f, _ = PK._build_ml(n, "float32", False, mode,
                                                8, 128)
            f3 = jax.jit(lambda p, s1f=s1f, s2f=s2f: s2f(
                b, *s1f(b, p[0], p[1])))
            yr, yi = f3((ar, ai))
            got = (np.asarray(yr, np.float64)
                   + 1j * np.asarray(yi, np.float64)).reshape(b, n)
            s = snr_db(ref, got)
            assert s > floor, ("bt8", s)
            t3 = timeit_chained(f3, (ar, ai), iters=30)
            log(f"{mode:8s} V3 two-call bt=8  : {t3*1e6/b:7.1f} us/row  "
                f"(SNR {s:.1f})")
        except Exception as e:
            log(f"{mode:8s} V3 two-call bt=8: FAILED "
                f"{type(e).__name__}: {str(e)[:140]}")

        rs = PK._build_phased(n, "float32", False, mode)
        fs = jax.jit(lambda p, r=rs: r(1, p[0], p[1]))
        ts = timeit_chained(fs, (ar[:1], ai[:1]), iters=30)
        log(f"{mode:8s} single (b=1)      : {ts*1e6:7.1f} us/row")


if __name__ == "__main__":
    main()
