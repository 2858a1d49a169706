"""r5 probe: the 2^23..2^26 frontier (VERDICT r4 #3/#6).

Questions, per size and tier:
  (a) does the bf16 inter-stage C + bf16 input (default tier, now routed
      in fused_multilevel_fft) deliver the expected ~1.3-1.5x from the
      middle-traffic halving, at acceptable SNR (>= 42 dB floor)?
  (b) highest tier: does tile=256 (fatter stage blocks, half the grid
      steps) beat the shipped tile=128?
  (c) does the r3-era "n1 capped at 2048" preference still hold at
      leaf-128 for 2^23/2^24 (probe (4096, 2048) and (4096, 4096))?
  (d) 2^25/2^26: first perf numbers for the extended native range vs
      jnp.fft.

Run: python benchmarks/exp_p56.py [p2 ...]
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
    from kofft_tpu.utils.observability import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(7)
    powers = [int(a) for a in sys.argv[1:]] or [23, 24, 25, 26]

    for p in powers:
        n = 1 << p
        xr32 = rng.standard_normal(n).astype(np.float32)
        xi32 = rng.standard_normal(n).astype(np.float32)
        xr = jnp.asarray(xr32)
        xi = jnp.asarray(xi32)
        ref = np.fft.fft(xr32.astype(np.float64)
                         + 1j * xi32.astype(np.float64))

        def snr_of(fn):
            yr, yi = fn((xr, xi))
            return snr_db(ref, np.asarray(yr, np.float64)
                          + 1j * np.asarray(yi, np.float64))

        scale = lambda q: tuple(a * 1e-3 for a in kt.fft_split(q[0], q[1]))
        log(f"=== n = 2^{p} (split {PK._pow2_split(n)}) ===")

        import os
        variants_only = os.environ.get("KOFFT_EXP_VARIANTS_ONLY") == "1"
        # public route, both tiers
        for tier in (() if variants_only else (None, "default")):
            try:
                set_precision(tier)
                t = timeit_chained(scale, (xr, xi), iters=10,
                                   target_time=0.2)
                s = snr_of(lambda q: kt.fft_split(q[0], q[1]))
                name = tier or "highest"
                log(f"2^{p} public {name:8s}: {t*1e6:8.1f} us "
                    f"({n/t/1e9:5.2f} Gpts/s, SNR {s:.1f} dB)")
            finally:
                set_precision(None)

        # jnp competitor
        def jf(q):
            y = jnp.fft.fft(jax.lax.complex(q[0], q[1]))
            return jnp.real(y) * 1e-3, jnp.imag(y) * 1e-3

        if not variants_only:
            tj = timeit_chained(jf, (xr, xi), iters=10, target_time=0.2)
            log(f"2^{p} jnp.fft         : {tj*1e6:8.1f} us")

        # wider tiles at highest (raw kernel pair): stage-1 leaf dots
        # stream tile columns, so 256/512 amortize per-dot pipeline
        # fill 2-4x vs the shipped 128 (same lever as the batched
        # `wide` fuse, applied to bt=1 via the tile knob)
        n1, n2 = PK._pow2_split(n)
        # tile=512 at 2^23 and tile=256 at 2^24 (n2=8192) crash the
        # remote Mosaic compiler (HTTP 500, tpu_compile_helper exit 1)
        # — measured negative, excluded
        for tile in ((256,) if p == 23 else ()):
            try:
                _, _, s1f, _, s2f, _ = PK._build_ml(
                    n, "float32", False, "highest", 1, tile)
                # flat-in/flat-out so the chained carry matches the
                # operands AND the relayout tax matches the public path
                f = jax.jit(lambda q, s1f=s1f, s2f=s2f: tuple(
                    (a * 1e-3).reshape(n) for a in s2f(1, *s1f(
                        1, q[0].reshape(1, n1, n2),
                        q[1].reshape(1, n1, n2)))))
                yr, yi = f((xr, xi))
                s = snr_db(ref * 1e-3, (np.asarray(yr, np.float64)
                           + 1j * np.asarray(yi, np.float64)).reshape(n))
                assert s > 100, s
                t = timeit_chained(f, (xr, xi), iters=10, target_time=0.2)
                log(f"2^{p} tile={tile} highest: {t*1e6:8.1f} us "
                    f"(SNR {s:.1f})")
            except Exception as e:
                log(f"2^{p} tile={tile}: FAILED {type(e).__name__}: "
                    f"{str(e)[:140]}")

        # alternative splits at highest (monkeypatch, cache-bypassed)
        # n2 > 8192 splits overflow scoped VMEM (stage-2 blocks grow
        # with n2) — only short-n2 alternatives are probeable
        alt = {23: [(4096, 2048)], 24: [(2048, 8192)],
               25: [(8192, 4096)]}.get(p, [])
        orig_split = PK._pow2_split
        for (a1, a2) in alt:
            try:
                PK._pow2_split = lambda m, a1=a1, a2=a2: (
                    (a1, a2) if m == n else orig_split(m))
                builder = PK._build_ml.__wrapped__
                _, _, s1f, _, s2f, _ = builder(n, "float32", False,
                                               "highest", 1, 128)
                f = jax.jit(lambda q, s1f=s1f, s2f=s2f: tuple(
                    (x * 1e-3).reshape(n) for x in s2f(1, *s1f(
                        1, q[0].reshape(1, a1, a2),
                        q[1].reshape(1, a1, a2)))))
                yr, yi = f((xr, xi))
                s = snr_db(ref * 1e-3, (np.asarray(yr, np.float64)
                           + 1j * np.asarray(yi, np.float64)).reshape(n))
                assert s > 100, s
                t = timeit_chained(f, (xr, xi), iters=10, target_time=0.2)
                log(f"2^{p} split ({a1},{a2}) highest: {t*1e6:8.1f} us "
                    f"(SNR {s:.1f})")
            except Exception as e:
                log(f"2^{p} split ({a1},{a2}): FAILED {type(e).__name__}: "
                    f"{str(e)[:140]}")
            finally:
                PK._pow2_split = orig_split

        del xr, xi


if __name__ == "__main__":
    main()
