"""Probe: 2-D FFT (images) vs jnp.fft.fftn on the attached chip.

Question: is a public fft2 bench row a win at the common image sizes?

Measured (v5e, r3) BEFORE the phased 2-D kernel existed:
  256^2:  kofft   7.9 us  jnp  17.6   (einsum route)
  512^2:  kofft  50.8 us  jnp  63.6   (dense fused-nd route)
  1024^2: kofft 150.9 us  jnp 151.3   (the _nd_jnp_zone: WAS jnp itself)
  2048^2: kofft 653.8 us  jnp 653.0   (same)

The 1024^2/2048^2 ties exposed that those shapes simply routed to
jnp.fft — motivating the phased 2-D kernel (fft2 = the phased 1-D
four-step minus the inter-stage twiddle, natural-layout I/O). AFTER
(pallas_kernels._build_fft2, zone fused_2d_zone):
  1024^2:    134.4 us vs jnp 152.2 (1.13x), fast tier 60.6 (2.5x), 135 dB
  512x1024:   66.4 vs  98.4 (1.5x),  fast 29.4 (3.3x)
  1024x2048: 332.1 vs 319.5 — LOSES at highest (6-pass), fast 152.3
             (2.1x) => the zone cap is per-tier: 2^20 on the 6-pass
             tiers (highest/high), 2^22 on the 1-pass default tier
             (see the 2048^2 paragraph below).
  8x512^2:   282.8 vs 467.4 (1.65x), fast 131.1 (3.6x) — batched grid.

Head-to-head vs the dense fused-nd kernel where both serve (r3): the
leaf-32 recursion wins everywhere — 512^2: 33.8 vs 51.0 us; 256x1024:
34.2 vs 76.4 — so fused_2d_zone owns ALL 2-D shapes in its range and
dense fused-nd remains the 3-D engine.

2048^2 (2^22/image, 32 MB kernel scratch) on the 1-pass default tier:
396.6 us vs jnp 651.7 (1.64x, 43.9 dB) — so the default-tier cap is
2^22 while the 6-pass tiers stop at 2^20.

Run: python benchmarks/exp_2d.py
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kofft_tpu.bench import timeit_chained
    from kofft_tpu.config import set_precision
    from kofft_tpu.ops.dft import snr_db
    from kofft_tpu.ops.ndfft import fftn_split
    from kofft_tpu.utils.observability import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    def jfftn(p):
        y = jnp.fft.fftn(jax.lax.complex(p[0], p[1]))
        return jnp.real(y), jnp.imag(y)

    for m in (256, 512, 1024, 2048):
        xr = jnp.asarray(rng.standard_normal((m, m)).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal((m, m)).astype(np.float32))
        t = timeit_chained(lambda q: fftn_split(q[0], q[1]), (xr, xi))
        tj = timeit_chained(jfftn, (xr, xi))
        yr, yi = fftn_split(xr, xi)
        ref = np.fft.fftn(np.asarray(xr).astype(np.float64)
                          + 1j * np.asarray(xi).astype(np.float64))
        s = float(snr_db(ref, np.asarray(yr) + 1j * np.asarray(yi)))
        line = (f"fft2 {m}^2: kofft {t * 1e6:8.1f} us  "
                f"jnp {tj * 1e6:8.1f} us  snr {s:6.1f} dB")
        try:
            set_precision("default")
            tf = timeit_chained(lambda q: fftn_split(q[0], q[1]), (xr, xi))
            yrf, yif = fftn_split(xr, xi)
            sf = float(snr_db(ref, np.asarray(yrf) + 1j * np.asarray(yif)))
            line += f"  | fast {tf * 1e6:8.1f} us ({sf:.1f} dB)"
        finally:
            set_precision(None)
        print(line, flush=True)


if __name__ == "__main__":
    main()
