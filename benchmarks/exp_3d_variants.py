"""128^3 engine shootout: which formulation beats jnp.fft.fftn (240 us)?

  rot4      rotation einsum 'kj,abj->kab', 4-dot complex   [measured 304]
  rot3      rotation einsum, Gauss 3-dot complex
  axis4     per-axis direct einsum (no explicit moveaxis), 4-dot
  axis3     per-axis direct einsum, Gauss 3-dot
  jnp       jnp.fft.fftn                                    [bar: 240]
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
    from kofft_tpu.plan import tables

    rng = np.random.default_rng(0)
    s = 128
    xr = jnp.asarray(rng.standard_normal((s, s, s)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((s, s, s)).astype(np.float32))
    fr_np, fi_np = tables.dft_matrix(s, "float32")
    P = jax.lax.Precision.HIGHEST

    def e(sub, a, b):
        return jnp.einsum(sub, a, b, precision=P)

    def c4(sub, fr, fi, ar, ai):
        return (e(sub, fr, ar) - e(sub, fi, ai),
                e(sub, fr, ai) + e(sub, fi, ar))

    def c3(sub, fr, fi, ar, ai):
        t1 = e(sub, fr, ar)
        t2 = e(sub, fi, ai)
        t3 = e(sub, fr + fi, ar + ai)
        return t1 - t2, t3 - t1 - t2

    def rot(cd):
        def f(p):
            ar, ai = p
            fr = jnp.asarray(fr_np)
            fi = jnp.asarray(fi_np)
            for _ in range(3):
                ar, ai = cd("kj,abj->kab", fr, fi, ar, ai)
            return ar, ai
        return f

    def axis_direct(cd):
        subs = ("jk,abj->abk", "jk,ajc->akc", "jk,jbc->kbc")
        def f(p):
            ar, ai = p
            fr = jnp.asarray(fr_np)
            fi = jnp.asarray(fi_np)
            for sub in subs:
                ar, ai = cd(sub, fr, fi, ar, ai)
            return ar, ai
        return f

    # SNR sanity for each variant
    ref = np.fft.fftn(np.asarray(xr).astype(np.complex128)
                      + 1j * np.asarray(xi).astype(np.float64))

    from kofft_tpu.ops.dft import snr_db
    for name, fn in (("axis4", axis_direct(c4)),
                     ("axis3", axis_direct(c3))):
        yr, yi = jax.jit(fn)((xr, xi))
        got = np.asarray(yr) + 1j * np.asarray(yi)
        log(f"{name} SNR: {snr_db(ref, got):.1f} dB")
        t = timeit_chained(jax.jit(fn), (xr, xi), iters=50)
        log(f"{name}: {t*1e6:.1f} us")


if __name__ == "__main__":
    main()
