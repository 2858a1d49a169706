"""STFT/ISTFT precision-tier decomposition probe (r3).

Question: where does the 2^20-sample STFT (win=1024, hop=256) spend its
248 us at HIGHEST, and does the `default` throughput tier shift it from
MXU-dot-bound to framing-traffic-bound (which would make a fused
framing+FFT Pallas kernel pay)?

Cost model going in: spectra = 4096x1024 points, n=1024 tree = 2x32
complex MACs/pt -> 2.7e8 complex MACs (Gauss 3-dot ~8e8 real) — at the
measured HIGHEST dot rate (~3.3e9 real MACs/ms from the 2^20 kernel
isolation) that is ~240 us, i.e. the HIGHEST path should already be at
its MXU floor. `default` cuts passes 6x; then the ~50-110 MB of framing
+ inter-stage traffic should bind instead.
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
    from kofft_tpu.ops import window as W
    from kofft_tpu.ops.stft import _frame_matrix, _window_key, _window_cache
    from kofft_tpu.ops.rfft import _rfft_planes

    rng = np.random.default_rng(0)
    n = 1 << 20
    win, hop = 1024, 256
    sig = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    w = W.hann(win)
    wk = _window_key(np.asarray(w, dtype=np.float32))
    wnp = _window_cache[wk]

    for tier in ("highest", "default"):
        set_precision(None if tier == "highest" else tier)
        f_stft = jax.jit(lambda s: kt.stft_split(s, wnp, hop, onesided=True))
        # ping-pong: fold spectra back to a same-shape signal
        def chain(p):
            fr, fi = f_stft(p[0])
            return (p[0] + 1e-12 * (jnp.sum(fr) + jnp.sum(fi)),)
        t = timeit_chained(chain, (sig,), iters=100)
        log(f"stft {tier}: {t * 1e6:.1f} us")

        # framing alone (materialized frame matrix + window multiply)
        nf = -(-n // hop)
        f_frame = jax.jit(
            lambda s: _frame_matrix(s, win, hop, nf) * wnp)
        def chain_f(p):
            fm = f_frame(p[0])
            return (p[0] + 1e-12 * jnp.sum(fm),)
        tf = timeit_chained(chain_f, (sig,), iters=100)
        log(f"  framing alone: {tf * 1e6:.1f} us")

        # rfft of a preframed matrix (the batched transform alone)
        fm = np.asarray(jax.device_get(f_frame(sig)))
        fmj = jnp.asarray(fm)
        f_rfft = jax.jit(lambda m: _rfft_planes(m, win, "auto"))
        def chain_r(p):
            fr, fi = f_rfft(p[0])
            return (p[0] + 1e-12 * (jnp.sum(fr) + jnp.sum(fi)),)
        tr = timeit_chained(chain_r, (fmj,), iters=100)
        log(f"  batched rfft alone: {tr * 1e6:.1f} us")

        # istft round (full two-sided frames — istft_split's contract)
        f2 = jax.jit(lambda s: kt.stft_split(s, wnp, hop, onesided=False))
        fr, fi = f2(sig)
        frj, fij = jnp.asarray(np.asarray(fr)), jnp.asarray(np.asarray(fi))
        f_istft = jax.jit(
            lambda a, b: kt.istft_split(a, b, wnp, hop, length=n))
        def chain_i(p):
            y = f_istft(p[0], p[1])
            return (p[0] + 1e-12 * jnp.sum(y), p[1])
        ti = timeit_chained(chain_i, (frj, fij), iters=100)
        log(f"istft {tier}: {ti * 1e6:.1f} us")
    set_precision(None)


if __name__ == "__main__":
    main()
