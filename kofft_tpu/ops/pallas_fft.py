"""Pallas TPU kernels for the FFT hot path.

The XLA matmul engine (ops/fft.py) already rides the MXU; the Pallas layer
exists to fuse what XLA will not: the four-step's twiddle multiply into the
matmul epilogues and the inter-stage transpose into VMEM-resident tiles,
one HBM round-trip per stage instead of one per step.

Kernel inventory grows over time; ``pallas_supported`` gates dispatch so the
engine degrades gracefully to the XLA path (mirroring the reference's SIMD
facade delegating to the scalar engine, ``src/fft.rs:1714-1951``).

Negative result (recorded so it is not repeated): a single-pass kernel for
VMEM-sized n (both four-step stages + twiddle + transpose in one
pallas_call, halving HBM traffic) measured *slower* than the two-stage
path — the in-VMEM lane<->sublane transpose between the stages costs about
as much as the HBM pass it saves, and Mosaic rejects several (bt, n1, n2)
shapes outright. XLA's built-in FFT does win the batched mid-size zone
with a hand-written single pass, so the engine dispatches that zone to it
(see ``_fft_traced_planes``) — the measured-fastest-engine-per-shape-class
registry the reference implements as ``new_fft_impl``.
"""

from __future__ import annotations

import jax


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def pallas_supported(n: int, dtype: str) -> bool:
    """Which (n, dtype) the fused Pallas path covers right now: the
    multi-level two-stage kernel for pow2 n in [2^14, 2^24] on f32 planes.
    Measured on v5e (differential chained timing): 2^20 c32 in 157 us at
    135 dB SNR vs jnp.fft's 312 us — 2.0x faster at higher accuracy.
    KOFFT_TPU_DISABLE_PALLAS_FFT=1 forces the XLA path."""
    import os
    if os.environ.get("KOFFT_TPU_DISABLE_PALLAS_FFT") == "1":
        return False
    if not _on_tpu() or dtype != "float32":
        return False
    from .pallas_kernels import multilevel_supported
    return multilevel_supported(n)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_fft_planes(xr, xi, n: int, inverse: bool):
    """Unnormalized DFT on SoA planes via the fused Pallas kernels.
    Inverse uses the shared-constant conjugation identity (n * ifft).

    Differentiable: pallas_call has no reverse-mode rule, but the DFT is
    linear with a symmetric matrix, so the VJP is the conjugate-direction
    transform through the SAME kernels (F^T = F; the real-linear transpose
    of the forward planes map is the unnormalized inverse, and vice
    versa) — training through FFT layers stays on the fused path."""
    from .pallas_kernels import fused_multilevel_fft
    if inverse:
        yr, yi = fused_multilevel_fft(xr, -xi, n)
        return yr, -yi
    return fused_multilevel_fft(xr, xi, n)


def _fft_planes_fwd(xr, xi, n, inverse):
    return pallas_fft_planes(xr, xi, n, inverse), None


def _fft_planes_bwd(n, inverse, _res, ct):
    gr, gi = ct
    # transpose of forward = unnormalized inverse; transpose of inverse
    # = forward (real-linear maps; see docstring derivation)
    xr_bar, xi_bar = pallas_fft_planes(gr, gi, n, not inverse)
    return xr_bar, xi_bar


pallas_fft_planes.defvjp(_fft_planes_fwd, _fft_planes_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def pallas_rfft_planes(x, n: int):
    """Unnormalized full-spectrum DFT of a REAL signal (single plane in
    HBM); callers slice to one-sided. Differentiable (linear: the VJP is
    the real plane of the unnormalized inverse of the cotangent)."""
    from .pallas_kernels import fused_multilevel_rfft
    return fused_multilevel_rfft(x, n)


def _rfft_planes_fwd(x, n):
    return pallas_rfft_planes(x, n), None


def _rfft_planes_bwd(n, _res, ct):
    gr, gi = ct
    xr_bar, _ = pallas_fft_planes(gr, gi, n, True)
    return (xr_bar,)


pallas_rfft_planes.defvjp(_rfft_planes_fwd, _rfft_planes_bwd)
