"""Pallas TPU kernels for the FFT hot path.

The XLA matmul engine (ops/fft.py) already rides the MXU; the Pallas layer
exists to fuse what XLA will not: the four-step's twiddle multiply into the
matmul epilogues and the inter-stage transpose into VMEM-resident tiles,
one HBM round-trip for the whole transform instead of one per step.

Kernel inventory grows over time; ``pallas_supported`` gates dispatch so the
engine degrades gracefully to the XLA path (mirroring the reference's SIMD
facade delegating to the scalar engine, ``src/fft.rs:1714-1951``).
"""

from __future__ import annotations

import jax


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def pallas_supported(n: int, dtype: str) -> bool:
    """Which (n, dtype) the fused Pallas path covers right now: the
    multi-level kernel for pow2 n in [2^14, 2^24] on f32 planes. Measured
    on v5e (chained-dependency timing, dispatch latency amortized): 2^20
    c32 in 234 us at 135 dB SNR vs jnp.fft's 360 us at 127.5 dB — 1.54x
    faster at higher accuracy; the two-factor kernel (kept for
    reference/tests) loses to the multi-level one.
    KOFFT_TPU_DISABLE_PALLAS_FFT=1 forces the XLA path."""
    import os
    if os.environ.get("KOFFT_TPU_DISABLE_PALLAS_FFT") == "1":
        return False
    if not _on_tpu() or dtype != "float32":
        return False
    from .pallas_kernels import multilevel_supported
    return multilevel_supported(n)


def pallas_fft_planes(xr, xi, n: int, inverse: bool):
    """Unnormalized DFT on SoA planes via the fused Pallas kernel.
    Inverse uses the shared-constant conjugation identity (n * ifft)."""
    from .pallas_kernels import fused_multilevel_fft
    if inverse:
        yr, yi = fused_multilevel_fft(xr, -xi, n)
        return yr, -yi
    return fused_multilevel_fft(xr, xi, n)
