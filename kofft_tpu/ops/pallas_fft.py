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
    """Which (n, dtype) the fused Pallas path covers right now."""
    if not _on_tpu() or dtype != "float32":
        return False
    from .pallas_kernels import fused_four_step_supported
    return fused_four_step_supported(n)


def pallas_fft_planes(xr, xi, n: int, inverse: bool):
    """Unnormalized DFT on SoA planes via the fused Pallas kernel.
    Inverse uses the shared-constant conjugation identity (n * ifft)."""
    from .pallas_kernels import fused_four_step_fft
    if inverse:
        yr, yi = fused_four_step_fft(xr, -xi, n)
        return yr, -yi
    return fused_four_step_fft(xr, xi, n)
