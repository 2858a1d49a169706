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
    """Which (n, dtype) the fused Pallas path covers right now.

    Dispatch is currently opt-in (KOFFT_TPU_FORCE_PALLAS_FFT=1): measured
    on v5e, the XLA engine with a deep factor tree (cutoff 128) beats the
    two-factor fused kernel at every size (e.g. 1.96 vs 2.27 ms at 2^20)
    because the deeper tree does ~8x fewer MACs than the kernel's full
    n1 x n2 DFT matrices. The kernel stays correct and tested; winning
    requires the multi-level (three-factor) variant — next on the list."""
    import os
    if os.environ.get("KOFFT_TPU_FORCE_PALLAS_FFT") != "1":
        return False
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
