"""Pallas kernel implementations (TPU only).

First target: fused four-step FFT for n = n1*n2 with n1, n2 <= 256 —
load an (n1, n2) tile into VMEM once, run DFT matmul / twiddle / DFT matmul /
transpose entirely on-chip, write once. Implemented against the real chip;
until then the engine uses the XLA matmul path.
"""

from __future__ import annotations


def fused_four_step_supported(n: int) -> bool:
    return False  # kernels land after the XLA engine is benchmarked


def fused_four_step_fft(xr, xi, n: int):
    raise NotImplementedError("pallas fused four-step kernel not yet built")
