"""Public plan objects and strided transforms.

Reference surface: ``FftPlan`` (size + strategy + twiddle buffer,
``src/fft.rs:1987-2113``) and the strided FFT entry points
(``fft_strided``, ``src/fft.rs:1175-1199``). A plan here pins
(n, backend, norm) and exposes forward/inverse callables backed by the
process-wide jitted-executable cache — constructing it up front amortizes
table construction and tracing exactly like the reference's planner, and
`warmup()` forces compilation for a given batch shape.

Strided access (the reference's cache-hostile gather/scatter loop) is a
``moveaxis`` here — XLA folds it into the operand layout of the first
matmul, which is precisely the architectural divergence SURVEY.md §3.5
calls out.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import InvalidStrideError, InvalidValueError, require
from .fft import _jitted_entry_pp, resolve_backend


class FftPlan:
    """Reusable FFT plan for a fixed size (reference ``FftPlan``)."""

    def __init__(self, n: int, backend: Optional[str] = None,
                 norm: Optional[str] = None):
        require(n >= 1, InvalidValueError, f"n must be >= 1, got {n}")
        self.n = n
        self.backend = resolve_backend(backend)
        self.norm = norm
        # canonical full-arity call: lru_cache keys on the literal args
        # tuple, so every caller must use the same arity to share entries
        from ..config import trace_key
        self._fwd = _jitted_entry_pp(n, False, norm, self.backend,
                                     trace_key(), False)
        self._inv = _jitted_entry_pp(n, True, norm, self.backend,
                                     trace_key(), False)

    def __repr__(self):
        return (f"FftPlan(n={self.n}, backend={self.backend!r}, "
                f"norm={self.norm!r})")

    def forward(self, xr, xi):
        """Planes in/out forward transform along the last axis."""
        return self._fwd(jnp.asarray(xr), jnp.asarray(xi))

    def inverse(self, yr, yi):
        return self._inv(jnp.asarray(yr), jnp.asarray(yi))

    __call__ = forward

    def warmup(self, batch_shape: tuple = ()) -> "FftPlan":
        """Force compilation for (batch..., n) inputs (plan pre-build)."""
        z = jnp.zeros((*batch_shape, self.n), jnp.float32)
        jax.block_until_ready(self._fwd(z, z))
        jax.block_until_ready(self._inv(z, z))
        return self


def fft_strided_split(xr, xi, stride: int, inverse: bool = False,
                      backend: Optional[str] = None,
                      norm: Optional[str] = None):
    """FFT over elements x[k*stride], k = 0..n-1, for each offset in
    [0, stride) — the reference's strided entry (``fft.rs:1175-1199``)
    expressed as reshape + transform over the leading-stride layout.

    Input planes have last-axis length stride * n; returns planes of the
    same shape with each strided line transformed independently.
    """
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    require(stride >= 1, InvalidStrideError,
            f"stride must be >= 1, got {stride}")
    total = xr.shape[-1]
    require(total % stride == 0, InvalidStrideError,
            f"length {total} not divisible by stride {stride}")
    n = total // stride
    batch = xr.shape[:-1]
    # (..., n, stride) -> lines along axis -2
    ar = xr.reshape(*batch, n, stride)
    ai = xi.reshape(*batch, n, stride)
    ar = jnp.swapaxes(ar, -1, -2)
    ai = jnp.swapaxes(ai, -1, -2)
    plan = FftPlan(n, backend=backend, norm=norm)
    yr, yi = plan.inverse(ar, ai) if inverse else plan.forward(ar, ai)
    yr = jnp.swapaxes(yr, -1, -2).reshape(*batch, total)
    yi = jnp.swapaxes(yi, -1, -2).reshape(*batch, total)
    return yr, yi
