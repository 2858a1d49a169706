"""Real FFT: one-sided ``n//2 + 1`` spectrum, numpy/reference layout.

Capability counterpart of the reference's ``src/rfft.rs`` (937 LoC). The
reference's algorithm — pack even/odd samples into a half-size complex
FFT, Hermitian-unpack with twiddles (``rfft.rs:425-508``), SIMD
post-processing variants (``rfft.rs:510-774``) — is a CPU design: it
halves FLOPs at the price of stride-2 deinterleaves and reversals. On TPU
those are minor-dim lane shuffles and cost more than the FLOPs they save
(measured on v5e at 2^20 with chained timing: deint + half FFT + unpack =
312 us vs 289 us for the straight full transform), so this build computes
the full complex FFT of the real signal and slices one side — on the
Pallas backend through a real-input stage-1 kernel that never
materializes the zero imag plane; the
inverse reconstructs the Hermitian spectrum with a single half-length
flip and keeps the real plane of the full inverse. Outputs are identical
to the reference/numpy to f32 precision; the API surface (rfft/irfft +
split variants) mirrors ``RealFftImpl`` (``rfft.rs:775-837``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import trace_key
from ..errors import (EmptyInputError, InvalidValueError,
                      MismatchedLengthsError, require)
from ._complex import merge, split
from .fft import (_fft_planes, _is_tracer, _norm_scale, complex_io_supported,
                  resolve_backend)

__all__ = ["rfft", "irfft", "rfft_split", "irfft_split"]


def _rfft_planes(x, n: int, backend: str):
    """real (..., n) -> one-sided planes (..., n//2+1), unnormalized.

    TPU-native formulation: full n-point complex FFT of the real signal
    and slice one side. The textbook half-size even/odd packing (which the
    reference implements, ``rfft.rs:425-465``) halves the FLOPs but pays a
    stride-2 lane deinterleave plus Hermitian-unpack lane flips; re-measured
    with dispatch-latency-free chained timing on v5e at 2^20 the packed
    path still loses (deint 45 us + half FFT 174 us + unpack 93 us = 312 us
    vs 289 us for the straight full transform — and the real-input Pallas
    stage below beats both). The MXU makes FLOPs cheap; lane shuffles are
    what cost. On the Pallas backend, stage 1 reads the single real plane
    (no zero-imag HBM traffic, 2 leaf dots instead of 3)."""
    dtype = str(x.dtype)
    if backend in ("pallas", "auto"):
        from .fft import _jnp_fft_zone, _platform_default
        from .pallas_fft import pallas_supported, pallas_rfft_planes
        auto = backend == "auto"
        backend = _platform_default() if auto else backend
        if backend == "pallas":
            if auto and dtype == "float32" and _jnp_fft_zone(x.shape, n):
                # measured-fastest engine for batched mid-size transforms
                # (zone reroutes never override an explicit request;
                # bf16 input is a kernel-I/O contract, not a jnp one)
                y = jnp.fft.rfft(x, n)
                return jnp.real(y), jnp.imag(y)
            if pallas_supported(n, dtype):
                # kernel emits the one-sided planes directly (no slice pass)
                return pallas_rfft_planes(x, n)
            backend = "xla"
    if dtype == "bfloat16":
        # engines without a bf16 kernel compute in f32 and round back
        x32 = x.astype(jnp.float32)
        yr, yi = _fft_planes(x32, jnp.zeros_like(x32), n, False,
                             backend, "float32")
        return (yr[..., : n // 2 + 1].astype(x.dtype),
                yi[..., : n // 2 + 1].astype(x.dtype))
    yr, yi = _fft_planes(x, jnp.zeros_like(x), n, False, backend, dtype)
    return yr[..., : n // 2 + 1], yi[..., : n // 2 + 1]


def _irfft_planes(yr, yi, n: int, backend: str):
    """one-sided planes (..., n//2+1) -> real (..., n), unnormalized (n*x).

    Rebuilds the full Hermitian spectrum (one half-length flip) and takes
    the real plane of the full inverse — which also reproduces numpy's
    implicit discard of unrealizable DC/Nyquist imaginary parts exactly
    (numpy computes Re(ifft(full)) the same way)."""
    dtype = str(yr.dtype)
    tail_r = jnp.flip(yr[..., 1: (n + 1) // 2], axis=-1)
    tail_i = -jnp.flip(yi[..., 1: (n + 1) // 2], axis=-1)
    fr = jnp.concatenate([yr[..., : n // 2 + 1], tail_r], axis=-1)
    fi = jnp.concatenate([yi[..., : n // 2 + 1], tail_i], axis=-1)
    if backend in ("pallas", "auto"):
        from .fft import _platform_default
        from .pallas_fft import pallas_supported, pallas_fft_planes
        if backend == "auto":
            backend = _platform_default()
        if backend == "pallas":
            if pallas_supported(n, dtype):
                xr, _ = pallas_fft_planes(fr, fi, n, inverse=True)
                return xr
            backend = "xla"
    xr, _ = _fft_planes(fr, fi, n, True, backend, dtype)
    return xr


# --------------------------------------------------------------------------
# traced + jitted entries
# --------------------------------------------------------------------------

def _rfft_traced(x, n: int, norm: Optional[str], backend: str):
    b = "xla" if backend in ("jnpfft",) else backend
    yr, yi = _rfft_planes(x, n, b)
    s = _norm_scale(n, norm, False)
    if s is not None:
        yr, yi = yr * s, yi * s
    return yr, yi


def _irfft_traced(yr, yi, n: int, norm: Optional[str], backend: str):
    b = "xla" if backend in ("jnpfft",) else backend
    x = _irfft_planes(yr, yi, n, b)
    s = _norm_scale(n, norm, True)
    if s is not None:
        x = x * s
    return x


@functools.lru_cache(maxsize=None)
def _jitted_rfft(n: int, norm: Optional[str], backend: str, ck: tuple = ()):
    def f(x):
        yr, yi = _rfft_traced(x, n, norm, backend)
        return merge(yr, yi)
    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _jitted_rfft_pp(n: int, norm: Optional[str], backend: str,
                    ck: tuple = ()):
    return jax.jit(functools.partial(_rfft_traced, n=n, norm=norm,
                                     backend=backend))


@functools.lru_cache(maxsize=None)
def _jitted_irfft_pp(n: int, norm: Optional[str], backend: str,
                     ck: tuple = ()):
    return jax.jit(functools.partial(_irfft_traced, n=n, norm=norm,
                                     backend=backend))


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def _prep_real(x, n: Optional[int], axis: int):
    host = not isinstance(x, (jax.Array, jax.core.Tracer))
    xp = np if host else jnp
    x = xp.asarray(x)
    require(x.ndim >= 1, EmptyInputError, "input must have at least 1 dim")
    require(not (host and np.iscomplexobj(x)) and
            not (not host and jnp.iscomplexobj(x)),
            InvalidValueError, "rfft input must be real")
    if host:
        from ._complex import host_float
        x = host_float(x)
    ax = axis if axis >= 0 else x.ndim + axis
    require(0 <= ax < x.ndim, InvalidValueError,
            f"axis {axis} out of range for ndim {x.ndim}")
    if ax != x.ndim - 1:
        x = xp.moveaxis(x, ax, -1)
    m = x.shape[-1]
    require(m >= 1 or (n is not None and n >= 1), EmptyInputError,
            "rfft input must be non-empty")
    if n is not None:
        require(n >= 1, InvalidValueError, f"n must be >= 1, got {n}")
        if n < m:
            x = x[..., :n]
        elif n > m:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, n - m)]
            x = xp.pad(x, pad)
        m = n
    return x, m


def rfft(x, n: Optional[int] = None, axis: int = -1,
         norm: Optional[str] = None, backend: Optional[str] = None):
    """One-sided real FFT (length ``n//2 + 1`` along ``axis``).

    Reference surface: ``RealFftImpl::rfft`` (``src/rfft.rs:775-837``)."""
    b = resolve_backend(backend)
    x, m = _prep_real(x, n, axis)
    if _is_tracer(x):
        yr, yi = _rfft_traced(x, m, norm, b)
        y = merge(yr, yi)
    elif not complex_io_supported():
        yr, yi = _jitted_rfft_pp(m, norm, b, trace_key())(x)
        y = np.asarray(yr) + 1j * np.asarray(yi)
    else:
        y = _jitted_rfft(m, norm, b, trace_key())(x)
    ax = axis if axis >= 0 else y.ndim + axis
    if ax != y.ndim - 1:
        xp = np if isinstance(y, np.ndarray) else jnp
        y = xp.moveaxis(y, -1, ax)
    return y


def irfft(y, n: Optional[int] = None, axis: int = -1,
          norm: Optional[str] = None, backend: Optional[str] = None):
    """Inverse of :func:`rfft` -> real signal of length ``n``
    (default ``2*(y.shape[axis]-1)``). Reference ``irfft``
    (``src/rfft.rs:468-508``)."""
    b = resolve_backend(backend)
    host = not isinstance(y, (jax.Array, jax.core.Tracer))
    xp = np if host else jnp
    y = xp.asarray(y)
    require(y.ndim >= 1 and y.shape[axis] >= 1, EmptyInputError,
            "irfft input must be non-empty")
    ax = axis if axis >= 0 else y.ndim + axis
    if ax != y.ndim - 1:
        y = xp.moveaxis(y, ax, -1)
    k = y.shape[-1]
    m = n if n is not None else 2 * (k - 1)
    require(m >= 1, InvalidValueError, f"output length must be >= 1, got {m}")
    want = m // 2 + 1
    if k < want:
        pad = [(0, 0)] * (y.ndim - 1) + [(0, want - k)]
        y = xp.pad(y, pad)
    elif k > want:
        y = y[..., :want]
    if host:
        from ._complex import host_float_dtype
        ft = host_float_dtype(y.real.dtype)
        yr = np.ascontiguousarray(y.real).astype(ft)
        yi = np.ascontiguousarray(y.imag).astype(ft)
    else:
        yr, yi = split(y)
    if _is_tracer(yr):
        x = _irfft_traced(yr, yi, m, norm, b)
    else:
        x = _jitted_irfft_pp(m, norm, b, trace_key())(yr, yi)
        if not complex_io_supported():
            x = np.asarray(x)
    if ax != x.ndim - 1:
        xp2 = np if isinstance(x, np.ndarray) else jnp
        x = xp2.moveaxis(x, -1, ax)
    return x


def rfft_split(x, norm: Optional[str] = None, backend: Optional[str] = None):
    """Real FFT with SoA plane outputs (traceable; Pallas/axon-friendly)."""
    x = jnp.asarray(x)
    require(x.ndim >= 1 and x.shape[-1] >= 1, EmptyInputError,
            "rfft input must be non-empty")
    n = x.shape[-1]
    b = resolve_backend(backend)
    if _is_tracer(x):
        return _rfft_traced(x, n, norm, b)
    return _jitted_rfft_pp(n, norm, b, trace_key())(x)


def irfft_split(yr, yi, n: Optional[int] = None, norm: Optional[str] = None,
                backend: Optional[str] = None):
    """Inverse real FFT from SoA planes (traceable)."""
    yr = jnp.asarray(yr)
    yi = jnp.asarray(yi)
    require(yr.shape == yi.shape, MismatchedLengthsError,
            f"re/im plane shapes differ: {yr.shape} vs {yi.shape}")
    k = yr.shape[-1]
    m = n if n is not None else 2 * (k - 1)
    b = resolve_backend(backend)
    if _is_tracer(yr) or _is_tracer(yi):
        return _irfft_traced(yr, yi, m, norm, b)
    return _jitted_irfft_pp(m, norm, b, trace_key())(yr, yi)
