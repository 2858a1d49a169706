"""Real FFT via the half-size complex trick + Hermitian unpack.

TPU-native build of the reference's ``src/rfft.rs`` (937 LoC): pack the real
signal's even/odd samples into a half-length complex signal, run the
half-size complex FFT, then reconstruct the one-sided spectrum with
Hermitian post-processing (reference scalar kernel ``rfft_direct``
``rfft.rs:425-465``; AVX/NEON post-processing variants ``rfft.rs:510-774``
collapse into one vectorized plane computation here). Output layout is the
packed one-sided ``n//2 + 1`` spectrum, as the reference and numpy.

Math (n even, m = n/2, w = exp(-2*pi*i/n)):
    z[j]  = x[2j] + i*x[2j+1],           Z = FFT_m(z)
    Xe[k] = (Z[k] + conj(Z[m-k]))/2      (FFT of even samples)
    Xo[k] = -i/2 * (Z[k] - conj(Z[m-k])) (FFT of odd samples)
    X[k]  = Xe[k] + w^k * Xo[k],  k = 0..m  (Z[m] := Z[0])
Endpoints real: X[0] = Re Z0 + Im Z0, X[m] = Re Z0 - Im Z0
(reference ``rfft.rs:450-452``).

Inverse (``irfft``) inverts the unpack exactly (conjugated twiddles), runs
the half-size inverse FFT and re-interleaves (reference ``rfft.rs:468-508``).
Odd n falls back to the full complex engine (the reference's rfft is
even-only; we accept odd for numpy compatibility).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import (EmptyInputError, InvalidValueError,
                      MismatchedLengthsError, require)
from ..plan import tables
from ._complex import cmul, merge, split
from .fft import (_fft_planes, _is_tracer, _norm_scale, complex_io_supported,
                  resolve_backend)

__all__ = ["rfft", "irfft", "rfft_split", "irfft_split"]


def _unpack_tw(n: int, dtype: str):
    """w^k = exp(-2*pi*i*k/n) for k in [0, m], m = n//2 (host f64 -> dtype).
    Analog of the reference's pack-twiddle cache (``rfft.rs:246-261``)."""
    def build():
        m = n // 2
        k = np.arange(m + 1, dtype=np.float64)
        ang = -2.0 * np.pi * k / n
        return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)
    return tables.custom(("rfft_tw", n, dtype), build)


def _rfft_planes(x, n: int, backend: str):
    """real (..., n) -> one-sided planes (..., n//2+1), unnormalized."""
    dtype = str(x.dtype)
    if n % 2 != 0 or n < 4:
        # odd / tiny: full complex engine, slice one side
        yr, yi = _fft_planes(x, jnp.zeros_like(x), n, False, backend, dtype)
        return yr[..., : n // 2 + 1], yi[..., : n // 2 + 1]
    m = n // 2
    ev = x[..., 0::2]
    od = x[..., 1::2]
    zr, zi = _fft_planes(ev, od, m, False, backend, dtype)  # Z = FFT_m(z)
    # Z[m-k] with Z[m] := Z[0], for k = 0..m
    zr_ext = jnp.concatenate([zr, zr[..., :1]], axis=-1)     # Z[0..m]
    zi_ext = jnp.concatenate([zi, zi[..., :1]], axis=-1)
    zrev_r = jnp.flip(zr_ext, axis=-1)                        # Z[m-k]
    zrev_i = jnp.flip(zi_ext, axis=-1)
    zk_r, zk_i = zr_ext, zi_ext                               # Z[k], k=0..m
    # Xe = (Z[k] + conj(Z[m-k]))/2 ; Xo = -i/2 (Z[k] - conj(Z[m-k]))
    xe_r = 0.5 * (zk_r + zrev_r)
    xe_i = 0.5 * (zk_i - zrev_i)
    xo_r = 0.5 * (zk_i + zrev_i)
    xo_i = -0.5 * (zk_r - zrev_r)
    twr, twi = _unpack_tw(n, dtype)
    tr, ti = cmul(xo_r, xo_i, twr, twi)
    return xe_r + tr, xe_i + ti


def _irfft_planes(yr, yi, n: int, backend: str):
    """one-sided planes (..., n//2+1) -> real (..., n), unnormalized (n*x)."""
    dtype = str(yr.dtype)
    if n % 2 != 0 or n < 4:
        # rebuild the full Hermitian spectrum, full inverse complex engine
        tail_r = jnp.flip(yr[..., 1: (n + 1) // 2], axis=-1)
        tail_i = -jnp.flip(yi[..., 1: (n + 1) // 2], axis=-1)
        fr = jnp.concatenate([yr[..., : n // 2 + 1], tail_r], axis=-1)
        fi = jnp.concatenate([yi[..., : n // 2 + 1], tail_i], axis=-1)
        xr, _ = _fft_planes(fr, fi, n, True, backend, dtype)
        return xr
    m = n // 2
    # DC/Nyquist imaginary parts are unrealizable for a real signal; numpy's
    # irfft discards them via its final Re(), and the half-size unpack below
    # assumes they are zero — enforce that here for identical semantics.
    yi = yi.at[..., 0].set(0.0).at[..., m].set(0.0)
    # invert the unpack: Xe = (X[k] + conj(X[m-k]))/2,
    # w^k Xo = (X[k] - conj(X[m-k]))/2, Z[k] = Xe[k] + i*Xo[k], k = 0..m-1
    xrev_r = jnp.flip(yr, axis=-1)   # X[m-k], k = 0..m
    xrev_i = jnp.flip(yi, axis=-1)
    xe_r = 0.5 * (yr + xrev_r)
    xe_i = 0.5 * (yi - xrev_i)
    d_r = 0.5 * (yr - xrev_r)
    d_i = 0.5 * (yi + xrev_i)
    twr, twi = _unpack_tw(n, dtype)
    # Xo = conj(w^k) * (w^k Xo)
    xo_r, xo_i = cmul(d_r, d_i, twr, -twi)
    zr = (xe_r - xo_i)[..., :m]
    zi = (xe_i + xo_r)[..., :m]
    # z = m * ifft_m(Z) (engine inverse is unnormalized); x interleaves
    zr, zi = _fft_planes(zr, zi, m, True, backend, dtype)
    out = jnp.stack([zr, zi], axis=-1).reshape(*zr.shape[:-1], n)
    # engine inverse returned m*ifft; rfft/irfft convention wants n*ifft
    # relative to the caller's normalization of 1/n => multiply by 2
    return out * 2.0


# --------------------------------------------------------------------------
# traced + jitted entries
# --------------------------------------------------------------------------

def _rfft_traced(x, n: int, norm: Optional[str], backend: str):
    b = "xla" if backend in ("jnpfft",) else backend
    if b == "pallas":
        b = "xla"  # pallas rfft kernel lands later; engine path meanwhile
    yr, yi = _rfft_planes(x, n, b)
    s = _norm_scale(n, norm, False)
    if s is not None:
        yr, yi = yr * s, yi * s
    return yr, yi


def _irfft_traced(yr, yi, n: int, norm: Optional[str], backend: str):
    b = "xla" if backend in ("jnpfft", "pallas") else backend
    x = _irfft_planes(yr, yi, n, b)
    s = _norm_scale(n, norm, True)
    if s is not None:
        x = x * s
    return x


@functools.lru_cache(maxsize=None)
def _jitted_rfft(n: int, norm: Optional[str], backend: str):
    def f(x):
        yr, yi = _rfft_traced(x, n, norm, backend)
        return merge(yr, yi)
    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _jitted_rfft_pp(n: int, norm: Optional[str], backend: str):
    return jax.jit(functools.partial(_rfft_traced, n=n, norm=norm,
                                     backend=backend))


@functools.lru_cache(maxsize=None)
def _jitted_irfft_pp(n: int, norm: Optional[str], backend: str):
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
    if host and x.dtype == np.float64:
        x = x.astype(np.float32)
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
        yr, yi = _jitted_rfft_pp(m, norm, b)(x)
        y = np.asarray(yr) + 1j * np.asarray(yi)
    else:
        y = _jitted_rfft(m, norm, b)(x)
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
        yr = np.ascontiguousarray(y.real).astype(np.float32)
        yi = np.ascontiguousarray(y.imag).astype(np.float32)
    else:
        yr, yi = split(y)
    if _is_tracer(yr):
        x = _irfft_traced(yr, yi, m, norm, b)
    else:
        x = _jitted_irfft_pp(m, norm, b)(yr, yi)
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
    return _jitted_rfft_pp(n, norm, b)(x)


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
    return _jitted_irfft_pp(m, norm, b)(yr, yi)
