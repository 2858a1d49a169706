"""N-D FFT (single device): per-axis batched 1-D transforms.

Reference: ``src/ndfft.rs`` — 2-D/3-D FFT by row-column(-depth) decomposition
over *strided* 1-D FFTs (``ndfft.rs:74-100``, ``:114-153``), whose
gather/scatter hot spot is cache-hostile. The TPU formulation replaces
strided access with moveaxis (XLA lays out/fuses the transpose) + the
contiguous batched matmul engine per axis — the single most important
architectural divergence from the reference (SURVEY.md §3.5). The
mesh-sharded version with all-to-all lives in
``kofft_tpu.parallel.ndfft_sharded``.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import trace_key
from ..errors import (EmptyInputError, InvalidValueError,
                      MismatchedLengthsError, require)
from ._complex import merge
from .fft import (_fft_planes, _is_tracer, _platform_default,
                  complex_io_supported, engine_fft_planes, resolve_backend)

__all__ = ["fft2", "ifft2", "fft3", "ifft3", "fftn", "ifftn",
           "fftn_split", "rfftn", "irfftn", "rfftn_split", "irfftn_split"]


def _nd_jnp_zone(shape: tuple, axes: tuple) -> bool:
    """Shape class where XLA's fused built-in fftn is the measured-fastest
    engine (v5e): >= 2 mid-size pow2 axes at >= 2^20 total points — it
    avoids our per-axis moveaxis round-trips (1024^2: ours 168 us, fftn
    147 us; 2048^2: 669 vs 591). Smaller grids (<= 512^2) and short axes
    (128^3) stay on the per-axis engine, which wins there (1.4-1.6x)."""
    if len(axes) < 2:
        return False
    total = 1
    for s in shape:
        total *= s
    if total < (1 << 20):
        return False
    for a in axes:
        n = shape[a]
        if n & (n - 1) or not ((1 << 10) <= n <= (1 << 16)):
            return False
    return True


_SMALL_AXES_MAX_N = 256


def _small_axes_zone(shape: tuple, axes: tuple) -> bool:
    """Shape class for the direct per-axis einsum method: >= 2 transform
    axes, each small enough for one dense DFT matmul. Covers the 128^3
    class where the moveaxis round-trips of the generic path dominate.
    Capped at 15 total dims (the einsum letter pool); beyond that the
    generic per-axis path handles it.

    256^3 PROVEN FLOOR (r5, VERDICT r4 #5): this zone also owns the
    beyond-VMEM 256^3 class at jnp parity on `highest` (3564 vs
    3481 us) and 1.47x on `default` (2381 vs 3489). `highest` is
    MXU-bound on the dense k=256 Gauss dots (~77 GFLOP at the 6-pass
    f32 rate ~= 2.3 ms arithmetic floor before HBM/relayout), and no
    factored form can undercut it: 256-length lines decompose into
    k <= 16 leaf dots that underutilize the 128-deep MXU — the
    bt-folded fused-2D + axis-0 GEMM candidate measured 4485/5850 us
    `highest` and 2878/2910 `default` (bt=8/16,
    benchmarks/exp_cube.py|.out), and the r4 small-block fused-2D +
    einsum candidate lost too (exp_2d_big.py). Do not retry without a
    structurally different idea."""
    if len(axes) < 2 or len(shape) > 15:
        return False
    return all(2 <= shape[a] <= _SMALL_AXES_MAX_N for a in axes)


def _axis_einsum_planes(xr, xi, axes: tuple, inverse: bool, dtype: str):
    """N-D DFT over small axes as direct dense-DFT einsums IN PLACE of
    the axis — ``Y[a,k,c] = sum_j F[j,k] X[a,j,c]`` — with the Gauss
    3-multiply complex form. No explicit moveaxis: XLA fuses the axis
    relayout into the GEMM. Replaces the reference's strided per-axis
    decomposition (``ndfft.rs:114-153``) for small-axis grids.

    Measured (v5e, 128^3 c32, chained): 199.5 us vs 240.2 for XLA's
    fused fftn, 246.0 for the 4-mult form, 304.2 for the rotation
    formulation ('kj,abj->kab'), and 243.5 for the r1 moveaxis engine —
    the only XLA formulation that beats the XLA built-in here, and the
    one place where Gauss DOES pay in XLA-land (the 128^3 planes stay
    VMEM-resident across the chain, so the einsums are pass-bound, not
    HBM-bound). SNR 135.3 dB vs f64. Inverse via conjugation; the 1/n
    scaling is applied by the caller per axis convention.

    On TPU the pow2 [128, 512]-axis subclass now routes one level
    higher to the fused one-call Pallas kernel (175.4 us at 128^3,
    ``pallas_kernels.fused_nd_zone``); this einsum path remains the
    engine for CPU/f64, non-pow2 small axes, partial-axes transforms,
    and sub-2^17 grids."""
    from ..config import lax_precision
    from ..plan import tables
    if inverse:
        yr, yi = _axis_einsum_planes(xr, -xi, axes, False, dtype)
        return yr, -yi
    p = lax_precision()
    nd = xr.ndim
    ltrs = "abcdefghilmnopq"[:nd]   # j, k reserved for the contraction

    def ein(sub, m, v):
        return jnp.einsum(sub, m, v, precision=p)

    for ax in axes:
        a = ax % nd
        n = xr.shape[a]
        fr, fi = tables.dft_matrix(n, dtype)      # symmetric: F[j,k]
        src = ltrs[:a] + "j" + ltrs[a + 1:]
        dst = ltrs[:a] + "k" + ltrs[a + 1:]
        sub = f"jk,{src}->{dst}"
        t1 = ein(sub, jnp.asarray(fr), xr)
        t2 = ein(sub, jnp.asarray(fi), xi)
        t3 = ein(sub, jnp.asarray(fr + fi), xr + xi)
        xr, xi = t1 - t2, t3 - t1 - t2
    return xr, xi


def _inverse_rescale(yr, yi, shape: tuple, axes: tuple, inverse: bool):
    """1/n-per-axis scaling for paths whose engine returns the
    UNNORMALIZED inverse (fused-nd, einsum)."""
    if not inverse:
        return yr, yi
    scale = 1.0
    for a in axes:
        scale = scale * shape[a]
    return yr / scale, yi / scale


def _fftn_planes(xr, xi, axes: tuple, inverse: bool, backend: str):
    dtype = str(xr.dtype)
    nd = xr.ndim
    if (backend in ("auto", "pallas")
            and _platform_default() == "pallas" and dtype == "float32"):
        from . import pallas_kernels as PK
        from .pallas_fft import (pallas_fft2_planes, pallas_fftn_planes,
                                 pallas_supported)
        # the env kill-switch and TPU gate ride pallas_supported's
        # smallest served size; the shape gates are the fused zones.
        # The 2-D zone is checked BEFORE the jnp zone below (1024^2
        # sits in both; the 2-D kernel wins 134 vs 152 us) and BEFORE
        # the dense fused-nd zone (512^2 sits in both; the leaf-32
        # recursion wins 33.8 vs 51.0) — the two zones are disjoint
        # only by this ordering, not by construction
        if pallas_supported(1 << 14, dtype):
            if PK.fused_2d_zone(xr.shape, axes):
                yr, yi = pallas_fft2_planes(xr, xi, inverse)
                return _inverse_rescale(yr, yi, xr.shape, axes, inverse)
            if PK.fused_2d_big_zone(xr.shape, axes):
                # beyond-VMEM images (4096^2-class): the two-call pair
                # at two HBM round-trips beats both jnp.fftn and the
                # per-axis engine route (benchmarks/exp_2d_big.py)
                from .pallas_fft import pallas_fft2_big_planes
                yr, yi = pallas_fft2_big_planes(xr, xi, inverse)
                return _inverse_rescale(yr, yi, xr.shape, axes, inverse)
            if PK.fused_nd_zone(xr.shape, axes):
                yr, yi = pallas_fftn_planes(xr, xi, inverse)
                return _inverse_rescale(yr, yi, xr.shape, axes, inverse)
    if (backend == "auto" and _platform_default() == "pallas"
            and _nd_jnp_zone(xr.shape, axes)):
        x = merge(xr, xi)
        y = (jnp.fft.ifftn(x, axes=axes) if inverse
             else jnp.fft.fftn(x, axes=axes))
        return jnp.real(y), jnp.imag(y)
    if (backend in ("auto", "xla", "pallas")
            and _small_axes_zone(xr.shape, axes)):
        yr, yi = _axis_einsum_planes(xr, xi, axes, inverse, dtype)
        return _inverse_rescale(yr, yi, xr.shape, axes, inverse)
    for ax in axes:
        a = ax % nd
        if a != nd - 1:
            xr = jnp.moveaxis(xr, a, -1)
            xi = jnp.moveaxis(xi, a, -1)
        n = xr.shape[-1]
        if backend in ("pallas", "auto"):
            xr, xi = engine_fft_planes(xr, xi, n, inverse, dtype, backend)
        else:
            xr, xi = _fft_planes(xr, xi, n, inverse, backend, dtype)
        if inverse:
            xr, xi = xr / n, xi / n
        if a != nd - 1:
            xr = jnp.moveaxis(xr, -1, a)
            xi = jnp.moveaxis(xi, -1, a)
    return xr, xi


@functools.lru_cache(maxsize=None)
def _jit_fftn(shape: tuple, axes: tuple, inverse: bool, backend: str,
              ck: tuple = ()):
    return jax.jit(functools.partial(_fftn_planes, axes=axes,
                                     inverse=inverse, backend=backend))


def _norm_axes(ndim: int, axes: Optional[Sequence[int]]) -> tuple:
    if axes is None:
        axes = tuple(range(ndim))
    axes = tuple(int(a) % ndim for a in axes)
    require(len(set(axes)) == len(axes), InvalidValueError,
            f"repeated axes in {axes}")
    return axes


def fftn_split(xr, xi, axes: Optional[Sequence[int]] = None,
               inverse: bool = False, backend: Optional[str] = None):
    """N-D FFT on SoA planes (traceable)."""
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    require(xr.ndim >= 1, EmptyInputError, "fftn input must have >= 1 dim")
    axes = _norm_axes(xr.ndim, axes)
    b = resolve_backend(backend)
    b = "xla" if b in ("jnpfft",) else b
    if _is_tracer(xr) or _is_tracer(xi):
        return _fftn_planes(xr, xi, axes, inverse, b)
    return _jit_fftn(xr.shape, axes, inverse, b, trace_key())(xr, xi)


def _dispatch_nd(x, axes, inverse, backend):
    host = not isinstance(x, (jax.Array, jax.core.Tracer))
    if host:
        from ._complex import host_float_dtype
        x = np.asarray(x)
        ft = host_float_dtype(x.real.dtype)
        xr = np.ascontiguousarray(x.real).astype(ft)
        xi = (np.ascontiguousarray(x.imag).astype(ft)
              if np.iscomplexobj(x) else np.zeros_like(xr))
    else:
        x = jnp.asarray(x)
        if jnp.iscomplexobj(x):
            xr, xi = jnp.real(x), jnp.imag(x)
        else:
            xr, xi = x, jnp.zeros_like(x)
    require(xr.ndim >= 1 and min(xr.shape) >= 1, EmptyInputError,
            "fftn input must be non-empty")
    axes = _norm_axes(xr.ndim, axes)
    b = resolve_backend(backend)
    b = "xla" if b in ("jnpfft",) else b
    if _is_tracer(xr):
        yr, yi = _fftn_planes(xr, xi, axes, inverse, b)
        return merge(yr, yi)
    yr, yi = _jit_fftn(xr.shape, axes, inverse, b, trace_key())(xr, xi)
    if not complex_io_supported():
        # banned transport: host numpy for any residency (a device
        # complex array would be neither downloadable nor re-feedable)
        return np.asarray(yr) + 1j * np.asarray(yi)
    return merge(yr, yi)


def fftn(x, axes: Optional[Sequence[int]] = None,
         backend: Optional[str] = None):
    """N-D FFT over ``axes`` (default: all)."""
    return _dispatch_nd(x, axes, False, backend)


def ifftn(x, axes: Optional[Sequence[int]] = None,
          backend: Optional[str] = None):
    return _dispatch_nd(x, axes, True, backend)


def fft2(x, backend: Optional[str] = None):
    """2-D FFT over the last two axes (reference ``fft2d_inplace``,
    ``ndfft.rs:74-100``)."""
    require(np.ndim(x) >= 2, InvalidValueError, "fft2 needs >= 2 dims")
    return fftn(x, axes=(-2, -1), backend=backend)


def ifft2(x, backend: Optional[str] = None):
    require(np.ndim(x) >= 2, InvalidValueError, "ifft2 needs >= 2 dims")
    return ifftn(x, axes=(-2, -1), backend=backend)


def rfftn_split(x, axes: Optional[Sequence[int]] = None,
                backend: Optional[str] = None):
    """N-D FFT of a REAL input on SoA planes (numpy ``rfftn``
    convention, no reference analog — TPU-native superset): real
    one-sided FFT along the LAST of ``axes`` (length ``n//2 + 1``),
    complex FFT over the remaining axes. Composes the verified rfft and
    fftn engines, so each stage rides its measured-fastest path
    (in-kernel one-sided assembly, fused N-D zone...)."""
    from .rfft import rfft_split
    x = jnp.asarray(x)
    # uniform complex rejection: host callers hit the same typed error
    # (rfftn below), matching rfft's _prep_real and numpy's complex-input
    # rejection — previously a complex jax.Array slipped through to the
    # engine while host input was silently .real-stripped
    require(not jnp.iscomplexobj(x), InvalidValueError,
            "rfftn input must be real")
    require(x.ndim >= 1 and min(x.shape) >= 1, EmptyInputError,
            "rfftn input must be non-empty")
    axes = _norm_axes(x.ndim, axes)
    require(len(axes) >= 1, InvalidValueError,
            "rfftn needs at least one axis (numpy raises here too)")
    last = axes[-1]
    if last != x.ndim - 1:
        x = jnp.moveaxis(x, last, -1)
    yr, yi = rfft_split(x, backend=backend)
    if last != yr.ndim - 1:
        yr = jnp.moveaxis(yr, -1, last)
        yi = jnp.moveaxis(yi, -1, last)
    if len(axes) > 1:
        yr, yi = fftn_split(yr, yi, axes=axes[:-1], backend=backend)
    return yr, yi


def irfftn_split(yr, yi, n: Optional[int] = None,
                 axes: Optional[Sequence[int]] = None,
                 backend: Optional[str] = None):
    """Inverse of :func:`rfftn_split` -> real signal. ``n`` sets the
    LAST transformed axis's output length (default
    ``2*(shape[axes[-1]] - 1)``, numpy convention); the other axes keep
    their lengths."""
    from .rfft import irfft_split
    yr = jnp.asarray(yr)
    yi = jnp.asarray(yi)
    require(yr.shape == yi.shape, MismatchedLengthsError,
            f"re/im plane shapes differ: {yr.shape} vs {yi.shape}")
    require(yr.ndim >= 1 and min(yr.shape) >= 1, EmptyInputError,
            "irfftn input must be non-empty")
    axes = _norm_axes(yr.ndim, axes)
    require(len(axes) >= 1, InvalidValueError,
            "irfftn needs at least one axis")
    last = axes[-1]
    if len(axes) > 1:
        yr, yi = fftn_split(yr, yi, axes=axes[:-1], inverse=True,
                            backend=backend)
    if last != yr.ndim - 1:
        yr = jnp.moveaxis(yr, last, -1)
        yi = jnp.moveaxis(yi, last, -1)
    x = irfft_split(yr, yi, n=n, backend=backend)
    if last != x.ndim - 1:
        x = jnp.moveaxis(x, -1, last)
    return x


def rfftn(x, axes: Optional[Sequence[int]] = None,
          backend: Optional[str] = None):
    """N-D real FFT (complex output; see :func:`rfftn_split`)."""
    host = not isinstance(x, (jax.Array, jax.core.Tracer))
    if host:
        from ._complex import host_float_dtype
        x = np.asarray(x)
        require(not np.iscomplexobj(x), InvalidValueError,
                "rfftn input must be real")
        x = np.ascontiguousarray(x).astype(host_float_dtype(x.dtype))
    yr, yi = rfftn_split(x, axes=axes, backend=backend)
    if _is_tracer(yr):
        return merge(yr, yi)
    if not complex_io_supported():
        return np.asarray(yr) + 1j * np.asarray(yi)
    return merge(yr, yi)


def irfftn(y, n: Optional[int] = None,
           axes: Optional[Sequence[int]] = None,
           backend: Optional[str] = None):
    """Inverse N-D real FFT from a complex spectrum (numpy ``irfftn``
    convention for the last transformed axis's length ``n``)."""
    host = not isinstance(y, (jax.Array, jax.core.Tracer))
    if host:
        from ._complex import host_float_dtype
        y = np.asarray(y)
        ft = host_float_dtype(y.real.dtype)
        yr = np.ascontiguousarray(y.real).astype(ft)
        yi = (np.ascontiguousarray(y.imag).astype(ft)
              if np.iscomplexobj(y) else np.zeros_like(yr))
    else:
        y = jnp.asarray(y)
        yr, yi = (jnp.real(y), jnp.imag(y)) if jnp.iscomplexobj(y) \
            else (y, jnp.zeros_like(y))
    x = irfftn_split(yr, yi, n=n, axes=axes, backend=backend)
    if not _is_tracer(x) and not complex_io_supported():
        return np.asarray(x)
    return x


def fft3(x, backend: Optional[str] = None):
    """3-D FFT over the last three axes (reference ``fft3d_inplace``,
    ``ndfft.rs:114-153``)."""
    require(np.ndim(x) >= 3, InvalidValueError, "fft3 needs >= 3 dims")
    return fftn(x, axes=(-3, -2, -1), backend=backend)


def ifft3(x, backend: Optional[str] = None):
    require(np.ndim(x) >= 3, InvalidValueError, "ifft3 needs >= 3 dims")
    return ifftn(x, axes=(-3, -2, -1), backend=backend)
