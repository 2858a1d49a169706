"""Automatic single-chip vs sharded dispatch.

The reference's Rayon layer decides per call whether to parallelize using
its threshold heuristic (``src/fft.rs:244-307``); this is the mesh analog:
``fftn_auto`` / ``stft_auto`` consult :func:`kofft_tpu.parallel.should_shard`
(points-per-chip vs KOFFT_TPU_SHARD_THRESHOLD) and the divisibility
constraints, then route to the sharded collective path or the single-chip
engine.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..ops.ndfft import fftn_split
from ..ops.stft import stft_split
from .mesh import make_mesh, should_shard
from .ndfft_sharded import fftn_sharded
from .stft_sharded import stft_sharded

__all__ = ["fftn_auto", "stft_auto"]


def _usable_devices() -> int:
    return len(jax.devices())


def fftn_auto(xr, xi, axis_name: str = "d", inverse: bool = False):
    """N-D FFT planes: sharded when worth it and shapes divide, else local.

    Returns (yr, yi); sharded results keep their device sharding (last
    axis) — call ``np.asarray`` to gather.
    """
    d = _usable_devices()
    shape = np.shape(xr)
    total = int(np.prod(shape))
    if (d > 1 and len(shape) >= 2 and should_shard(total, d)
            and shape[0] % d == 0 and shape[-1] % d == 0):
        return fftn_sharded(xr, xi, mesh=make_mesh(d, axis_name),
                            axis_name=axis_name, inverse=inverse)
    return fftn_split(xr, xi, inverse=inverse)


def stft_auto(signal, window, hop: int, axis_name: str = "d"):
    """1-D STFT planes: frame-sharded with halo exchange when worth it."""
    d = _usable_devices()
    n = np.shape(signal)[-1]
    w = np.asarray(window)
    halo_ok = (n // d) >= max(0, w.shape[0] - hop) if d > 0 else False
    if (d > 1 and np.ndim(signal) == 1 and should_shard(n, d)
            and n % (d * hop) == 0 and halo_ok):
        return stft_sharded(signal, window, hop,
                            mesh=make_mesh(d, axis_name),
                            axis_name=axis_name)
    return stft_split(signal, window, hop)
