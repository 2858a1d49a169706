"""Mesh construction + the shard/no-shard cost heuristic.

The heuristic mirrors the reference's ``KOFFT_PAR_FFT_THRESHOLD`` gate
(``src/fft.rs:244-307``: parallelize only when per-core work exceeds a
tunable floor): we shard only when points-per-chip stays above
``config.shard_threshold``, because below it the all-to-all/halo latency
dominates the compute saved.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import get_config


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "d",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def should_shard(total_points: int, n_devices: int) -> bool:
    """Gate sharded execution on per-chip work (reference threshold
    heuristic analog; tunable via KOFFT_TPU_SHARD_THRESHOLD /
    ``set_shard_threshold``)."""
    if n_devices <= 1:
        return False
    return total_points // n_devices >= get_config().shard_threshold
