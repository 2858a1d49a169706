"""Checkpoint save/load for model parameters.

The reference has no checkpointing (stateless transforms, SURVEY.md §5.4);
the framework adds it for the trainable frontends. Plain ``.npz`` — the
params are small pytrees of arrays; for large sharded states swap in
orbax with the same call shape.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from .spectral_net import SpectralNetParams


def save_params(path, params) -> None:
    """Save a flat NamedTuple/pytree of arrays to .npz."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez(str(path), **arrays)


def load_params(path) -> SpectralNetParams:
    """Load SpectralNet params saved by :func:`save_params`."""
    with np.load(str(path)) as z:
        get = {k.lstrip("."): z[k] for k in z.files}
    return SpectralNetParams(
        mel=jax.numpy.asarray(get["mel"]),
        w_head=jax.numpy.asarray(get["w_head"]),
        b_head=jax.numpy.asarray(get["b_head"]))
