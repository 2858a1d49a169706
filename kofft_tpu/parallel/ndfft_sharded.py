"""Mesh-sharded N-D FFT: pencil/slab decomposition with all-to-all.

The distributed equivalent of the reference's strided N-D decomposition
(``src/ndfft.rs:114-153``): each chip holds a slab (sharded leading axis),
transforms every *local* axis with the batched matmul engine, then one
``all_to_all`` over the ICI re-pencils the array (leading axis gathered,
trailing axis scattered) so the remaining axis becomes local and is
transformed in place. One collective per re-pencil — the four-step
factorization at pod scale (SURVEY.md §5.7: the Stockham staging is the
within-chip version of the same recursion).

Layout contract: input sharded on axis 0, output sharded on the last
transformed axis (set ``restore_layout=True`` to pay a second all_to_all
and return to input layout).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map_fn

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_fn(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)

from ..errors import InvalidValueError, require
from ..ops.ndfft import _fftn_planes
from .mesh import make_mesh

__all__ = ["fftn_sharded", "ifftn_sharded"]


def _local_stage(xr, xi, ndim: int, inverse: bool, backend: str,
                 axis_name: str):
    """Per-shard body: local axes -> all_to_all -> leading axis."""
    # 1. transform all non-sharded axes (1..ndim-1) locally
    local_axes = tuple(range(1, ndim))
    if local_axes:
        xr, xi = _fftn_planes(xr, xi, local_axes, inverse, backend)
    # 2. re-pencil: gather axis 0, scatter the last axis over the mesh
    xr = jax.lax.all_to_all(xr, axis_name, split_axis=ndim - 1,
                            concat_axis=0, tiled=True)
    xi = jax.lax.all_to_all(xi, axis_name, split_axis=ndim - 1,
                            concat_axis=0, tiled=True)
    # 3. transform the (now local) leading axis
    xr, xi = _fftn_planes(xr, xi, (0,), inverse, backend)
    return xr, xi


def _overlap_stage(xr, xi, ndim: int, inverse: bool, backend: str,
                   axis_name: str, k_chunks: int):
    """Chunked pipeline body (communication/compute overlap; SURVEY §7's
    weak-scaling hard part, reference strided decomposition
    /root/reference/src/ndfft.rs:114-153).

    The last axis is transformed first (its DFT mixes all its columns),
    then each chunk of its OUTPUT columns runs an independent chain:
    middle-axes FFT -> all_to_all -> leading-axis FFT -> restore
    all_to_all — so chunk k+1's collective flies while chunk k computes
    (2K independent collective source chains, machine-checked by
    ``validate.hlo_a2a_independent_sources``). Restore-layout only: the
    chunk-k restore gathers columns k*lc/K + c*lc/(dK) + u in ascending
    order, so concatenating chunk outputs along the last axis rebuilds
    the natural input layout exactly. Total collective volume is the
    canonical (D-1)/D per chip, unchanged."""
    # 1. the axis whose columns we chunk must be fully transformed first
    xr, xi = _fftn_planes(xr, xi, (ndim - 1,), inverse, backend)
    lc = xr.shape[-1]
    ck = lc // k_chunks
    mids = tuple(range(1, ndim - 1))
    outs = []
    for k in range(k_chunks):
        cr = xr[..., k * ck:(k + 1) * ck]
        ci = xi[..., k * ck:(k + 1) * ck]
        if mids:
            cr, ci = _fftn_planes(cr, ci, mids, inverse, backend)
        cr = jax.lax.all_to_all(cr, axis_name, split_axis=ndim - 1,
                                concat_axis=0, tiled=True)
        ci = jax.lax.all_to_all(ci, axis_name, split_axis=ndim - 1,
                                concat_axis=0, tiled=True)
        cr, ci = _fftn_planes(cr, ci, (0,), inverse, backend)
        cr = jax.lax.all_to_all(cr, axis_name, split_axis=0,
                                concat_axis=ndim - 1, tiled=True)
        ci = jax.lax.all_to_all(ci, axis_name, split_axis=0,
                                concat_axis=ndim - 1, tiled=True)
        outs.append((cr, ci))
    xr = jnp.concatenate([o[0] for o in outs], axis=-1)
    xi = jnp.concatenate([o[1] for o in outs], axis=-1)
    return xr, xi


@functools.lru_cache(maxsize=None)
def _build(mesh_key, ndim: int, inverse: bool, backend: str,
           restore_layout: bool, ck: tuple = (), overlap: int = 1):
    mesh, axis_name = _MESHES[mesh_key]
    in_spec = P(axis_name, *([None] * (ndim - 1)))
    out_spec = (in_spec if restore_layout
                else P(*([None] * (ndim - 1)), axis_name))

    if overlap > 1:
        def body(xr, xi):
            return _overlap_stage(xr, xi, ndim, inverse, backend,
                                  axis_name, overlap)
    else:
        def body(xr, xi):
            xr, xi = _local_stage(xr, xi, ndim, inverse, backend, axis_name)
            if restore_layout:
                xr = jax.lax.all_to_all(xr, axis_name, split_axis=0,
                                        concat_axis=ndim - 1, tiled=True)
                xi = jax.lax.all_to_all(xi, axis_name, split_axis=0,
                                        concat_axis=ndim - 1, tiled=True)
            return xr, xi

    f = shard_map(body, mesh, in_specs=(in_spec, in_spec),
                  out_specs=(out_spec, out_spec))
    return jax.jit(f), NamedSharding(mesh, in_spec)


_MESHES: dict = {}


def _mesh_key(mesh: Mesh, axis_name: str):
    key = (tuple(d.id for d in mesh.devices.flat), mesh.axis_names,
           axis_name)
    _MESHES[key] = (mesh, axis_name)
    return key


def fftn_sharded(xr, xi, mesh: Optional[Mesh] = None,
                 axis_name: str = "d", inverse: bool = False,
                 backend: str = "xla", restore_layout: bool = False,
                 overlap: int = 1):
    """Distributed N-D FFT over all axes of (xr, xi) planes.

    Input is (re)sharded on axis 0 of the mesh axis ``axis_name``; output
    planes are sharded on the last axis unless ``restore_layout``.
    Requires shape[0] and shape[-1] divisible by the mesh size.

    ``overlap=K`` (K > 1) splits the collective stage into K independent
    chunk chains so all_to_alls overlap local FFT compute (see
    ``_overlap_stage``); requires ``restore_layout=True`` and the last
    axis divisible by mesh_size * K."""
    mesh = mesh if mesh is not None else make_mesh(axis_name=axis_name)
    d = mesh.shape[axis_name]
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    require(xr.ndim >= 2, InvalidValueError,
            "fftn_sharded needs >= 2 dims (use fft_split for 1-D)")
    require(xr.shape == xi.shape, InvalidValueError,
            "re/im plane shapes differ")
    require(xr.shape[0] % d == 0 and xr.shape[-1] % d == 0,
            InvalidValueError,
            f"axis 0 ({xr.shape[0]}) and axis -1 ({xr.shape[-1]}) must be "
            f"divisible by the mesh size {d}")
    require(overlap >= 1, InvalidValueError, "overlap must be >= 1")
    require(overlap == 1 or restore_layout, InvalidValueError,
            "overlap > 1 requires restore_layout=True (natural order)")
    require(xr.shape[-1] % (d * overlap) == 0, InvalidValueError,
            f"overlap={overlap} needs axis -1 ({xr.shape[-1]}) divisible "
            f"by mesh_size*overlap = {d * overlap}")
    from ..config import trace_key
    fn, in_sharding = _build(_mesh_key(mesh, axis_name), xr.ndim, inverse,
                             backend, restore_layout, trace_key(), overlap)
    xr = jax.device_put(xr, in_sharding)
    xi = jax.device_put(xi, in_sharding)
    # inverse normalization (1/n per axis) happens inside _fftn_planes
    return fn(xr, xi)


def ifftn_sharded(xr, xi, mesh: Optional[Mesh] = None,
                  axis_name: str = "d", backend: str = "xla",
                  restore_layout: bool = False, overlap: int = 1):
    return fftn_sharded(xr, xi, mesh=mesh, axis_name=axis_name,
                        inverse=True, backend=backend,
                        restore_layout=restore_layout, overlap=overlap)
