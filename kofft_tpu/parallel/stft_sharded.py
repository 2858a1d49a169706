"""Mesh-sharded STFT/ISTFT with ppermute halo exchange.

The distributed form of the reference's Rayon frame-parallel STFT
(``src/stft.rs:232-343``): the signal's time axis is sharded across chips;
each chip computes the frames whose hop-start lies in its shard, fetching
the ``win_len - hop`` samples that spill into the right neighbor via a
``ppermute`` halo exchange — structurally the reference's streaming OLA
carry (``stft.rs:407-520``) turned into ring/context parallelism
(SURVEY.md §5.7).

ISTFT reverses it: each chip overlap-adds its local frames, then sends the
``win_len - hop`` tail (signal + window-square norm) to its right neighbor
before normalizing. Output is the first ``F * hop`` samples — the streaming
"push" region; the final flush tail is returned separately by the caller
running :class:`kofft_tpu.ops.stft.IstftStream` semantics.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import InvalidHopSizeError, InvalidValueError, require
from ..ops.fft import _fft_planes
from ..ops.stft import _frame_indices, _window_const
from .mesh import make_mesh
from .ndfft_sharded import shard_map, _mesh_key, _MESHES

__all__ = ["stft_sharded", "istft_sharded"]


@functools.lru_cache(maxsize=None)
def _build_stft(mesh_key, n_local: int, win: int, hop: int,
                window_key: tuple, backend: str, ck: tuple = ()):
    mesh, axis_name = _MESHES[mesh_key]
    d = mesh.shape[axis_name]
    from ..ops.stft import _window_cache
    w = _window_cache[window_key]
    halo = max(0, win - hop)
    nf_local = n_local // hop
    idx = _frame_indices(nf_local, win, hop)

    def body(xs):  # xs: (n_local,) local shard
        # halo: first `halo` samples of the *right* neighbor; the last
        # shard pads with zeros (signal end zero-padding, stft.rs:94-99)
        if halo > 0:
            head = xs[:halo]
            # send my head to my left neighbor  <=>  receive right's head
            recv = jax.lax.ppermute(head, axis_name,
                                    perm=[(i, (i - 1) % d)
                                          for i in range(d)])
            my_id = jax.lax.axis_index(axis_name)
            recv = jnp.where(my_id == d - 1, jnp.zeros_like(recv), recv)
            ext = jnp.concatenate([xs, recv])
        else:
            ext = xs
        frames = ext[idx] * w
        return _fft_planes(frames, jnp.zeros_like(frames), win, False,
                           backend, "float32")

    f = shard_map(body, mesh, in_specs=P(axis_name),
                  out_specs=(P(axis_name, None), P(axis_name, None)))
    return jax.jit(f), NamedSharding(mesh, P(axis_name))


def stft_sharded(signal, window, hop: int, mesh: Optional[Mesh] = None,
                 axis_name: str = "d", backend: str = "xla"):
    """Distributed STFT of a 1-D signal sharded over the mesh.

    Requires len(signal) divisible by (mesh size * hop). Returns frame
    spectra planes of shape (F, win), frame axis sharded over the mesh;
    values identical to the single-chip :func:`kofft_tpu.ops.stft.stft`."""
    require(hop >= 1, InvalidHopSizeError, f"hop must be >= 1, got {hop}")
    mesh = mesh if mesh is not None else make_mesh(axis_name=axis_name)
    d = mesh.shape[axis_name]
    w = _window_const(window)
    from ..ops.stft import _window_key
    x = jnp.asarray(signal, jnp.float32) if not isinstance(
        signal, jax.Array) else signal
    require(x.ndim == 1, InvalidValueError,
            "stft_sharded takes a 1-D signal")
    n = x.shape[0]
    require(n % (d * hop) == 0, InvalidValueError,
            f"signal length {n} must be divisible by mesh*hop = {d * hop}")
    from ..config import trace_key
    fn, sharding = _build_stft(_mesh_key(mesh, axis_name), n // d,
                               w.shape[0], hop, _window_key(w), backend,
                               trace_key())
    x = jax.device_put(x, sharding)
    return fn(x)


@functools.lru_cache(maxsize=None)
def _build_istft(mesh_key, nf_local: int, win: int, hop: int,
                 window_key: tuple, backend: str, ck: tuple = ()):
    mesh, axis_name = _MESHES[mesh_key]
    d = mesh.shape[axis_name]
    from ..ops.stft import _window_cache
    w = _window_cache[window_key]
    halo = max(0, win - hop)
    n_local = nf_local * hop
    wsq = (w * w).astype(np.float32)

    def body(fr, fi):  # (nf_local, win) each
        from ..ops.stft import _ola_add
        tr, _ = _fft_planes(fr, fi, win, True, backend, "float32")
        y = (tr / win) * w
        # gather-free OLA (see ops/stft._ola_add); local span is
        # (nf_local - 1) * hop + win = n_local + halo
        acc = _ola_add(y, win, hop, nf_local)
        norm = _ola_add(jnp.broadcast_to(wsq, (nf_local, win)), win, hop,
                        nf_local)
        if acc.shape[-1] < n_local + halo:     # win < hop: sparse frames
            pad = [(0, n_local + halo - acc.shape[-1])]
            acc = jnp.pad(acc, pad)
            norm = jnp.pad(norm, pad)
        if halo > 0:
            # my tail overlaps the right neighbor's head: send tail right
            perm = [(i, (i + 1) % d) for i in range(d)]
            tail_acc = jax.lax.ppermute(acc[n_local:], axis_name, perm=perm)
            tail_norm = jax.lax.ppermute(norm[n_local:], axis_name,
                                         perm=perm)
            my_id = jax.lax.axis_index(axis_name)
            tail_acc = jnp.where(my_id == 0, jnp.zeros_like(tail_acc),
                                 tail_acc)
            tail_norm = jnp.where(my_id == 0, jnp.zeros_like(tail_norm),
                                  tail_norm)
            acc = acc[:n_local].at[:halo].add(tail_acc)
            norm = norm[:n_local].at[:halo].add(tail_norm)
        else:
            acc, norm = acc[:n_local], norm[:n_local]
        return jnp.where(norm > 1e-8,
                         acc / jnp.where(norm > 1e-8, norm, 1.0), acc)

    f = shard_map(body, mesh,
                  in_specs=(P(axis_name, None), P(axis_name, None)),
                  out_specs=P(axis_name))
    return jax.jit(f)


def istft_sharded(fr, fi, window, hop: int, mesh: Optional[Mesh] = None,
                  axis_name: str = "d", backend: str = "xla"):
    """Distributed ISTFT from frame planes sharded over the frame axis.

    Returns the first F*hop reconstructed samples (the streaming "push"
    region; reference ``IstftStream::push_frame`` semantics) sharded over
    the mesh. Requires F divisible by the mesh size."""
    require(hop >= 1, InvalidHopSizeError, f"hop must be >= 1, got {hop}")
    mesh = mesh if mesh is not None else make_mesh(axis_name=axis_name)
    d = mesh.shape[axis_name]
    w = _window_const(window)
    from ..ops.stft import _window_key
    fr = jnp.asarray(fr)
    fi = jnp.asarray(fi)
    require(fr.ndim == 2 and fr.shape == fi.shape, InvalidValueError,
            "istft_sharded takes (F, win) planes")
    require(fr.shape[-1] == w.shape[0], InvalidValueError,
            f"frame length {fr.shape[-1]} != window length {w.shape[0]}")
    nf = fr.shape[0]
    require(nf % d == 0, InvalidValueError,
            f"frame count {nf} must be divisible by mesh size {d}")
    from ..config import trace_key
    fn = _build_istft(_mesh_key(mesh, axis_name), nf // d, w.shape[0], hop,
                      _window_key(w), backend, trace_key())
    sharding = NamedSharding(mesh, P(axis_name, None))
    fr = jax.device_put(fr, sharding)
    fi = jax.device_put(fi, sharding)
    return fn(fr, fi)
