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

__all__ = ["stft_sharded", "istft_sharded",
           "stft_sharded_hier", "istft_sharded_hier"]


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


# --------------------------------------------------------------------------
# Two-level (slice, chip) hierarchy: the halo composes with the mesh tiers.
#
# Shards are linearized (slice-major, chip-minor), so a shard's right
# neighbor is the next chip IN THE SAME SLICE except at the slice edge,
# where it is chip 0 of the NEXT slice. The halo therefore splits into
# TWO ppermutes over the combined (slice, chip) axes with disjoint pair
# sets:
#   1. ICI op: the in-slice neighbor pairs only
#   2. DCN op: the s-1 slice-boundary pairs only — each boundary halo
#      crosses the DCN exactly once, and the op carries nothing else
# Every halo byte moves exactly once (no all-chip broadcast on the DCN
# leg), and the two transfers are data-independent ops the latency
# scheduler can run concurrently — unlike a single flat-ring ppermute,
# which completes at the slowest (DCN) pair's speed for every chip.
# Reference analog: the Rayon frame map (src/stft.rs:232-343), whose
# shared-slice reads become these explicit tiered transfers.
# --------------------------------------------------------------------------


def _halo_recv_hier(head, s_name: str, c_name: str, s: int, c: int):
    """Each shard's halo = the head of its right neighbor in the
    (slice-major, chip-minor) linear order; zeros at the global end.
    Tiered: one ICI ppermute (in-slice pairs), one DCN ppermute (the
    s-1 boundary pairs). Destination sets are disjoint, missing
    destinations produce zeros, so the sum merges the two legs."""
    d = s * c
    axes = (s_name, c_name)
    ici = [(i, i - 1) for i in range(1, d) if i % c != 0]
    dcn = [(i, i - 1) for i in range(c, d, c)]
    recv = jax.lax.ppermute(head, axes, perm=ici)
    if dcn:
        recv = recv + jax.lax.ppermute(head, axes, perm=dcn)
    return recv


def _halo_send_right_hier(tail, s_name: str, c_name: str, s: int, c: int):
    """Mirror of :func:`_halo_recv_hier` for the ISTFT: each shard's OLA
    tail lands on its right neighbor; shard (0, 0) receives zeros."""
    d = s * c
    axes = (s_name, c_name)
    ici = [(i, i + 1) for i in range(d - 1) if (i + 1) % c != 0]
    dcn = [(i, i + 1) for i in range(c - 1, d - 1, c)]
    recv = jax.lax.ppermute(tail, axes, perm=ici)
    if dcn:
        recv = recv + jax.lax.ppermute(tail, axes, perm=dcn)
    return recv


@functools.lru_cache(maxsize=None)
def _build_stft_hier(mesh_key, n_local: int, win: int, hop: int,
                     window_key: tuple, backend: str, ck: tuple = ()):
    from .hier import _MESHES2
    mesh = _MESHES2[mesh_key]
    s_name, c_name = mesh.axis_names
    s, c = mesh.devices.shape
    from ..ops.stft import _window_cache
    w = _window_cache[window_key]
    halo = max(0, win - hop)
    nf_local = n_local // hop
    idx = _frame_indices(nf_local, win, hop)

    def body(xs):                      # (n_local,) local shard
        if halo > 0:
            recv = _halo_recv_hier(xs[:halo], s_name, c_name, s, c)
            ext = jnp.concatenate([xs, recv])
        else:
            ext = xs
        frames = ext[idx] * w
        return _fft_planes(frames, jnp.zeros_like(frames), win, False,
                           backend, "float32")

    spec = P((s_name, c_name))
    f = shard_map(body, mesh, in_specs=spec,
                  out_specs=(P((s_name, c_name), None),) * 2)
    return jax.jit(f), NamedSharding(mesh, spec)


def stft_sharded_hier(signal, window, hop: int, mesh: Optional[Mesh] = None,
                      backend: str = "xla"):
    """Distributed STFT over a two-level (slice, chip) mesh: the signal's
    time axis shards (slice-major, chip-minor); interior halos ride
    intra-slice ICI ppermutes and each slice-boundary halo crosses the
    DCN exactly once (see module section comment). Values identical to
    :func:`stft_sharded` / the single-chip STFT."""
    require(hop >= 1, InvalidHopSizeError, f"hop must be >= 1, got {hop}")
    from .hier import _mesh2_key, make_hier_mesh
    mesh = mesh if mesh is not None else make_hier_mesh(
        1, len(jax.devices()))
    require(len(mesh.axis_names) == 2, InvalidValueError,
            "stft_sharded_hier needs a 2-D (slice, chip) mesh")
    d = mesh.devices.size
    w = _window_const(window)
    from ..ops.stft import _window_key
    x = jnp.asarray(signal, jnp.float32) if not isinstance(
        signal, jax.Array) else signal
    require(x.ndim == 1, InvalidValueError,
            "stft_sharded_hier takes a 1-D signal")
    n = x.shape[0]
    require(n % (d * hop) == 0, InvalidValueError,
            f"signal length {n} must be divisible by mesh*hop = {d * hop}")
    from ..config import trace_key
    fn, sharding = _build_stft_hier(_mesh2_key(mesh), n // d, w.shape[0],
                                    hop, _window_key(w), backend,
                                    trace_key())
    x = jax.device_put(x, sharding)
    return fn(x)


@functools.lru_cache(maxsize=None)
def _build_istft_hier(mesh_key, nf_local: int, win: int, hop: int,
                      window_key: tuple, backend: str, ck: tuple = ()):
    from .hier import _MESHES2
    mesh = _MESHES2[mesh_key]
    s_name, c_name = mesh.axis_names
    s, c = mesh.devices.shape
    from ..ops.stft import _window_cache
    w = _window_cache[window_key]
    halo = max(0, win - hop)
    n_local = nf_local * hop
    wsq = (w * w).astype(np.float32)

    def body(fr, fi):                  # (nf_local, win) each
        from ..ops.stft import _ola_add
        tr, _ = _fft_planes(fr, fi, win, True, backend, "float32")
        y = (tr / win) * w
        acc = _ola_add(y, win, hop, nf_local)
        norm = _ola_add(jnp.broadcast_to(wsq, (nf_local, win)), win, hop,
                        nf_local)
        if acc.shape[-1] < n_local + halo:
            pad = [(0, n_local + halo - acc.shape[-1])]
            acc = jnp.pad(acc, pad)
            norm = jnp.pad(norm, pad)
        if halo > 0:
            tail_acc = _halo_send_right_hier(acc[n_local:], s_name, c_name,
                                             s, c)
            tail_norm = _halo_send_right_hier(norm[n_local:], s_name,
                                              c_name, s, c)
            acc = acc[:n_local].at[:halo].add(tail_acc)
            norm = norm[:n_local].at[:halo].add(tail_norm)
        else:
            acc, norm = acc[:n_local], norm[:n_local]
        return jnp.where(norm > 1e-8,
                         acc / jnp.where(norm > 1e-8, norm, 1.0), acc)

    f = shard_map(body, mesh,
                  in_specs=(P((s_name, c_name), None),) * 2,
                  out_specs=P((s_name, c_name)))
    return jax.jit(f)


def istft_sharded_hier(fr, fi, window, hop: int,
                       mesh: Optional[Mesh] = None, backend: str = "xla"):
    """Distributed ISTFT over a two-level (slice, chip) mesh: frame axis
    sharded (slice-major, chip-minor); OLA tails ride ICI between
    in-slice neighbors and cross each slice boundary once over DCN.
    Returns the first F*hop samples (the push region), sharded."""
    require(hop >= 1, InvalidHopSizeError, f"hop must be >= 1, got {hop}")
    from .hier import _mesh2_key, make_hier_mesh
    mesh = mesh if mesh is not None else make_hier_mesh(
        1, len(jax.devices()))
    require(len(mesh.axis_names) == 2, InvalidValueError,
            "istft_sharded_hier needs a 2-D (slice, chip) mesh")
    d = mesh.devices.size
    w = _window_const(window)
    from ..ops.stft import _window_key
    fr = jnp.asarray(fr)
    fi = jnp.asarray(fi)
    require(fr.ndim == 2 and fr.shape == fi.shape, InvalidValueError,
            "istft_sharded_hier takes (F, win) planes")
    require(fr.shape[-1] == w.shape[0], InvalidValueError,
            f"frame length {fr.shape[-1]} != window length {w.shape[0]}")
    nf = fr.shape[0]
    require(nf % d == 0, InvalidValueError,
            f"frame count {nf} must be divisible by mesh size {d}")
    from ..config import trace_key
    fn = _build_istft_hier(_mesh2_key(mesh), nf // d, w.shape[0], hop,
                           _window_key(w), backend, trace_key())
    s_name, c_name = mesh.axis_names
    sharding = NamedSharding(mesh, P((s_name, c_name), None))
    fr = jax.device_put(fr, sharding)
    fi = jax.device_put(fi, sharding)
    return fn(fr, fi)
