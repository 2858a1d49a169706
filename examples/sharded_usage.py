"""Mesh-sharded transforms (reference examples/parallel_benchmark.rs
analog): distributed N-D FFT, distributed single long FFT, frame-sharded
STFT/ISTFT, and the auto dispatch gate — on whatever devices are present
(run with XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu for an 8-virtual-device mesh on one host)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# images whose sitecustomize pins a 1-chip platform at startup: honor a
# requested virtual CPU mesh via the config API (env alone is too late)
if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    jax.config.update("jax_platforms", "cpu")

import kofft_tpu as kt
from kofft_tpu.ops import window as W
from kofft_tpu.parallel import (fft_auto, fft_sharded, fftn_sharded,
                                istft_auto, make_mesh, should_shard,
                                stft_sharded)

d = len(jax.devices())
print(f"devices: {d} x {jax.default_backend()}")
rng = np.random.default_rng(0)

if d > 1:
    mesh = make_mesh(d)

    # distributed 3-D FFT: pencil decomposition over two all_to_alls
    shape = (d * 8, 16, d * 4)
    xr = rng.standard_normal(shape).astype(np.float32)
    yr, yi = fftn_sharded(xr, np.zeros_like(xr), mesh=mesh)
    ref = np.fft.fftn(xr.astype(np.complex128))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    print(f"fftn_sharded {shape}: max err "
          f"{np.abs(got - ref).max() / np.abs(ref).max():.2e}")

    # one long signal too big for a chip: distributed four-step
    n = d * d * 64
    zr, zi = fft_sharded(rng.standard_normal(n).astype(np.float32),
                         np.zeros(n, np.float32), mesh=mesh,
                         restore_layout=True)
    print(f"fft_sharded n={n}: output sharded over "
          f"{len(zr.sharding.device_set)} devices")

    # frame-sharded STFT with ppermute halo exchange
    win, hop = 64, 16
    sig = rng.standard_normal(d * 8 * hop).astype(np.float32)
    fr, fi = stft_sharded(sig, W.hann(win), hop, mesh=mesh)
    print(f"stft_sharded: frames {fr.shape} sharded over the mesh")

# auto dispatch: the points-per-chip gate decides single-chip vs sharded
# (the reference's Rayon threshold heuristic, src/fft.rs:244-307)
n = 1 << 12
print(f"should_shard({n} pts, {d} dev) -> {should_shard(n, d)}")
ar, ai = fft_auto(rng.standard_normal(n).astype(np.float32),
                  np.zeros(n, np.float32))
print(f"fft_auto: {np.asarray(ar).shape} on "
      f"{len(ar.sharding.device_set)} device(s)")
