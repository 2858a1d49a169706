"""Observability helpers: profiler traces + persistent compile cache.

SURVEY.md §5.1/§5.4: the reference's performance observation is its
criterion harness; its only persistent state is reconstructible planner
caches. The TPU-native equivalents are jax.profiler traces and the XLA
persistent compilation cache (so warm processes skip the 20-40 s first
compile — the analog of the reference's precomputed-twiddles build flag).
"""

from __future__ import annotations

import contextlib
from pathlib import Path


def enable_compilation_cache(path: str | Path = "~/.cache/kofft_tpu_xla"
                             ) -> str:
    """Turn on the persistent XLA compilation cache at ``path``."""
    import jax
    p = str(Path(path).expanduser())
    Path(p).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return p


def prewarm(sizes, batch_shape: tuple = (), rfft_sizes=(),
            ndfft_shapes=()):
    """Pre-build tables and compile executables for the given FFT sizes
    (the analog of the reference's compile-time twiddle embedding,
    ``build.rs:6-95``): after ``prewarm``, first real calls are cache hits.
    Combine with :func:`enable_compilation_cache` to persist across
    processes.

    Goes through the PUBLIC entry points so it populates exactly the
    executable caches a real call will hit (the jitted-entry caches key
    on config.trace_key() and on the complex-vs-planes calling
    convention; warming internal entries under different keys compiles
    executables no real call ever uses)."""
    import jax
    import jax.numpy as jnp
    from .. import fft, ifft, fft_split, ifft_split, rfft_split

    import numpy as np

    for n in sizes:
        z = jnp.zeros((*batch_shape, n), jnp.float32)
        jax.block_until_ready(fft_split(z, z))
        jax.block_until_ready(ifft_split(z, z))
        from ..ops.fft import complex_io_supported
        if complex_io_supported():
            # the complex-object path has its own jitted entry
            zc = jnp.zeros((*batch_shape, n), jnp.complex64)
            jax.block_until_ready(fft(zc))
            jax.block_until_ready(ifft(zc))
        else:
            # complex-IO-banned transports (axon): real eager calls route
            # through the DONATING planes entry (host-numpy uploads are
            # framework-owned) — warm that executable too, with numpy
            # input so the dispatch takes the same path a user's will
            zn = np.zeros((*batch_shape, n), np.float32)
            ifft(np.asarray(fft(zn)))
    for n in rfft_sizes:
        z = jnp.zeros((*batch_shape, n), jnp.float32)
        jax.block_until_ready(rfft_split(z))
    for shape in ndfft_shapes:
        # worth warming ahead of time: the fused one-call N-D kernel's
        # Mosaic compile runs ~245 s cold at 128^3 (54 HIGHEST MXU loop
        # nests); with enable_compilation_cache it is paid once per
        # machine
        from ..ops.ndfft import fftn_split
        z = jnp.zeros(tuple(shape), jnp.float32)
        yr, yi = fftn_split(z, z)
        jax.block_until_ready(fftn_split(yr, yi, inverse=True))


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/kofft_tpu_trace"):
    """jax.profiler trace context: ``with trace("/tmp/t"): run()``;
    inspect with TensorBoard / xprof."""
    import jax
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
