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
