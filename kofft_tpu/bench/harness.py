"""Timing + JSON-history benchmark harness.

Measurement methodology: some TPU attachments (tunneled relays) report
async completion before execution finishes, making ``block_until_ready``
loops meaningless. ``timeit_chained`` therefore builds a *data-dependency
chain* of ``iters`` applications of the op inside ONE executable
(``lax.fori_loop``) and forces a scalar reduction transfer at the end; the
chip cannot skip or overlap the chained work, so wall-clock / iters is a
true per-op time. (The reference's criterion harness plays the same role,
``bench_fft.rs:106-297``.)
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def timeit_chained(fn: Callable, operand, iters: int = 20,
                   warmup: int = 2) -> float:
    """Per-op seconds for ``fn(pytree) -> pytree`` of identical structure
    and shapes/dtypes, chained ``iters`` times through one executable."""
    @jax.jit
    def chained(a):
        return jax.lax.fori_loop(0, iters, lambda _, acc: fn(acc), a)

    @jax.jit
    def reduce(t):
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(t))

    def run(a):
        # scalar reduction transfer forces true completion
        return float(np.asarray(reduce(chained(a))))

    for _ in range(warmup):
        run(operand)
    t0 = time.perf_counter()
    run(operand)
    dt = time.perf_counter() - t0
    return dt / iters


@dataclasses.dataclass
class BenchRecord:
    """Schema mirrors the reference BenchRecord (``bench_fft.rs:70-101``)
    with chip/topology fields added (SURVEY.md §5.5)."""
    library: str
    transform: str
    size: int
    mode: str
    time_per_op_ns: float
    ops_per_sec: float
    platform: str = ""
    n_devices: int = 1
    prev_time_per_op_ns: Optional[float] = None
    change_vs_prev: Optional[float] = None
    best: bool = False

    def to_dict(self):
        return dataclasses.asdict(self)


def run_history(records: list[BenchRecord],
                out_dir: str | Path = "benchmarks") -> dict:
    """Write latest.json, rotating the old latest to previous.json and
    computing change_vs_prev per (library, transform, size, mode) — the
    reference's JSON-history workflow (``bench_fft.rs:69-103``, ``:439``)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    latest_p = out / "latest.json"
    prev_p = out / "previous.json"
    prev_map = {}
    if latest_p.exists():
        old = json.loads(latest_p.read_text())
        prev_p.write_text(json.dumps(old, indent=1))
        for r in old.get("records", []):
            key = (r["library"], r["transform"], r["size"], r["mode"])
            prev_map[key] = r["time_per_op_ns"]
    for r in records:
        key = (r.library, r.transform, r.size, r.mode)
        if key in prev_map:
            r.prev_time_per_op_ns = prev_map[key]
            r.change_vs_prev = (r.time_per_op_ns - prev_map[key]) / prev_map[key]
    doc = {
        "environment": {
            "platform": jax.default_backend(),
            "devices": [str(d) for d in jax.devices()],
            "jax_version": jax.__version__,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        },
        "records": [r.to_dict() for r in records],
    }
    latest_p.write_text(json.dumps(doc, indent=1))
    return doc
