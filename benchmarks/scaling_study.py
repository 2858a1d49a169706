"""Weak-scaling study for the sharded 3-D NDFFT (BASELINE config #5).

Runs the pencil-decomposed FFT over 1..N virtual devices with the per-chip
volume held constant and reports scaling efficiency. On the CPU virtual
mesh this validates the collective program and the bookkeeping (the real
ICI numbers require a pod slice; the all-to-all volume per chip is
(D-1)/D * local_bytes, constant in D on a torus — see ARCHITECTURE.md §2).

Usage:
    python benchmarks/scaling_study.py [max_devices] [points_per_chip_log2]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    max_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    log2_per_chip = int(sys.argv[2]) if len(sys.argv) > 2 else 18

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{max_dev}").strip()
    import jax
    if jax.default_backend() != "tpu" or len(jax.devices()) < max_dev:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from kofft_tpu.parallel import fftn_sharded, make_mesh

    if jax.default_backend() == "cpu":
        print("NOTE: virtual CPU devices share one host — weak-scaling "
              "efficiency here is host-bound and only validates the "
              "collective program; real efficiency needs a pod slice.")
    from kofft_tpu.parallel import fft_sharded, stft_sharded
    from kofft_tpu.ops import window as W

    rng = np.random.default_rng(0)

    def sweep(name, run_for_d):
        print(f"--- {name} (weak scaling, constant per-chip volume) ---")
        results = []
        for d in [x for x in (1, 2, 4, 8, 16) if x <= max_dev]:
            fn, pts = run_for_d(d)
            jax.block_until_ready(fn())          # warm/compile
            t0 = time.perf_counter()
            for _ in range(5):
                jax.block_until_ready(fn())
            dt = (time.perf_counter() - t0) / 5
            results.append((d, dt, pts / dt))
            base = results[0][2]
            eff = (pts / dt) / (base * d)
            print(f"D={d:2d}  {dt * 1e3:8.2f} ms  {pts / dt / 1e6:8.1f} "
                  f"Mpts/s  eff {eff:5.1%}")

    base_side = 1 << (log2_per_chip // 3)

    def ndfft_case(d):
        shape = (base_side * d, base_side, base_side)
        xr = rng.standard_normal(shape).astype(np.float32)
        xi = rng.standard_normal(shape).astype(np.float32)
        mesh = make_mesh(d)
        return (lambda: fftn_sharded(xr, xi, mesh=mesh),
                int(np.prod(shape)))

    def fft1d_case(d):
        n = (1 << log2_per_chip) * d
        xr = rng.standard_normal(n).astype(np.float32)
        xi = rng.standard_normal(n).astype(np.float32)
        mesh = make_mesh(d)
        return (lambda: fft_sharded(xr, xi, mesh=mesh), n)

    def stft_case(d):
        hop, win = 256, 1024
        n = (1 << log2_per_chip) * d
        n -= n % (d * hop)
        sig = rng.standard_normal(n).astype(np.float32)
        w = W.hann(win)
        mesh = make_mesh(d)
        return (lambda: stft_sharded(sig, w, hop, mesh=mesh), n)

    sweep("3-D NDFFT (all_to_all pencil)", ndfft_case)
    sweep("1-D FFT (distributed four-step)", fft1d_case)
    sweep("STFT (ppermute halo)", stft_case)

    # machine-checked invariant: the compiled 1-D program moves EXACTLY
    # the canonical all_to_all volume per chip ((D-1)/D x local bytes per
    # step, constant in weak scaling) — the checkable proxy for the
    # >= 85% efficiency target absent a pod (also pinned in CI,
    # tests/test_parallel.py::test_fft_sharded_comm_volume_invariant)
    from kofft_tpu.parallel.validate import check_fft_sharded_comm_volume
    print("--- comm-volume audit (compiled HLO vs canonical) ---")
    for d in [x for x in (2, 4, 8) if x <= max_dev]:
        rep = check_fft_sharded_comm_volume((1 << log2_per_chip) * d,
                                            make_mesh(d))
        print(f"D={d}: local a2a {rep['local_a2a_bytes']} B, cross-chip "
              f"{rep['cross_chip_bytes']} B per chip — matches canonical")


if __name__ == "__main__":
    main()
