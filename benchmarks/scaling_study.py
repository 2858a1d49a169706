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
    # --tpu opts into the real accelerator topology (a pod slice); the
    # default is the N-virtual-device CPU validation mesh. The platform
    # decision must NOT probe jax.default_backend() first: that call
    # initializes a backend and makes the cpu config update a silent
    # no-op — on a 1-chip attachment every "D-device" mesh then quietly
    # collapses to one device (found the hard way, r3).
    use_tpu = "--tpu" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--tpu"]
    max_dev = int(args[0]) if len(args) > 0 else 8
    log2_per_chip = int(args[1]) if len(args) > 1 else 18

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{max_dev}").strip()
    import jax
    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")
        if jax.default_backend() != "cpu":
            raise RuntimeError(
                f"jax resolved backend {jax.default_backend()!r}, not "
                f"'cpu' — a backend was initialized before main(); run in "
                f"a fresh process")
    if len(jax.devices()) < max_dev:
        raise RuntimeError(
            f"need {max_dev} devices, have {len(jax.devices())}")

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

    def fft1d_overlap_case(d):
        # the chunked comm/compute pipeline (overlap=4): on a pod the
        # collectives hide behind the per-chunk DFTs; on the virtual CPU
        # mesh this validates the program + the unchanged total volume
        n = (1 << log2_per_chip) * d
        xr = rng.standard_normal(n).astype(np.float32)
        xi = rng.standard_normal(n).astype(np.float32)
        mesh = make_mesh(d)
        return (lambda: fft_sharded(xr, xi, mesh=mesh, restore_layout=True,
                                    overlap=4), n)

    def fft1d_hier_case(d):
        # two-level (slice, chip) hierarchy on a (2, d/2) topology
        from kofft_tpu.parallel import fft_sharded_hier, make_hier_mesh
        n = (1 << log2_per_chip) * d
        xr = rng.standard_normal(n).astype(np.float32)
        xi = rng.standard_normal(n).astype(np.float32)
        mesh = make_hier_mesh(2, d // 2)
        return (lambda: fft_sharded_hier(xr, xi, mesh=mesh), n)

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

    print("--- overlap pipeline / hierarchy variants (D >= 4) ---")

    def sweep_from(name, run_for_d, ds):
        print(f"--- {name} ---")
        for d in [x for x in ds if x <= max_dev]:
            fn, pts = run_for_d(d)
            jax.block_until_ready(fn())
            t0 = time.perf_counter()
            for _ in range(5):
                jax.block_until_ready(fn())
            dt = (time.perf_counter() - t0) / 5
            print(f"D={d:2d}  {dt * 1e3:8.2f} ms  "
                  f"{pts / dt / 1e6:8.1f} Mpts/s")

    sweep_from("1-D FFT overlap=4 (chunked pipeline)", fft1d_overlap_case,
               (4, 8, 16))
    sweep_from("1-D FFT hierarchical (2, D/2) slice/chip", fft1d_hier_case,
               (4, 8, 16))

    def fft1d_hier_overlap_case(d):
        from kofft_tpu.parallel import fft_sharded_hier, make_hier_mesh
        n = (1 << log2_per_chip) * d
        xr = rng.standard_normal(n).astype(np.float32)
        xi = rng.standard_normal(n).astype(np.float32)
        mesh = make_hier_mesh(2, d // 2)
        return (lambda: fft_sharded_hier(xr, xi, mesh=mesh, overlap=2), n)

    sweep_from("1-D FFT hierarchical + overlap=2", fft1d_hier_overlap_case,
               (4, 8, 16))

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
