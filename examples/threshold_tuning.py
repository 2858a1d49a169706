"""Shard-threshold inspection and calibration (reference
examples/print_threshold.rs analog): show the env/runtime-configured
points-per-chip gate, flip it with the runtime setter, and run the
measured calibration probe on the live mesh."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    jax.config.update("jax_platforms", "cpu")

from kofft_tpu.config import (get_config, set_shard_threshold)
from kofft_tpu.parallel import calibrate_shard_threshold, should_shard

d = len(jax.devices())
cfg = get_config()
print(f"devices: {d}; shard_threshold = {cfg.shard_threshold} points/chip "
      f"(KOFFT_TPU_SHARD_THRESHOLD={os.environ.get('KOFFT_TPU_SHARD_THRESHOLD', '<unset>')})")

for n in (1 << 14, 1 << 18, 1 << 22):
    print(f"  n={n:>9}: should_shard -> {should_shard(n, d)}")

set_shard_threshold(1 << 20)
print(f"after set_shard_threshold(2^20): {get_config().shard_threshold}")
set_shard_threshold(None)   # 0/None reverts to the env/heuristic default
print(f"after revert: {get_config().shard_threshold}")

if d > 1:
    t = calibrate_shard_threshold(probe_points=1 << 14, apply=False)
    print(f"measured calibration (probe 2^14, apply=False): {t} points/chip")
