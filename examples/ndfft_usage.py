"""N-D FFT usage, single-chip and mesh-sharded (reference
examples/ndfft_usage.rs analog + the distributed pencil path)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

import kofft_tpu as kt

rng = np.random.default_rng(0)
vol = (rng.standard_normal((32, 32, 32))
       + 1j * rng.standard_normal((32, 32, 32))).astype(np.complex64)

spec = kt.fft3(vol)
back = kt.asnumpy(kt.ifft3(spec))
print(f"3-D roundtrip max err: {np.abs(back - vol).max():.2e}")

# mesh-sharded pencil decomposition (all_to_all over ICI)
n_dev = len(jax.devices())
if n_dev > 1 and vol.shape[0] % n_dev == 0 and vol.shape[-1] % n_dev == 0:
    from kofft_tpu.parallel import fftn_sharded, make_mesh
    mesh = make_mesh(n_dev)
    yr, yi = fftn_sharded(np.ascontiguousarray(vol.real),
                          np.ascontiguousarray(vol.imag), mesh=mesh)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    print(f"sharded vs single-chip max err: "
          f"{np.abs(got - kt.asnumpy(spec)).max():.2e}")
else:
    print(f"({n_dev} device(s) — sharded path needs a divisible mesh)")
