"""Pallas fused four-step kernel: interpret-mode parity on CPU.

The real-chip run is covered by bench.py / the verify drives; this pins the
kernel math (tiling, contractions, twiddle fusion, output transpose layout)
against the float64 oracle in the Pallas interpreter.
"""

import numpy as np
import pytest

from kofft_tpu.ops.dft import snr_db
from kofft_tpu.ops.pallas_kernels import (_pow2_split, fused_four_step_fft,
                                          fused_four_step_supported)


def test_supported_predicate():
    assert fused_four_step_supported(1 << 16)
    assert fused_four_step_supported(1 << 20)
    assert not fused_four_step_supported(1000)      # non-pow2
    assert not fused_four_step_supported(1 << 10)   # factors < 128
    assert not fused_four_step_supported(1 << 25)   # VMEM budget


def test_pow2_split_balance():
    assert _pow2_split(1 << 16) == (256, 256)
    assert _pow2_split(1 << 17) == (256, 512)
    assert _pow2_split(1 << 14) == (128, 128)


@pytest.mark.parametrize("n", [1 << 14, 1 << 15])
def test_kernel_parity_interpret(rng, n):
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    xr = np.ascontiguousarray(x.real)[None]
    xi = np.ascontiguousarray(x.imag)[None]
    import jax.numpy as jnp
    yr, yi = fused_four_step_fft(jnp.asarray(xr), jnp.asarray(xi), n,
                                 interpret=True)
    got = np.asarray(yr)[0] + 1j * np.asarray(yi)[0]
    ref = np.fft.fft(x.astype(np.complex128))
    assert snr_db(ref, got) > 100.0


def test_kernel_batch_interpret(rng):
    n = 1 << 14
    x = rng.standard_normal((3, n)).astype(np.float32)
    import jax.numpy as jnp
    yr, yi = fused_four_step_fft(jnp.asarray(x), jnp.zeros_like(x), n,
                                 interpret=True)
    ref = np.fft.fft(x.astype(np.float64))
    assert snr_db(ref, np.asarray(yr) + 1j * np.asarray(yi)) > 100.0


@pytest.mark.parametrize("n", [1 << 14, 1 << 15])
def test_multilevel_kernel_parity_interpret(rng, n):
    from kofft_tpu.ops.pallas_kernels import fused_multilevel_fft
    import jax.numpy as jnp
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    yr, yi = fused_multilevel_fft(
        jnp.asarray(np.ascontiguousarray(x.real)[None]),
        jnp.asarray(np.ascontiguousarray(x.imag)[None]), n, interpret=True)
    got = np.asarray(yr)[0] + 1j * np.asarray(yi)[0]
    assert snr_db(np.fft.fft(x.astype(np.complex128)), got) > 100.0


def test_multilevel_batch_interpret(rng):
    from kofft_tpu.ops.pallas_kernels import fused_multilevel_fft
    import jax.numpy as jnp
    n = 1 << 14
    x = rng.standard_normal((2, n)).astype(np.float32)
    yr, yi = fused_multilevel_fft(jnp.asarray(x), jnp.zeros_like(x), n,
                                  interpret=True)
    ref = np.fft.fft(x.astype(np.float64))
    assert snr_db(ref, np.asarray(yr) + 1j * np.asarray(yi)) > 100.0
