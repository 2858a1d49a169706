"""Host<->device transfer helpers.

Some TPU transports (e.g. tunneled single-chip dev attachments) cannot move
complex dtypes across the host boundary at all; device-side complex compute
is fine. ``asnumpy`` downloads any array, splitting complex values into f32
planes on device and recombining on host when a direct transfer fails.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def asnumpy(x) -> np.ndarray:
    """Download a jax array to host numpy, complex-transfer-safe."""
    if isinstance(x, np.ndarray):
        return x
    x = jnp.asarray(x)
    if not jnp.iscomplexobj(x):
        return np.asarray(x)
    try:
        return np.asarray(x)
    except jax.errors.JaxRuntimeError:
        re = np.asarray(jnp.real(x))
        im = np.asarray(jnp.imag(x))
        return re + 1j * im
