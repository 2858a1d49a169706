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
        pass
    try:
        # transports that refuse the direct complex transfer but can
        # still feed the array to a splitting executable
        re = np.asarray(jnp.real(x))
        im = np.asarray(jnp.imag(x))
        return re + 1j * im
    except jax.errors.JaxRuntimeError as e:
        # transports that can neither transfer NOR re-feed complex
        # buffers (tunneled single-chip attachments): the array is
        # unrecoverable once materialized on device. The library's own
        # APIs avoid creating such arrays there (they return host numpy
        # or planes); this arises only from user-built complex values.
        raise RuntimeError(
            "this transport can neither transfer nor re-feed complex "
            "device arrays; keep complex data as (re, im) planes (the "
            "*_split APIs) on this platform") from e
