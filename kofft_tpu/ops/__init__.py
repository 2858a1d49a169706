"""kofft_tpu.ops — transform kernels and compositions."""

from .fft import fft, ifft, fft_batch, ifft_batch, resolve_backend  # noqa: F401
from .rfft import rfft, irfft, rfft_split, irfft_split  # noqa: F401
from . import window  # noqa: F401
