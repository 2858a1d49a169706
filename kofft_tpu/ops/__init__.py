"""kofft_tpu.ops — transform submodules.

Function-level API is re-exported at the package top level
(``kofft_tpu.fft`` etc.); this namespace keeps the submodules themselves
(``kofft_tpu.ops.stft`` is the module, ``kofft_tpu.stft`` the function).
"""

from . import (bluestein, cepstrum, czt, dct, dft, dst, fft,  # noqa: F401
               goertzel, hartley, hilbert, ndfft, rfft, stft, wavelet,
               window)
