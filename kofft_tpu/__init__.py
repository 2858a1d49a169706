"""kofft-tpu: a TPU-native spectral transform framework.

Brand-new JAX/XLA/Pallas implementation of the capability surface of the
reference DSP library (okian/kofft): complex FFT (matmul-DFT + four-step +
Bluestein engine on the MXU), real FFT, N-D FFT (single-chip and
mesh-sharded), DCT/DST I-IV, Hartley, Hilbert, cepstrum/MFCC, Goertzel, CZT,
wavelets, windows, STFT/ISTFT (batch, streaming, sharded), spectrograms and
tooling. See SURVEY.md for the layer map this implements.
"""

from .config import (get_config, set_backend, set_dft_cutoff,  # noqa: F401
                     set_precision, set_shard_threshold)
from .errors import (KofftError, EmptyInputError,  # noqa: F401
                     MismatchedLengthsError, InvalidStrideError,
                     InvalidHopSizeError, InvalidValueError)
from .ops.fft import (fft, ifft, fft_batch, ifft_batch,  # noqa: F401
                      fft_split, ifft_split)
from .ops.rfft import rfft, irfft, rfft_split, irfft_split  # noqa: F401
from .ops import window  # noqa: F401
from .utils.transfer import asnumpy  # noqa: F401

__version__ = "0.1.0"
