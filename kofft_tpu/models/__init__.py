"""kofft_tpu.models — differentiable spectral pipelines.

The reference is a DSP library with no model zoo; the models here are the
framework's showcase workloads: SpectralNet, a differentiable spectral
frontend (STFT -> learnable mel filterbank -> log -> DCT -> linear head)
whose training step exercises the analysis engine under jit, grad, and
mesh sharding (data-parallel batch axis + tensor-parallel mel/feature
axis); and SpectralDenoiser, an analysis-mask-synthesis enhancer whose
gradients flow through the inverse FFT and the overlap-add.
"""

from .spectral_net import SpectralNet, train_step  # noqa: F401
from .denoiser import SpectralDenoiser  # noqa: F401
from .denoiser import train_step as denoiser_train_step  # noqa: F401
