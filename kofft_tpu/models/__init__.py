"""kofft_tpu.models — differentiable spectral pipelines.

The reference is a DSP library with no model zoo; the flagship "model"
here is the framework's showcase workload: a differentiable spectral
frontend (STFT -> learnable mel filterbank -> log -> DCT -> linear head)
whose training step exercises the full engine under jit, grad, and mesh
sharding (data-parallel batch axis + tensor-parallel mel/feature axis).
"""

from .spectral_net import SpectralNet, train_step  # noqa: F401
