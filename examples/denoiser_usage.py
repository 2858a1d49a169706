"""Train the SpectralDenoiser on a tonal-interference task.

The analysis-mask-synthesis topology (STFT -> mask MLP -> ISTFT) with
gradients flowing through the inverse transform and the overlap-add —
the production speech-enhancement shape, on a synthetic task where the
ideal mask simply nulls the interferer's bins.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from kofft_tpu.models import SpectralDenoiser, denoiser_train_step
from kofft_tpu.models.denoiser import loss_fn

model = SpectralDenoiser(win_len=256, hop=128, hidden=64)
params = model.init(seed=0)

t = np.arange(16384)
clean = jnp.asarray(
    np.stack([np.sin(2 * np.pi * 9 * t / 256),
              np.sign(np.sin(2 * np.pi * 5 * t / 256))]).astype(np.float32))
interf = jnp.asarray(
    (0.8 * np.sin(2 * np.pi * 73 * t / 256 + 0.7)).astype(np.float32))
noisy = clean + interf

l0 = float(loss_fn(model, params, noisy, clean))
for step in range(60):
    params, loss = denoiser_train_step(model, params, noisy, clean, lr=1.0)
    if step % 15 == 0:
        print(f"step {step:3d}: loss {float(loss):.5f}")

out = np.asarray(model.apply(params, noisy))
w = model.win_len
resid = out[:, w:-w] - np.asarray(clean)[:, w:-w]
print(f"final loss {float(loss):.5f} (from {l0:.5f}); "
      f"interior residual RMS {np.sqrt((resid ** 2).mean()):.5f}")
