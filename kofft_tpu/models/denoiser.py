"""SpectralDenoiser: a differentiable analysis–mask–synthesis pipeline.

Pipeline (all on-device, one jitted graph):
    noisy (B, N) -- STFT (two-sided planes)
                 -> log-magnitude features (B, F, K)
                 -> 2-layer MLP -> sigmoid mask (B, F, K)
                 -> mask * spectrum (both planes)
                 -> ISTFT (gather-free overlap-add) -> denoised (B, N)

Where SpectralNet exercises the *analysis* half of the engine under
grad/jit, this exercises the *synthesis* half: gradients flow through the
inverse FFT and the overlap-add back to the mask parameters — the
production speech-enhancement topology (noise suppression by spectral
masking).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import lax_precision
from ..ops import stft as _stft
from ..ops import window as _window


class SpectralDenoiserParams(NamedTuple):
    w1: jax.Array  # (K, H)
    b1: jax.Array  # (H,)
    w2: jax.Array  # (H, K)
    b2: jax.Array  # (K,)


class SpectralDenoiser:
    """Configuration + pure functions (init / apply)."""

    def __init__(self, win_len: int = 256, hop: int = 128,
                 hidden: int = 64):
        self.win_len = win_len
        self.hop = hop
        self.hidden = hidden
        self.window = _window.hann(win_len)

    def init(self, seed: int = 0) -> SpectralDenoiserParams:
        rng = np.random.default_rng(seed)
        k = self.win_len
        h = self.hidden
        w1 = (rng.standard_normal((k, h)) / np.sqrt(k)).astype(np.float32)
        return SpectralDenoiserParams(
            w1=jnp.asarray(w1), b1=jnp.zeros((h,), jnp.float32),
            # zero-init the output layer (gating init): the mask starts
            # exactly at sigmoid(b2) and the first gradients shape it
            w2=jnp.zeros((h, k), jnp.float32),
            # bias the mask open at init so the identity map is nearby
            b2=jnp.full((k,), 2.0, jnp.float32))

    def apply(self, params: SpectralDenoiserParams, noisy):
        """noisy (B, N) -> denoised (B, N). Traceable/differentiable."""
        n = noisy.shape[-1]
        fr, fi = _stft.stft_split(noisy, self.window, self.hop,
                                  onesided=False)
        # the 1e-3 floor also bounds d(log)/d(power) <= 1e3: near-empty
        # bins otherwise produce exploding mask-MLP gradients; the 0.1
        # scale keeps features O(1) so the loss surface is trainable
        logmag = 0.1 * jnp.log(fr * fr + fi * fi + 1e-3)  # (B, F, K)
        p = lax_precision()
        hdn = jax.nn.relu(
            jnp.einsum("bfk,kh->bfh", logmag, params.w1, precision=p)
            + params.b1)
        mask = jax.nn.sigmoid(
            jnp.einsum("bfh,hk->bfk", hdn, params.w2, precision=p)
            + params.b2)                                  # (B, F, K)
        return _stft.istft_split(fr * mask, fi * mask, self.window,
                                 self.hop, length=n)


def loss_fn(model: SpectralDenoiser, params: SpectralDenoiserParams,
            noisy, clean):
    """MSE over the OLA-interior. The first/last window of a masked ISTFT
    is ill-conditioned by construction: the overlap-add norm goes to zero
    at the signal edges while the masked content no longer carries the
    matching window shape, so the 1/norm division amplifies edge residual
    by up to 1/w(1)^2 (~1.7e5 for a 128-point Hann). Every spectral-
    masking system trains on the interior (or pads); scoring the edges
    would make the gradient edge-dominated and stall learning."""
    from ..errors import InvalidValueError, require
    require(noisy.shape[-1] > 2 * model.win_len, InvalidValueError,
            f"denoiser loss needs signals longer than 2*win_len = "
            f"{2 * model.win_len} (the scored OLA interior would be "
            f"empty, yielding a silent NaN loss)")
    out = model.apply(params, noisy)
    w = model.win_len
    return jnp.mean((out[..., w:-w] - clean[..., w:-w]) ** 2)


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def train_step(model: SpectralDenoiser, params: SpectralDenoiserParams,
               noisy, clean, lr: float = 1e-2):
    loss, grads = jax.value_and_grad(
        lambda p: loss_fn(model, p, noisy, clean))(params)
    new = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    return new, loss
