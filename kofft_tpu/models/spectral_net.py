"""SpectralNet: a differentiable audio frontend + classifier head.

Pipeline (all on-device, one jitted graph):
    signal (B, N) -- STFT (frame gather + batched rfft planes)
                  -> magnitude (B, F, K)
                  -> learnable mel projection (K, M)   [tensor-shardable]
                  -> log -> DCT-II (cached cosine matmul)
                  -> mean over frames -> linear head (M, C)

Every stage is a kofft_tpu op, so grad/jit/shard_map coverage of the
engine is exercised end to end. Parameters are a plain pytree; training
uses optax.
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
from ..ops.cepstrum import mel_filterbank_matrix
from ..plan import tables
from ..ops.dct import _matrix as _dct_matrix


class SpectralNetParams(NamedTuple):
    mel: jax.Array     # (K, M) learnable filterbank, mel-initialized
    w_head: jax.Array  # (M, C)
    b_head: jax.Array  # (C,)


class SpectralNet:
    """Configuration + pure functions (init / apply)."""

    def __init__(self, win_len: int = 256, hop: int = 128,
                 n_mel: int = 32, n_classes: int = 8,
                 sample_rate: float = 16000.0):
        self.win_len = win_len
        self.hop = hop
        self.n_mel = n_mel
        self.n_classes = n_classes
        self.sample_rate = sample_rate
        self.n_bins = win_len // 2 + 1
        self.window = _window.hann(win_len)

    def init(self, seed: int = 0) -> SpectralNetParams:
        rng = np.random.default_rng(seed)
        mel0 = mel_filterbank_matrix(self.n_bins, self.sample_rate,
                                     self.n_mel)
        w = (rng.standard_normal((self.n_mel, self.n_classes))
             / np.sqrt(self.n_mel)).astype(np.float32)
        return SpectralNetParams(
            mel=jnp.asarray(mel0),
            w_head=jnp.asarray(w),
            b_head=jnp.zeros((self.n_classes,), jnp.float32))

    def apply(self, params: SpectralNetParams, signal):
        """signal (B, N) -> logits (B, C). Traceable/differentiable."""
        fr, fi = _stft.stft_split(signal, self.window, self.hop,
                                  onesided=True, backend="xla")
        mags = jnp.sqrt(fr * fr + fi * fi + 1e-12)       # (B, F, K)
        p = lax_precision()
        mel = jnp.einsum("bfk,km->bfm", mags, params.mel, precision=p)
        logmel = jnp.log(jnp.abs(mel) + 1e-6)
        dctm = _dct_matrix(2, self.n_mel, "float32")       # cached constant
        feats = jnp.einsum("bfm,mc->bfc", logmel, jnp.asarray(dctm),
                           precision=p)
        pooled = feats.mean(axis=1)                        # (B, M)
        return jnp.einsum("bm,mc->bc", pooled, params.w_head,
                          precision=p) + params.b_head


def loss_fn(model: SpectralNet, params: SpectralNetParams, signal, labels):
    logits = model.apply(params, signal)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, model.n_classes, dtype=logits.dtype)
    return -(onehot * logp).sum(axis=-1).mean()


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def train_step(model: SpectralNet, params: SpectralNetParams, signal,
               labels, lr: float = 1e-2):
    """One SGD step (optax-free inner loop so the step stays a pure
    pytree map; optax integration lives in training scripts)."""
    loss, grads = jax.value_and_grad(
        lambda p: loss_fn(model, p, signal, labels))(params)
    new = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    return new, loss
