"""SpectralNet flagship model: forward, grad/train step, checkpointing."""

import numpy as np
import pytest
import jax

from kofft_tpu.models import SpectralNet, train_step
from kofft_tpu.models.checkpoint import load_params, save_params


@pytest.fixture(scope="module")
def model():
    return SpectralNet(win_len=64, hop=32, n_mel=8, n_classes=4)


def test_forward_shape(model, rng):
    params = model.init(0)
    x = rng.standard_normal((3, 512)).astype(np.float32)
    logits = np.asarray(model.apply(params, x))
    assert logits.shape == (3, 4)
    assert np.all(np.isfinite(logits))


def test_train_step_reduces_loss(model, rng):
    params = model.init(0)
    x = rng.standard_normal((8, 512)).astype(np.float32)
    y = rng.integers(0, 4, 8).astype(np.int32)
    losses = []
    for _ in range(20):
        params, loss = train_step(model, params, x, y, 1e-3)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])


def test_gradients_flow_through_stft(model, rng):
    """The STFT frontend is differentiable end to end."""
    params = model.init(0)
    x = rng.standard_normal((2, 512)).astype(np.float32)

    def loss_wrt_input(xx):
        return model.apply(params, xx).sum()

    g = np.asarray(jax.grad(loss_wrt_input)(x))
    assert g.shape == x.shape
    assert np.abs(g).max() > 0


def test_checkpoint_roundtrip(model, tmp_path, rng):
    params = model.init(3)
    p = tmp_path / "ckpt.npz"
    save_params(p, params)
    loaded = load_params(p)
    for a, b in zip(params, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
