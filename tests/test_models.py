"""SpectralNet flagship model: forward, grad/train step, checkpointing."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

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


# ---------------------------------------------------------------------------
# SpectralDenoiser: gradients through the synthesis (ISTFT) half
# ---------------------------------------------------------------------------

def test_denoiser_identity_passthrough(rng):
    """With the mask biased open at init, the pipeline is near-identity in
    the OLA-normalized interior."""
    from kofft_tpu.models import SpectralDenoiser
    model = SpectralDenoiser(win_len=128, hop=64)
    params = model.init(seed=0)
    # zero the output layer: mask is exactly sigmoid(b2) = sigmoid(2),
    # so the pipeline must reproduce a uniformly damped copy — pinning
    # ISTFT(mask * STFT(x)) inversion through the model path
    params = params._replace(w2=jnp.zeros_like(params.w2))
    x = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32))
    y = np.asarray(model.apply(params, x))
    interior = slice(128, -128)
    ref = np.asarray(x)[:, interior]
    got = y[:, interior]
    scale = 1.0 / (1.0 + np.exp(-2.0))          # sigmoid(2)
    resid = got - scale * ref
    assert np.abs(resid).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_denoiser_training_reduces_loss(rng):
    """Gradients flow through ISTFT overlap-add back to the mask MLP and
    actually optimize a maskable objective (tonal interferer occupying
    distinct spectral bins — the mask can null it)."""
    from kofft_tpu.models import SpectralDenoiser, denoiser_train_step
    from kofft_tpu.models.denoiser import loss_fn
    model = SpectralDenoiser(win_len=128, hop=64, hidden=32)
    params = model.init(seed=0)
    t = np.arange(2048)
    clean = jnp.asarray(
        np.sin(2 * np.pi * 4 * t / 128).astype(np.float32))[None, :]
    interf = jnp.asarray(
        (0.8 * np.sin(2 * np.pi * 37 * t / 128 + 0.7)
         ).astype(np.float32))[None, :]
    noisy = clean + interf
    l0 = float(loss_fn(model, params, noisy, clean))
    for _ in range(60):
        params, loss = denoiser_train_step(model, params, noisy, clean,
                                           lr=1.0)
    assert float(loss) < 0.3 * l0
