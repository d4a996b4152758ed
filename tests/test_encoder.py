"""Speaker encoder tests (reference model: tests/aux_tests/test_speaker_encoder.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.encoder.losses import AngleProtoLoss, GE2ELoss, SoftmaxAngleProtoLoss
from tts_tpu.encoder.model import LSTMSpeakerEncoder, ResNetSpeakerEncoder, SpeakerEncoder
from tts_tpu.encoder.configs import SpeakerEncoderConfig
from helpers import fast_init_model


def test_lstm_encoder_shapes():
    enc = LSTMSpeakerEncoder(input_dim=80, proj_dim=64, lstm_dim=128, num_lstm_layers=2)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 50, 80).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    d = enc.apply(params, x)
    assert d.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)


def test_resnet_encoder_shapes():
    enc = ResNetSpeakerEncoder(input_dim=64, proj_dim=128, layers=(1, 1, 1, 1), num_filters=(8, 8, 16, 16))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 60, 64).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    d = enc.apply(params, x)
    assert d.shape == (2, 128)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-4)


def test_ge2e_and_angleproto_losses():
    rng = np.random.RandomState(0)
    # well-separated speakers should give lower loss than shuffled ones
    centers = rng.randn(4, 1, 32) * 3
    tight = jnp.asarray((centers + 0.05 * rng.randn(4, 5, 32)).astype(np.float32))
    loose = jnp.asarray(rng.randn(4, 5, 32).astype(np.float32))

    for loss_cls in (GE2ELoss, AngleProtoLoss):
        loss = loss_cls()
        params = loss.init(jax.random.PRNGKey(0), tight)
        l_tight = float(loss.apply(params, tight))
        l_loose = float(loss.apply(params, loose))
        assert np.isfinite(l_tight) and np.isfinite(l_loose)
        assert l_tight < l_loose, loss_cls.__name__


def test_softmax_angleproto():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 3, 32).astype(np.float32))
    labels = jnp.asarray(np.repeat(np.arange(4), 3))
    loss = SoftmaxAngleProtoLoss(embedding_dim=32, n_speakers=4)
    params = loss.init(jax.random.PRNGKey(0), x, labels)
    val = float(loss.apply(params, x, labels))
    assert np.isfinite(val)


def test_sliding_window_embedding():
    cfg = SpeakerEncoderConfig()
    cfg.model_params = {"model_name": "lstm", "input_dim": 80, "proj_dim": 32, "lstm_dim": 32, "num_lstm_layers": 1}
    enc = SpeakerEncoder(cfg)
    fast_init_model(enc, jax.random.PRNGKey(0), attrs=('params',))
    wav = np.random.RandomState(0).randn(22050 * 4).astype(np.float32)  # 4s -> windows
    emb = enc.compute_embedding_from_wav(wav, num_frames=100)
    assert emb.shape == (32,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-5)
