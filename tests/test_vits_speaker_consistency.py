"""Speaker-consistency loss (YourTTS SCL, reference ``vits.py:754,1078-1095``
and ``losses.py`` cosine term): a frozen speaker encoder embeds real and
generated segments inside the VITS train step."""

import jax
import numpy as np
import pytest

from tts_tpu.encoder.configs import SpeakerEncoderConfig
from tts_tpu.encoder.model import SpeakerEncoder
from tts_tpu.models.vits import Vits, VitsArgs, VitsConfig
from tts_tpu.models.vits.train import create_train_state, make_train_step
from helpers import fast_init_model, fast_vits_train_state


def _tiny_scl_vits():
    args = VitsArgs(
        num_chars=40,
        out_channels=65,
        spec_segment_size=8,
        hidden_channels=16,
        hidden_channels_ffn_text_encoder=32,
        num_layers_text_encoder=1,
        num_layers_posterior_encoder=1,
        num_layers_flow=1,
        upsample_rates_decoder=[4, 4],
        upsample_kernel_sizes_decoder=[8, 8],
        upsample_initial_channel_decoder=32,
        resblock_kernel_sizes_decoder=[3],
        resblock_dilation_sizes_decoder=[[1, 3]],
        periods_multi_period_discriminator=[2],
        use_speaker_encoder_as_loss=True,
    )
    cfg = VitsConfig(model_args=args)
    cfg.audio.fft_size = 128
    cfg.audio.win_length = 128
    cfg.audio.hop_length = 16
    cfg.audio.num_mels = 20
    model = Vits(cfg)

    enc_cfg = SpeakerEncoderConfig()
    enc_cfg.model_params = {"model_name": "lstm", "input_dim": 20, "proj_dim": 16,
                            "lstm_dim": 32, "num_lstm_layers": 1}
    enc_cfg.audio.fft_size = 128
    enc_cfg.audio.win_length = 128
    enc_cfg.audio.hop_length = 16
    enc_cfg.audio.num_mels = 20
    enc = SpeakerEncoder(enc_cfg)
    fast_init_model(enc, jax.random.PRNGKey(7), t=8, attrs=('params',))
    holder = type("_SM", (), {})()
    holder.encoder = enc
    model.speaker_manager = holder
    return model, cfg


@pytest.mark.slow
def test_scl_in_train_step_metrics():
    model, cfg = _tiny_scl_vits()
    state = fast_vits_train_state(model, cfg, jax.random.PRNGKey(0))
    step, _, _ = make_train_step(model, cfg)
    B, T_de = 2, 16
    rng = np.random.RandomState(0)
    batch = {
        "text_input": rng.randint(0, 40, (B, 9)).astype(np.int32),
        "text_lengths": np.full((B,), 9, np.int32),
        "spec": np.abs(rng.randn(B, T_de, 65)).astype(np.float32),
        "spec_lengths": np.full((B,), T_de, np.int32),
        "waveform": (0.1 * rng.randn(B, T_de * 16, 1)).astype(np.float32),
    }
    state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    assert "loss_spk_enc" in metrics
    spk = float(metrics["loss_spk_enc"])
    assert np.isfinite(spk)
    assert -1.0 <= spk <= 1.0  # -mean(cosine) with alpha=1
    assert np.isfinite(float(metrics["loss"]))


def test_scl_requires_encoder():
    model, cfg = _tiny_scl_vits()
    model.speaker_manager = None
    with pytest.raises(ValueError, match="speaker encoder"):
        make_train_step(model, cfg)
