"""Speaker encoder models (reference ``TTS/encoder/models/{lstm,resnet}.py``).

``ResNetSpeakerEncoder`` (SE-ResNet + attentive statistics pooling) is also
embedded in the XTTS HiFi decoder (``xtts/hifigan_decoder.py:421``).
Norms use ``norm_type='folded'`` (scale/shift, for converted torch
BatchNorm stats) or ``'group'`` for training from scratch.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.audio import jax_transforms as jt


class _Norm2d(nn.Module):
    channels: int
    norm_type: str = "group"

    @nn.compact
    def __call__(self, x):
        if self.norm_type == "folded":
            scale = self.param("scale", nn.initializers.ones, (self.channels,))
            shift = self.param("shift", nn.initializers.zeros, (self.channels,))
            return x * scale + shift
        return nn.GroupNorm(num_groups=min(8, self.channels))(x)


class SELayer(nn.Module):
    """Squeeze-and-excitation (reference ``resnet.py:8``)."""

    channel: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        y = jnp.mean(x, axis=(1, 2))  # [B, C]
        y = nn.relu(nn.Dense(self.channel // self.reduction, name="fc1")(y))
        y = nn.sigmoid(nn.Dense(self.channel, name="fc2")(y))
        return x * y[:, None, None, :]


class SEBasicBlock(nn.Module):
    """(reference ``resnet.py:26``)"""

    planes: int
    stride: Tuple[int, int] = (1, 1)
    downsample: bool = False
    norm_type: str = "group"

    @nn.compact
    def __call__(self, x):
        residual = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False, name="conv1")(x)
        # reference order is conv → relu → bn (resnet.py:43-45 / xtts
        # hifigan_decoder.py:373-375), not the usual conv → bn → relu
        out = _Norm2d(self.planes, self.norm_type, name="bn1")(nn.relu(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(out)
        out = _Norm2d(self.planes, self.norm_type, name="bn2")(out)
        out = SELayer(self.planes, name="se")(out)
        if self.downsample:
            residual = nn.Conv(
                self.planes, (1, 1), strides=self.stride, use_bias=False, name="downsample_conv"
            )(x)
            residual = _Norm2d(self.planes, self.norm_type, name="downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNetSpeakerEncoder(nn.Module):
    """SE-ResNet34 + attentive stats pooling → d-vector
    (reference ``resnet.py:59``)."""

    input_dim: int = 64
    proj_dim: int = 512
    layers: Sequence[int] = (3, 4, 6, 3)
    num_filters: Sequence[int] = (32, 64, 128, 256)
    encoder_type: str = "ASP"
    log_input: bool = False
    norm_type: str = "group"

    @nn.compact
    def __call__(self, x: jnp.ndarray, l2_norm: bool = True) -> jnp.ndarray:
        """x: ``[B, T, n_mels]`` mel features → ``[B, proj_dim]``."""
        if self.log_input:
            x = jnp.log(x + 1e-6)
        # instance norm over time per mel bin
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + 1e-5)
        x = x[:, :, :, None]  # [B, T, M, 1]

        x = nn.Conv(self.num_filters[0], (3, 3), padding=1, name="conv1")(x)
        # conv → relu → bn, matching the reference stem (see SEBasicBlock)
        x = _Norm2d(self.num_filters[0], self.norm_type, name="bn1")(nn.relu(x))
        for li, (n_blocks, planes) in enumerate(zip(self.layers, self.num_filters)):
            for bi in range(n_blocks):
                stride = (2, 2) if (li > 0 and bi == 0) else (1, 1)
                downsample = bi == 0 and (li > 0 or planes != self.num_filters[0])
                x = SEBasicBlock(
                    planes, stride, downsample, self.norm_type, name=f"layer{li + 1}_{bi}"
                )(x)

        B, T, M, C = x.shape
        # flatten chan×freq per frame, channel-major to match the reference's
        # ``x.reshape(B, -1, T)`` on [B, C, M, T] (feature index = c*M + m)
        x = jnp.swapaxes(x, 2, 3).reshape(B, T, C * M)
        # attentive statistics pooling (reference :104)
        attn_ch = 128
        w = nn.Conv(attn_ch, (1,), name="attn_conv1")(x)
        w = nn.relu(w)
        w = _Norm2d(attn_ch, self.norm_type, name="attn_bn")(w)
        w = nn.Conv(M * C, (1,), name="attn_conv2")(w)
        w = nn.softmax(w, axis=1)
        mu = jnp.sum(x * w, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum((x**2) * w, axis=1) - mu**2, min=1e-5))
        if self.encoder_type == "ASP":
            stats = jnp.concatenate([mu, sg], axis=-1)
        else:  # SAP
            stats = mu
        out = nn.Dense(self.proj_dim, name="fc")(stats)
        if l2_norm:
            out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-8)
        return out


class LSTMSpeakerEncoder(nn.Module):
    """Stacked LSTM-with-projection d-vector net (reference ``lstm.py:26``)."""

    input_dim: int = 80
    proj_dim: int = 256
    lstm_dim: int = 768
    num_lstm_layers: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, l2_norm: bool = True) -> jnp.ndarray:
        """x: ``[B, T, input_dim]`` mels → ``[B, proj_dim]``."""
        # instance norm over time per mel bin (reference lstm.py:60,92)
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + 1e-5)
        for i in range(self.num_lstm_layers):
            # name the CELL (naming the nn.RNN wrapper leaves params as
            # OptimizedLSTMCell_N in this scope)
            x = nn.RNN(nn.OptimizedLSTMCell(self.lstm_dim, name=f"lstm_{i}"))(x)
            x = nn.Dense(self.proj_dim, use_bias=False, name=f"proj_{i}")(x)
        d = x[:, -1]  # last frame
        if l2_norm:
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        return d


class SpeakerEncoder:
    """Host wrapper: config → module/params; sliding-window embedding
    (reference ``base_encoder.py:68`` compute_embedding)."""

    def __init__(self, config, params=None):
        self.config = config
        model_params = dict(getattr(config, "model_params", {}) or {})
        model_name = model_params.pop("model_name", "resnet")
        if model_name == "lstm":
            model_params.pop("use_lstm_with_projection", None)
            self.module = LSTMSpeakerEncoder(
                input_dim=model_params.get("input_dim", 80),
                proj_dim=model_params.get("proj_dim", 256),
                lstm_dim=model_params.get("lstm_dim", 768),
                num_lstm_layers=model_params.get("num_lstm_layers", 3),
            )
        else:
            self.module = ResNetSpeakerEncoder(
                input_dim=model_params.get("input_dim", 64),
                proj_dim=model_params.get("proj_dim", 512),
                log_input=model_params.get("log_input", False),
            )
        self.params = params
        self._mel_kw = None

    def init_params(self, rng, t: int = 64):
        dim = self.module.input_dim
        self.params = self.module.init(rng, jnp.zeros((1, t, dim)))
        return self.params

    def _mel(self, wav: np.ndarray) -> jnp.ndarray:
        audio = self.config.audio
        mel = jt.wav_to_mel(
            jnp.asarray(wav)[None],
            n_fft=audio["fft_size"] if isinstance(audio, dict) else audio.fft_size,
            num_mels=self.module.input_dim,
            sample_rate=audio["sample_rate"] if isinstance(audio, dict) else audio.sample_rate,
            hop_length=audio["hop_length"] if isinstance(audio, dict) else audio.hop_length,
            win_length=audio["win_length"] if isinstance(audio, dict) else audio.win_length,
        )
        return jnp.swapaxes(mel, 1, 2)  # [1, T, M]

    def compute_embedding_from_wav(self, wav: np.ndarray, num_frames: int = 250) -> np.ndarray:
        mel = self._mel(wav)
        T = mel.shape[1]
        if T <= num_frames:
            emb = self.module.apply(self.params, mel)
            return np.asarray(emb[0])
        # sliding windows, averaged (reference base_encoder.py:68)
        offsets = list(range(0, T - num_frames + 1, num_frames // 2)) or [0]
        embs = [
            self.module.apply(self.params, mel[:, o : o + num_frames]) for o in offsets
        ]
        emb = jnp.mean(jnp.concatenate(embs, axis=0), axis=0)
        emb = emb / jnp.maximum(jnp.linalg.norm(emb), 1e-8)
        return np.asarray(emb)


def load_speaker_encoder(model_path: str, config_path: str):
    """Load an encoder checkpoint + config (reference ``managers.py:315``)."""
    import json

    from tts_tpu.audio.processor import AudioProcessor
    from tts_tpu.utils.io import load_checkpoint

    params, config_dict, _ = load_checkpoint(model_path)
    if config_path:
        with open(config_path) as f:
            config_dict = json.load(f)
    from tts_tpu.encoder.configs import SpeakerEncoderConfig

    config = SpeakerEncoderConfig.from_dict(config_dict)
    enc = SpeakerEncoder(config, params=params)
    ap = AudioProcessor.init_from_config(config.audio, verbose=False)
    return enc, ap
