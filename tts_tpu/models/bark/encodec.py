"""Flax EnCodec decoder — RVQ codebook decode + causal SEANet decoder.

Bark's waveform stage (reference ``bark/inference_funcs.py:599 codec_decode``
→ the external ``encodec`` pip package / HF ``EncodecModel``).  This is a
TPU-native decoder half of the 24 kHz EnCodec (Défossez et al., 2022,
arXiv:2210.13438): 8×1024 residual codebooks → summed embeddings → causal
conv stack (weight-norm folded) with 2-layer LSTM and (8, 5, 4, 2)
transposed-conv upsampling to 24 kHz mono.

Layer names mirror the HF ``EncodecDecoder.layers`` ModuleList indices so
the weight converter is a direct path map; the original ``encodec`` package
checkpoints use the same structure under ``decoder.model.*`` and are
normalized to the HF form first (``tts_tpu/utils/convert.py
convert_encodec_decoder``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tts_tpu.vocoder.layers import TorchConvTranspose1d


def _pad_causal(x: jnp.ndarray, left: int, right: int = 0,
                mode: str = "reflect") -> jnp.ndarray:
    """Pad the time axis of [B, T, C].  Mirrors the HF ``_pad1d`` guard:
    reflect padding needs ``pad < T``, so short inputs get temporary zero
    right-padding that is trimmed afterwards."""
    if left == 0 and right == 0:
        return x
    if mode != "reflect":
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    L = x.shape[1]
    extra = max(0, max(left, right) - L + 1)
    if extra:
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    y = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
    return y[:, : y.shape[1] - extra] if extra else y


class CausalConv1d(nn.Module):
    """Causal conv on [B, T, C]: left pad ``(K-1)·dilation + 1 - stride``,
    plus right zero-pad to a whole number of frames (HF ``EncodecConv1d``)."""

    features: int
    kernel_size: int
    dilation: int = 1
    stride: int = 1
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        K = (self.kernel_size - 1) * self.dilation + 1  # effective kernel
        pad_total = K - self.stride
        L = x.shape[1]
        n_frames = -(-(L - K + pad_total) // self.stride)  # == HF ceil(·+1)-1
        ideal = n_frames * self.stride + K - pad_total
        extra = max(0, ideal - L)
        x = _pad_causal(x, pad_total, extra, self.pad_mode)
        return nn.Conv(
            self.features, (self.kernel_size,), strides=(self.stride,),
            kernel_dilation=(self.dilation,), padding="VALID", name="conv",
        )(x)


class CausalConvTranspose1d(nn.Module):
    """ConvTranspose with the right side of the padding trimmed
    (``trim_right_ratio=1``): [B, T, C] → [B, T·stride, features]."""

    features: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x):
        T = x.shape[1]
        y = TorchConvTranspose1d(
            features=self.features, kernel_size=self.kernel_size,
            stride=self.stride, padding=0, name="conv",
        )(x)
        return y[:, : T * self.stride]


class EncodecResnetBlock(nn.Module):
    """SEANet residual block: ELU→conv(k,dil)→ELU→conv(1) + 1×1 shortcut."""

    dim: int
    dilation: int
    residual_kernel_size: int = 3
    compress: int = 2
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        hidden = self.dim // self.compress
        h = nn.elu(x)
        h = CausalConv1d(hidden, self.residual_kernel_size, self.dilation,
                         pad_mode=self.pad_mode, name="block_1")(h)
        h = nn.elu(h)
        h = CausalConv1d(self.dim, 1, pad_mode=self.pad_mode, name="block_3")(h)
        s = CausalConv1d(self.dim, 1, pad_mode=self.pad_mode, name="shortcut")(x)
        return s + h


class EncodecDecoder(nn.Module):
    """Causal SEANet decoder: [B, T, hidden] latents → [B, T·hop, 1] wav
    (hop = prod(ratios) = 320 for the 24 kHz model)."""

    hidden_size: int = 128
    num_filters: int = 32
    upsampling_ratios: Sequence[int] = (8, 5, 4, 2)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    num_lstm_layers: int = 2
    compress: int = 2
    dilation_growth_rate: int = 2
    num_residual_layers: int = 1
    audio_channels: int = 1
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        scaling = 2 ** len(self.upsampling_ratios)
        dim = scaling * self.num_filters
        x = CausalConv1d(dim, self.kernel_size, pad_mode=self.pad_mode, name="layer_0")(x)
        # 2-layer LSTM with a skip connection (HF EncodecLSTM)
        h = x
        for l in range(self.num_lstm_layers):
            h = nn.RNN(nn.OptimizedLSTMCell(dim, name=f"lstm_{l}"))(h)
        x = x + h
        idx = 2
        for ratio in self.upsampling_ratios:
            x = nn.elu(x)
            idx += 1  # the ELU occupies an index in the HF ModuleList
            x = CausalConvTranspose1d(dim // 2, ratio * 2, ratio,
                                      name=f"layer_{idx}")(x)
            dim //= 2
            for j in range(self.num_residual_layers):
                idx += 1
                x = EncodecResnetBlock(
                    dim, self.dilation_growth_rate**j,
                    self.residual_kernel_size, self.compress, self.pad_mode,
                    name=f"layer_{idx}",
                )(x)
            idx += 1
        x = nn.elu(x)
        idx += 1
        return CausalConv1d(self.audio_channels, self.last_kernel_size,
                            pad_mode=self.pad_mode, name=f"layer_{idx}")(x)


class EncodecEncoder(nn.Module):
    """Causal SEANet encoder (HF ``EncodecEncoder``): [B, T, 1] wav →
    [B, T/hop, hidden] latents.  Used for Bark voice-cloning prompts
    (reference ``bark/inference_funcs.py generate_voice`` encodes the
    reference clip to coarse/fine code history)."""

    hidden_size: int = 128
    num_filters: int = 32
    upsampling_ratios: Sequence[int] = (8, 5, 4, 2)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    num_lstm_layers: int = 2
    compress: int = 2
    dilation_growth_rate: int = 2
    num_residual_layers: int = 1
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        dim = self.num_filters
        x = CausalConv1d(dim, self.kernel_size, pad_mode=self.pad_mode, name="layer_0")(x)
        idx = 0
        for ratio in reversed(list(self.upsampling_ratios)):
            for j in range(self.num_residual_layers):
                idx += 1
                x = EncodecResnetBlock(
                    dim, self.dilation_growth_rate**j,
                    self.residual_kernel_size, self.compress, self.pad_mode,
                    name=f"layer_{idx}",
                )(x)
            x = nn.elu(x)
            idx += 1  # the ELU occupies an index in the HF ModuleList
            idx += 1
            x = CausalConv1d(dim * 2, ratio * 2, stride=ratio,
                             pad_mode=self.pad_mode, name=f"layer_{idx}")(x)
            dim *= 2
        h = x
        idx += 1
        for l in range(self.num_lstm_layers):
            h = nn.RNN(nn.OptimizedLSTMCell(dim, name=f"lstm_{l}"))(h)
        x = nn.elu(x + h)
        idx += 2
        return CausalConv1d(self.hidden_size, self.last_kernel_size,
                            pad_mode=self.pad_mode, name=f"layer_{idx}")(x)


def rvq_encode(latents: jnp.ndarray, codebooks: jnp.ndarray,
               n_q: int = None) -> jnp.ndarray:
    """Residual-VQ encode: latents [1, T, D] + codebooks [n_q, bins, D] →
    codes [n_q, T] (per-stage nearest codebook entry on the residual — HF
    ``EncodecResidualVectorQuantizer.encode``)."""
    x = latents[0]  # [T, D]
    n_q = codebooks.shape[0] if n_q is None else n_q
    codes = []
    for q in range(n_q):
        e = codebooks[q]  # [bins, D]
        # argmin over ||x - e||² == argmax of 2xe − |e|² (HF quantize)
        dist = 2 * x @ e.T - jnp.sum(e**2, axis=-1)[None]
        idx = jnp.argmax(dist, axis=-1)
        codes.append(idx)
        x = x - e[idx]
    return jnp.stack(codes)


def rvq_decode(codes: np.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    """Residual-VQ decode: codes [n_q, T] + codebooks [n_q, bins, D] →
    latents [1, T, D] (sum of per-stage embeddings — HF
    ``EncodecResidualVectorQuantizer.decode``)."""
    codes = jnp.asarray(codes, jnp.int32)
    n_q = codes.shape[0]
    emb = jnp.take_along_axis(
        codebooks[:n_q], codes[:, :, None].astype(jnp.int32), axis=1
    )  # [n_q, T, D]
    return jnp.sum(emb, axis=0)[None]


class EncodecVocoder:
    """Host-side bundle: codebooks + decoder (and optionally encoder)
    params → ``decode(codes)`` / ``encode(wav)``."""

    def __init__(self, params, codebooks, decoder: EncodecDecoder = None,
                 encoder_params=None, encoder: EncodecEncoder = None,
                 n_q: int = 8):
        import jax

        self.decoder = decoder or EncodecDecoder()
        self.params = params
        self.codebooks = jnp.asarray(codebooks)
        self.encoder_params = encoder_params
        self.encoder = encoder or EncodecEncoder()
        self.n_q = min(n_q, self.codebooks.shape[0])  # 6 kbps → 8 codebooks (bark.py:43)
        # jitted entry points: one fused XLA program per sequence length
        # (eager dispatch is pathological over the remote-TPU tunnel)
        self._decode_fn = jax.jit(
            lambda cb, p, codes: self.decoder.apply(p, rvq_decode(codes, cb))
        )
        self._encode_fn = jax.jit(
            lambda cb, p, x: rvq_encode(self.encoder.apply(p, x), cb, self.n_q)
        )

    @property
    def can_encode(self) -> bool:
        return self.encoder_params is not None

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """[n_q, T] int codes → [T·hop] float wav."""
        wav = self._decode_fn(self.codebooks, self.params, jnp.asarray(codes))
        return np.asarray(wav[0, :, 0])

    def encode(self, wav: np.ndarray, n_q: int = None) -> np.ndarray:
        """[T] float wav @24 kHz → [n_q, T/hop] int codes."""
        x = jnp.asarray(np.asarray(wav, np.float32).reshape(1, -1, 1))
        codes = self._encode_fn(self.codebooks, self.encoder_params, x)
        n = n_q or self.n_q
        return np.asarray(codes[:n])
