"""HiFiGAN generator (reference ``TTS/vocoder/models/hifigan_generator.py``).

Multi-receptive-field fusion stack, channels-last: transposed-conv
upsampling (input-dilated conv) interleaved with parallel dilated resblocks.
Also used in-graph as the VITS waveform decoder (``vits.py:704``) and the
XTTS HiFiDecoder.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tts_tpu.layers.common import Conv1d
from tts_tpu.vocoder.layers import TorchConvTranspose1d, leaky_relu


class ResBlock1(nn.Module):
    """3×(dilated conv + plain conv) residual block (reference ``:11``).

    ``x_mask`` (optional ``[B, T, 1]``) is re-applied after every conv so a
    masked-out region stays exactly zero — with it, a packed row of several
    utterances separated by masked gaps convolves identically to per-segment
    zero-padded decodes (sequence-packed inference, models/vits).
    """

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            xt = leaky_relu(x)
            xt = Conv1d(self.channels, self.kernel_size, dilation=d, name=f"convs1_{i}")(xt)
            if x_mask is not None:
                xt = xt * x_mask
            xt = leaky_relu(xt)
            xt = Conv1d(self.channels, self.kernel_size, dilation=1, name=f"convs2_{i}")(xt)
            x = xt + x
            if x_mask is not None:
                x = x * x_mask
        return x


class ResBlock2(nn.Module):
    """2×dilated-conv residual block (reference ``:94``)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            xt = leaky_relu(x)
            xt = Conv1d(self.channels, self.kernel_size, dilation=d, name=f"convs_{i}")(xt)
            x = xt + x
            if x_mask is not None:
                x = x * x_mask
        return x


class HifiganGenerator(nn.Module):
    """mel ``[B, T, C_mel]`` → waveform ``[B, T*prod(upsample), 1]``
    (reference ``:140``)."""

    in_channels: int = 80
    out_channels: int = 1
    resblock_type: str = "1"
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    upsample_factors: Sequence[int] = (8, 8, 2, 2)
    inference_padding: int = 5
    cond_channels: int = 0
    conv_post_bias: bool = True
    cond_in_each_up_layer: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        x_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``x_mask`` (optional ``[B, T, 1]`` at input-frame resolution) is
        upsampled alongside the signal and re-applied after every conv, so
        masked gaps behave exactly like zero-padding — the contract the
        sequence-packed VITS decode relies on.  ``None`` (the default) is the
        reference behavior, bit-identical to before the parameter existed."""
        num_kernels = len(self.resblock_kernel_sizes)
        resblock_cls = ResBlock1 if str(self.resblock_type) == "1" else ResBlock2

        o = Conv1d(self.upsample_initial_channel, 7, name="conv_pre")(x)
        if self.cond_channels > 0 and g is not None:
            if g.ndim == 2:
                g = g[:, None, :]
            o = o + nn.Dense(self.upsample_initial_channel, name="cond_layer")(g)
        if x_mask is not None:
            o = o * x_mask
        for i, (u, k) in enumerate(zip(self.upsample_factors, self.upsample_kernel_sizes)):
            o = leaky_relu(o)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            o = TorchConvTranspose1d(
                features=ch, kernel_size=k, stride=u, padding=(k - u) // 2, name=f"ups_{i}"
            )(o)
            if self.cond_in_each_up_layer and g is not None:
                # XTTS HifiDecoder conditions every upsample stage
                # (reference hifigan_decoder.py cond_in_each_up_layer)
                g_i = g
                if g.shape[1] not in (1, o.shape[1]):
                    # per-frame conditioning tracks the upsampled resolution
                    g_i = jnp.repeat(g, o.shape[1] // g.shape[1], axis=1)
                o = o + nn.Dense(ch, name=f"cond_up_{i}")(g_i)
            if x_mask is not None:
                x_mask = jnp.repeat(x_mask, u, axis=1)
                o = o * x_mask
            z_sum = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                z = resblock_cls(ch, rk, tuple(rd), name=f"resblocks_{i * num_kernels + j}")(
                    o, x_mask
                )
                z_sum = z if z_sum is None else z_sum + z
            o = z_sum / num_kernels
        # the reference's final activation is F.leaky_relu's default 0.01
        # slope, unlike the 0.1 used elsewhere (hifigan_generator.py:228)
        o = leaky_relu(o, 0.01)
        o = Conv1d(self.out_channels, 7, use_bias=self.conv_post_bias, name="conv_post")(o)
        o = jnp.tanh(o)
        if x_mask is not None:
            o = o * x_mask
        return o

    def inference(self, c: jnp.ndarray) -> jnp.ndarray:
        c = jnp.pad(
            c, ((0, 0), (self.inference_padding, self.inference_padding), (0, 0)), "edge"
        )
        return self(c)
