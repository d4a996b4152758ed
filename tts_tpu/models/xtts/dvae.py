"""Discrete VAE over mel spectrograms — produces the audio codes the XTTS
GPT is trained on (reference ``TTS/tts/layers/xtts/dvae.py:201``).

VQ uses straight-through estimation with codebook + commitment losses
(the reference uses EMA codebook updates; the ST variant trains the same
codebook without mutable non-param state, which keeps the train step a
pure function for pjit).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class VectorQuantize(nn.Module):
    """(reference ``dvae.py:51`` Quantize)"""

    dim: int
    n_embed: int

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: [..., dim] → (quantized, codes, vq_loss)."""
        codebook = self.param(
            "codebook", nn.initializers.normal(1.0), (self.n_embed, self.dim)
        )
        flat = x.reshape(-1, self.dim)
        dist = (
            jnp.sum(flat**2, -1, keepdims=True)
            - 2 * flat @ codebook.T
            + jnp.sum(codebook**2, -1)[None, :]
        )
        codes = jnp.argmin(dist, axis=-1)
        quant = codebook[codes].reshape(x.shape)
        codes = codes.reshape(x.shape[:-1])
        codebook_loss = jnp.mean((quant - jax.lax.stop_gradient(x)) ** 2)
        commit_loss = jnp.mean((jax.lax.stop_gradient(quant) - x) ** 2)
        quant_st = x + jax.lax.stop_gradient(quant - x)  # straight-through
        return quant_st, codes, codebook_loss + 0.25 * commit_loss


class DiscreteVAE(nn.Module):
    """1-D conv VQ-VAE over mels (XTTS uses positional_dims=1, stride-2
    encoder ×2 → one code per 4 mel frames ≈ 1024 samples)."""

    channels: int = 80
    num_tokens: int = 1024
    codebook_dim: int = 512
    hidden_dim: int = 512
    num_resnet_blocks: int = 3
    num_layers: int = 2
    kernel_size: int = 3

    def setup(self):
        self.quantize = VectorQuantize(self.codebook_dim, self.num_tokens, name="quantize")

    def _resblock(self, x, name):
        h = nn.relu(nn.Conv(x.shape[-1], (3,), padding=[(1, 1)], name=f"{name}_c1")(x))
        h = nn.Conv(x.shape[-1], (1,), name=f"{name}_c2")(h)
        return x + h

    @nn.compact
    def __call__(self, mel) -> Dict[str, jnp.ndarray]:
        """mel [B, T, C] → reconstruction + codes + losses."""
        h = mel
        for i in range(self.num_layers):
            h = nn.relu(
                nn.Conv(self.hidden_dim, (self.kernel_size + 1,), strides=(2,),
                        padding=[(1, 1)], name=f"enc_down_{i}")(h)
            )
        for i in range(self.num_resnet_blocks):
            h = self._resblock(h, f"enc_res_{i}")
        h = nn.Conv(self.codebook_dim, (1,), name="enc_out")(h)

        quant, codes, vq_loss = self.quantize(h)

        d = nn.Conv(self.hidden_dim, (1,), name="dec_in")(quant)
        for i in range(self.num_resnet_blocks):
            d = self._resblock(d, f"dec_res_{i}")
        for i in range(self.num_layers):
            B, T, C = d.shape
            d = jnp.repeat(d, 2, axis=1)
            d = nn.relu(
                nn.Conv(self.hidden_dim, (self.kernel_size,), padding=[(1, 1)],
                        name=f"dec_up_{i}")(d)
            )
        recon = nn.Conv(self.channels, (1,), name="dec_out")(d)
        recon_loss = jnp.mean((recon - mel) ** 2)
        return {
            "reconstruction": recon,
            "codes": codes,
            "vq_loss": vq_loss,
            "recon_loss": recon_loss,
            "loss": recon_loss + vq_loss,
        }

    def get_codebook_indices(self, mel) -> jnp.ndarray:
        """mel [B, T, C] → codes [B, T//2**num_layers] (reference :325)."""
        return self(mel)["codes"]
