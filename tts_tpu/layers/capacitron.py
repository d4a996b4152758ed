"""Capacitron VAE (reference ``TTS/tts/layers/tacotron/capacitron_layers.py``).

Variational prosody embedding with a KL *capacity* constraint optimized
through a learnable Lagrange multiplier β (the reference uses a dual
``CapacitronOptimizer``; here β is a parameter trained with the negated
constraint gradient — same saddle point, one optimizer).

Module structure matches the torch reference exactly (conv pad (2,2),
LSTM last-valid readout, two-layer tanh MLP, softplus σ) so converted
checkpoints are numerically compatible; ``norm_type='folded'`` is the
eval-mode affine of a converted BatchNorm2d.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class CapacitronReferenceEncoder(nn.Module):
    """Mel [B, T, M] (+lengths) → prosody embedding [B, out_dim]
    (reference ``capacitron_layers.py:84``: conv stack with *valid-length
    masking* after every layer, then the last valid LSTM output)."""

    out_dim: int = 128
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, mel, mel_lengths=None):
        B, T, M = mel.shape
        if mel_lengths is None:
            mel_lengths = jnp.full((B,), T, jnp.int32)
        h = mel[..., None]  # [B, T, M, 1]
        valid = mel_lengths.astype(jnp.float32)
        for i, ch in enumerate((32, 32, 64, 64, 128, 128)):
            h = nn.Conv(
                ch, (3, 3), strides=(2, 2), padding=[(2, 2), (2, 2)], name=f"conv_{i}"
            )(h)
            if self.norm_type == "folded":
                scale = self.param(f"scale_{i}", nn.initializers.ones, (ch,))
                shift = self.param(f"shift_{i}", nn.initializers.zeros, (ch,))
                h = h * scale + shift
            else:
                h = nn.LayerNorm(name=f"norm_{i}")(h)
            h = nn.relu(h)
            # valid widths after stride-2 pad-2 conv (reference :128-137)
            valid = jnp.ceil(valid / 2.0) + 1.0
            mask = (
                jnp.arange(h.shape[1])[None, :] < valid.astype(jnp.int32)[:, None]
            )
            h = h * mask[:, :, None, None]
        Bh, Th, Mh, Ch = h.shape
        # torch flattens channel-major: x.transpose(1,2).view(B, T, C*H)
        h = jnp.swapaxes(h, 2, 3).reshape(Bh, Th, Ch * Mh)
        outs = nn.RNN(nn.OptimizedLSTMCell(self.out_dim, name="lstm"))(h)
        last = jnp.clip(valid.astype(jnp.int32) - 1, 0, Th - 1)
        return jnp.take_along_axis(outs, last[:, None, None], axis=1)[:, 0]  # [B, out_dim]


class TextSummary(nn.Module):
    """Text-encoder outputs → fixed summary via last-valid LSTM output
    (reference ``capacitron_layers.py:167``)."""

    embedding_dim: int

    @nn.compact
    def __call__(self, text_embeddings, text_lengths=None):
        B, T, _ = text_embeddings.shape
        outs = nn.RNN(nn.OptimizedLSTMCell(self.embedding_dim, name="lstm"))(text_embeddings)
        if text_lengths is None:
            return outs[:, -1]
        last = jnp.clip(text_lengths.astype(jnp.int32) - 1, 0, T - 1)
        return jnp.take_along_axis(outs, last[:, None, None], axis=1)[:, 0]


class PostEncoderMLP(nn.Module):
    """(reference ``capacitron_layers.py:189``): Linear→tanh→Linear(2D);
    μ unconstrained, σ via softplus."""

    hidden_size: int

    @nn.compact
    def __call__(self, x):
        h = jnp.tanh(nn.Dense(self.hidden_size, name="hidden")(x))
        out = nn.Dense(2 * self.hidden_size, name="out")(h)
        mu = out[:, : self.hidden_size]
        sigma = nn.softplus(out[:, self.hidden_size :])
        return mu, sigma


class CapacitronVAE(nn.Module):
    """Reference-audio posterior + text-summary conditioning → style embedding."""

    capacitron_VAE_embedding_dim: int = 128
    reference_encoder_out_dim: int = 128
    use_text_summary: bool = True
    text_summary_embedding_dim: int = 128
    use_speaker_embedding: bool = False
    norm_type: str = "layer"

    def setup(self):
        self.ref_encoder = CapacitronReferenceEncoder(
            self.reference_encoder_out_dim, self.norm_type, name="ref_encoder"
        )
        if self.use_text_summary:
            self.text_summary = TextSummary(self.text_summary_embedding_dim, name="text_summary")
        self.post_mlp = PostEncoderMLP(self.capacitron_VAE_embedding_dim, name="post_mlp")
        # β parameterized via softplus; init softplus⁻¹(1) like the
        # reference (capacitron_layers.py:33 ``log(exp(1)-1)``)
        self.beta_raw = self.param(
            "beta", nn.initializers.constant(math.log(math.e - 1.0)), ()
        )

    def posterior_stats(
        self,
        reference_mel,
        mel_lengths=None,
        text_embeddings=None,
        text_lengths=None,
        speaker_embedding=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(μ, diag variance) of the approximate posterior for a reference
        mel (the softplus net output is the covariance diagonal — see
        ``__call__``)."""
        enc = self.ref_encoder(reference_mel, mel_lengths)
        cond = [enc]
        if self.use_text_summary and text_embeddings is not None:
            cond.append(self.text_summary(text_embeddings, text_lengths))
        if self.use_speaker_embedding and speaker_embedding is not None:
            cond.append(speaker_embedding)
        post_in = jnp.concatenate(cond, -1) if len(cond) > 1 else cond[0]
        return self.post_mlp(post_in)

    def __call__(
        self,
        reference_mel: Optional[jnp.ndarray] = None,  # [B, T, M]
        text_embeddings: Optional[jnp.ndarray] = None,  # [B, T_en, C]
        text_lengths: Optional[jnp.ndarray] = None,
        mel_lengths: Optional[jnp.ndarray] = None,
        speaker_embedding: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (style_emb [B, 1, D], kl_per_sample [B], beta)."""
        D = self.capacitron_VAE_embedding_dim
        beta = nn.softplus(self.beta_raw)

        if reference_mel is not None:
            mu, var = self.posterior_stats(
                reference_mel, mel_lengths, text_embeddings, text_lengths, speaker_embedding
            )
            # the reference feeds the softplus output into MVN as the
            # covariance diagonal (capacitron_layers.py:74), i.e. it is a
            # VARIANCE despite the code comment — match that behavior
            var = var + 1e-6
            if rng is None:
                rng = self.make_rng("noise")
            z = mu + jnp.sqrt(var) * jax.random.normal(rng, mu.shape)
            # KL(N(mu, diag var) || N(0, I)) per sample
            kl = 0.5 * jnp.sum(mu**2 + var - 1.0 - jnp.log(var), axis=-1)
        else:
            # inference without reference audio: sample the prior
            B = (text_embeddings.shape[0] if text_embeddings is not None
                 else speaker_embedding.shape[0])
            if rng is None:
                rng = self.make_rng("noise")
            z = jax.random.normal(rng, (B, D))
            kl = jnp.zeros((B,))
        return z[:, None, :], kl, beta


def capacitron_loss(kl_per_sample: jnp.ndarray, beta: jnp.ndarray, capacity: float = 150.0):
    """β-weighted capacity-constrained KL (reference ``losses.py:408-440``).

    The main objective uses stop_gradient(β)·(KL − C); β itself descends
    the NEGATED constraint (ascent on the dual) via a gradient-reversal
    trick, matching the reference's two-optimizer scheme in one pass.
    """
    kl = jnp.mean(kl_per_sample)
    constraint = kl - capacity
    beta_sg = jax.lax.stop_gradient(beta)
    # gradient reversal on beta: forward value beta, backward -d/dbeta
    beta_rev = 2 * jax.lax.stop_gradient(beta) - beta
    main_term = beta_sg * constraint
    dual_term = beta_rev * jax.lax.stop_gradient(constraint)
    return main_term + dual_term - jax.lax.stop_gradient(dual_term), kl
