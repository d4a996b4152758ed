"""Capacitron VAE (reference ``TTS/tts/layers/tacotron/capacitron_layers.py:205``).

Variational prosody embedding with a KL *capacity* constraint optimized
through a learnable Lagrange multiplier β (the reference uses a dual
``CapacitronOptimizer``; here β is a parameter trained with the negated
constraint gradient — same saddle point, one optimizer).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .tacotron_v1 import ReferenceEncoder


class CapacitronVAE(nn.Module):
    """Reference-audio posterior + text-summary conditioning → style embedding."""

    capacitron_VAE_embedding_dim: int = 128
    use_text_summary: bool = True
    text_summary_embedding_dim: int = 128
    use_speaker_embedding: bool = False

    @nn.compact
    def __call__(
        self,
        reference_mel: Optional[jnp.ndarray] = None,  # [B, T, M]
        text_embeddings: Optional[jnp.ndarray] = None,  # [B, T_en, C]
        text_lengths: Optional[jnp.ndarray] = None,
        speaker_embedding: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (style_emb [B, 1, D], kl_per_sample [B], beta)."""
        D = self.capacitron_VAE_embedding_dim
        beta_raw = self.param("beta", nn.initializers.ones, ())
        beta = nn.softplus(beta_raw)

        if reference_mel is not None:
            enc = ReferenceEncoder(embedding_dim=128, name="ref_encoder")(reference_mel)
        else:
            enc = None

        cond = []
        if self.use_text_summary and text_embeddings is not None:
            summary = nn.RNN(nn.GRUCell(self.text_summary_embedding_dim), name="text_summary")(
                text_embeddings
            )[:, -1]
            cond.append(summary)
        if self.use_speaker_embedding and speaker_embedding is not None:
            cond.append(speaker_embedding)

        if enc is not None:
            post_in = jnp.concatenate([enc] + cond, -1) if cond else enc
            stats = nn.Dense(2 * D, name="post_mlp")(post_in)
            mu, log_sigma = jnp.split(stats, 2, axis=-1)
            sigma = nn.softplus(log_sigma) + 1e-4
            if rng is None:
                rng = self.make_rng("noise")
            z = mu + sigma * jax.random.normal(rng, mu.shape)
            # KL(N(mu, sigma) || N(0, I)) per sample
            kl = 0.5 * jnp.sum(mu**2 + sigma**2 - 1.0 - 2.0 * jnp.log(sigma), axis=-1)
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
