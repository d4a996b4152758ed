"""Gaussian-attention alignment network
(reference ``TTS/tts/layers/generic/aligner.py:7``; used by ForwardTTS and
DelightfulTTS aligner-based training)."""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import Conv1d


class AlignmentNetwork(nn.Module):
    """query (mel) / key (text-emb) towers → −T·L2² log-attention."""

    in_query_channels: int = 80
    in_key_channels: int = 512
    attn_channels: int = 80
    temperature: float = 0.0005

    @nn.compact
    def __call__(
        self,
        queries: jnp.ndarray,  # [B, T_de, C_q]
        keys: jnp.ndarray,  # [B, T_en, C_k]
        mask: Optional[jnp.ndarray] = None,  # [B, T_de] 1 = valid mel frame
        attn_prior: Optional[jnp.ndarray] = None,  # [B, T_de, T_en]
        key_mask: Optional[jnp.ndarray] = None,  # [B, T_en] 1 = valid token
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (attn ``[B, T_de, T_en]`` softmaxed over T_en, attn_logp).

        ``key_mask`` reproduces the reference semantics used by
        DelightfulTTS (``generic/aligner.py:89``): −inf fill of masked KEY
        positions after the prior, before the softmax."""
        k = Conv1d(self.in_key_channels * 2, 3, name="key_conv1")(keys)
        k = Conv1d(self.attn_channels, 1, name="key_conv2")(nn.relu(k))

        q = Conv1d(self.in_query_channels * 2, 3, name="query_conv1")(queries)
        q = nn.relu(Conv1d(self.in_query_channels, 1, name="query_conv2")(nn.relu(q)))
        q = Conv1d(self.attn_channels, 1, name="query_conv3")(q)

        # [B, T_de, T_en] = -T * sum_c (q - k)^2
        dist = (
            jnp.sum(q**2, -1)[:, :, None]
            - 2.0 * jnp.einsum("bqc,bkc->bqk", q, k)
            + jnp.sum(k**2, -1)[:, None, :]
        )
        attn_logp = -self.temperature * dist
        if attn_prior is not None:
            attn_logp = nn.log_softmax(attn_logp, axis=-1) + jnp.log(attn_prior + 1e-8)
        if key_mask is not None:
            attn_logp = jnp.where(key_mask[:, None, :] > 0, attn_logp, -jnp.inf)
        attn = nn.softmax(attn_logp, axis=-1)
        if mask is not None:
            attn = attn * mask[:, :, None]
        return attn, attn_logp
