"""Speaker-encoder losses (reference ``TTS/encoder/losses.py``).

Inputs are ``[num_speakers, num_utter_per_speaker, emb_dim]`` batches from
the PerfectBatchSampler.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _l2norm(x, axis=-1):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-8)


def _cosine(a, b):
    return jnp.sum(_l2norm(a) * _l2norm(b), axis=-1)


class GE2ELoss(nn.Module):
    """Generalized end-to-end loss (reference ``losses.py:7``; softmax variant)."""

    init_w: float = 10.0
    init_b: float = -5.0

    @nn.compact
    def __call__(self, dvecs: jnp.ndarray) -> jnp.ndarray:
        """dvecs: [N_spk, M_utt, D]."""
        w = self.param("w", lambda k: jnp.asarray(self.init_w))
        b = self.param("b", lambda k: jnp.asarray(self.init_b))
        N, M, D = dvecs.shape
        centroids = jnp.mean(dvecs, axis=1)  # [N, D]
        # exclusive centroids for same-speaker similarity
        sums = jnp.sum(dvecs, axis=1, keepdims=True)  # [N, 1, D]
        excl = (sums - dvecs) / (M - 1)  # [N, M, D]

        # cos sim matrix [N, M, N]: utter ji vs centroid k (exclusive when k==j)
        cs = jnp.einsum("jmd,kd->jmk", _l2norm(dvecs), _l2norm(centroids))
        cs_excl = _cosine(dvecs, excl)  # [N, M]
        eye = jnp.eye(N, dtype=bool)[:, None, :]  # [N, 1, N]
        cos_sim = jnp.where(eye, cs_excl[:, :, None], cs)
        logits = jnp.abs(w) * cos_sim + b  # [N, M, N]
        # softmax loss: -log p(correct speaker)
        logp = jax.nn.log_softmax(logits, axis=-1)
        correct = jnp.take_along_axis(
            logp, jnp.arange(N)[:, None, None].repeat(M, 1), axis=-1
        )[..., 0]
        return -jnp.mean(correct)


class AngleProtoLoss(nn.Module):
    """Angular prototypical loss (reference ``losses.py:122``)."""

    init_w: float = 10.0
    init_b: float = -5.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N_spk, M_utt, D]; query = last utterance, anchor = mean of rest."""
        w = self.param("w", lambda k: jnp.asarray(self.init_w))
        b = self.param("b", lambda k: jnp.asarray(self.init_b))
        out_anchor = jnp.mean(x[:, 1:], axis=1)  # [N, D]
        out_query = x[:, 0]  # [N, D]
        cos_sim = jnp.einsum("nd,md->nm", _l2norm(out_query), _l2norm(out_anchor))
        logits = jnp.clip(jnp.abs(w), min=1e-6) * cos_sim + b
        labels = jnp.arange(x.shape[0])
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


class SoftmaxAngleProtoLoss(nn.Module):
    """Softmax CE + AngleProto (reference ``losses.py:199``)."""

    embedding_dim: int
    n_speakers: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """x: [N_spk, M_utt, D]; labels [N_spk*M_utt]."""
        ap = AngleProtoLoss(name="angleproto")(x)
        flat = x.reshape(-1, x.shape[-1])
        logits = nn.Dense(self.n_speakers, name="fc")(flat)
        ce = -jnp.mean(
            jnp.take_along_axis(jax.nn.log_softmax(logits, -1), labels[:, None], axis=-1)
        )
        return ap + ce
