"""Masked loss functions shared across TTS models
(reference ``TTS/tts/layers/losses.py``).

All losses are pure functions over padded tensors + length vectors, safe
under jit.  The CTC alignment loss (``ForwardSumLoss``) is a vectorized
log-domain lattice scan instead of the reference's per-sample
``torch.nn.CTCLoss`` loop — the whole batch runs in one ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tts_tpu.ops import sequence_mask

__all__ = [
    "l1_loss_masked",
    "mse_loss_masked",
    "bce_loss_masked",
    "ssim_loss",
    "forward_sum_loss",
    "binary_alignment_loss",
    "huber_loss",
]


def _masked_mean(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask) * err.shape[-1] / mask.shape[-1], 1.0)


def l1_loss_masked(y_hat, y, lengths, seq_len_norm: bool = False):
    """L1 over valid frames (reference ``losses.py:16``)."""
    mask = sequence_mask(lengths, y.shape[1])[:, :, None].astype(y.dtype)
    err = jnp.abs(y_hat - y) * mask
    if seq_len_norm:
        per_sample = jnp.sum(err, axis=(1, 2)) / (
            jnp.maximum(lengths, 1) * y.shape[2]
        )
        return jnp.mean(per_sample)
    return jnp.sum(err) / jnp.maximum(jnp.sum(mask) * y.shape[2], 1.0)


def mse_loss_masked(y_hat, y, lengths, seq_len_norm: bool = False):
    """MSE over valid frames (reference ``losses.py:55``)."""
    mask = sequence_mask(lengths, y.shape[1])[:, :, None].astype(y.dtype)
    err = ((y_hat - y) ** 2) * mask
    if seq_len_norm:
        per_sample = jnp.sum(err, axis=(1, 2)) / (jnp.maximum(lengths, 1) * y.shape[2])
        return jnp.mean(per_sample)
    return jnp.sum(err) / jnp.maximum(jnp.sum(mask) * y.shape[2], 1.0)


def huber_loss(y_hat, y, lengths, delta: float = 1.0):
    mask = sequence_mask(lengths, y.shape[1])[:, :, None].astype(y.dtype)
    diff = (y_hat - y) * mask
    abs_diff = jnp.abs(diff)
    err = jnp.where(abs_diff <= delta, 0.5 * diff**2, delta * (abs_diff - 0.5 * delta))
    return jnp.sum(err) / jnp.maximum(jnp.sum(mask), 1.0)


def bce_loss_masked(logits, targets, lengths, pos_weight: float = 1.0):
    """Binary cross-entropy with padding mask + positive-class weighting
    (reference ``losses.py:157``; used by Tacotron stopnets)."""
    mask = sequence_mask(lengths, targets.shape[1]).astype(logits.dtype)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    bce = -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)
    return jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


# ---------------------------------------------------------------------------
# SSIM
# ---------------------------------------------------------------------------


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size) - size // 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _ssim_2d(a: jnp.ndarray, b: jnp.ndarray, k1=0.01, k2=0.03, win=11, sigma=1.5):
    """Mean SSIM over ``[B, H, W]`` images in [0, 1] (separable Gaussian)."""
    kernel = _gaussian_kernel(win, sigma)

    def blur(x):
        x = jax.vmap(lambda img: jnp.apply_along_axis(
            lambda v: jnp.convolve(v, kernel, mode="same"), 0, img))(x)
        x = jax.vmap(lambda img: jnp.apply_along_axis(
            lambda v: jnp.convolve(v, kernel, mode="same"), 1, img))(x)
        return x

    mu_a, mu_b = blur(a), blur(b)
    var_a = blur(a * a) - mu_a**2
    var_b = blur(b * b) - mu_b**2
    cov = blur(a * b) - mu_a * mu_b
    c1, c2 = k1**2, k2**2
    ssim_map = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return jnp.mean(ssim_map)


def ssim_loss(y_hat, y, lengths):
    """1 - SSIM with per-sample min-max normalization
    (reference ``losses.py:105`` + ``ssim.py``)."""
    mask = sequence_mask(lengths, y.shape[1])[:, :, None].astype(y.dtype)

    def norm(x):
        masked = jnp.where(mask > 0, x, jnp.inf)
        mn = jnp.min(masked, axis=(1, 2), keepdims=True)
        masked = jnp.where(mask > 0, x, -jnp.inf)
        mx = jnp.max(masked, axis=(1, 2), keepdims=True)
        return (x - mn) / jnp.maximum(mx - mn, 1e-8)

    a = norm(y) * mask
    b = norm(y_hat) * mask
    val = 1.0 - _ssim_2d(a, b)
    return jnp.clip(val, 0.0, 1.0)


# ---------------------------------------------------------------------------
# CTC forward-sum alignment loss
# ---------------------------------------------------------------------------


def forward_sum_loss(attn_logprob, in_lens, out_lens, blank_logprob: float = -1.0):
    """CTC forward-sum over monotonic alignments
    (reference ``losses.py:279`` ForwardSumLoss).

    Args:
        attn_logprob: ``[B, T_de, T_en]`` unnormalized alignment logits
            (the aligner's ``attn_logp`` squeezed).
        in_lens: ``[B]`` text lengths (targets are tokens 1..K in order).
        out_lens: ``[B]`` mel lengths.
    """
    B, T_de, T_en = attn_logprob.shape
    # pad a blank class and log-softmax over classes per frame
    logp = jnp.pad(attn_logprob, ((0, 0), (0, 0), (1, 0)), constant_values=blank_logprob)
    # mask invalid key classes before softmax (ragged text lengths)
    key_ids = jnp.arange(T_en + 1)[None, None, :]
    valid_key = key_ids <= in_lens[:, None, None]
    logp = jnp.where(valid_key, logp, -1e9)
    logp = jax.nn.log_softmax(logp, axis=-1)  # [B, T_de, K+1]

    # CTC lattice over states s=0..2K: even → blank, odd → token (s-1)/2+1
    S = 2 * T_en + 1
    state_ids = jnp.arange(S)
    is_token = state_ids % 2 == 1
    class_of_state = jnp.where(is_token, (state_ids + 1) // 2, 0)  # class index into K+1

    neg = -1e9
    alpha0 = jnp.full((B, S), neg)
    # start in blank(0) or first token(1)
    alpha0 = alpha0.at[:, 0].set(logp[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(logp[:, 0, 1])

    emit = logp[:, :, class_of_state]  # [B, T_de, S]

    def step(alpha, inputs):
        emit_t, t = inputs
        stay = alpha
        prev1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=neg)[:, :-1]
        prev2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=neg)[:, :-2]
        # skip (prev2) allowed only into token states (unique targets)
        cand = jnp.logaddexp(stay, prev1)
        cand = jnp.where(is_token[None, :], jnp.logaddexp(cand, prev2), cand)
        new_alpha = cand + emit_t
        # frames beyond a sample's length keep their alpha frozen
        active = (t < out_lens)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    ts = jnp.arange(1, T_de)
    alpha, _ = jax.lax.scan(step, alpha0, (jnp.moveaxis(emit[:, 1:], 1, 0), ts))

    # final: last token state (2K-1) or final blank (2K), K = in_lens
    idx_last_tok = 2 * in_lens - 1
    idx_last_blank = 2 * in_lens
    ll = jnp.logaddexp(
        jnp.take_along_axis(alpha, idx_last_tok[:, None], 1)[:, 0],
        jnp.take_along_axis(alpha, idx_last_blank[:, None], 1)[:, 0],
    )
    # torch CTCLoss 'mean' reduction divides each sample by its target length
    return -jnp.mean(ll / jnp.maximum(in_lens, 1))


def binary_alignment_loss(alignment_hard, alignment_soft):
    """Force soft attention toward the hard MAS alignment
    (reference ``losses.py:821``)."""
    log_sum = jnp.sum(
        jnp.log(jnp.clip(alignment_soft, min=1e-12)) * alignment_hard
    )
    return -log_sum / jnp.maximum(jnp.sum(alignment_hard), 1.0)


def differential_spectral_loss(y_hat, y, lengths, loss_fn=None):
    """Loss on the temporal first difference of spectral frames
    (reference ``losses.py:208`` DifferentialSpectralLoss)."""
    fn = loss_fn or mse_loss_masked
    return fn(y_hat[:, 1:] - y_hat[:, :-1], y[:, 1:] - y[:, :-1], lengths - 1)
