"""Vocoder losses (reference ``TTS/vocoder/layers/losses.py``).

STFTs run through the MXU DFT-matmul transform in
``tts_tpu.audio.jax_transforms`` and fuse with the elementwise loss chain.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from tts_tpu.audio import jax_transforms as jt

__all__ = [
    "stft_loss",
    "multiscale_stft_loss",
    "l1_spec_loss",
    "feature_matching_loss",
    "GeneratorLossConfig",
    "generator_loss",
    "discriminator_loss",
]


def stft_loss(y_hat: jnp.ndarray, y: jnp.ndarray, n_fft: int, hop: int, win: int):
    """Spectral-convergence + log-magnitude L1 (reference ``losses.py:15``)."""
    mag_hat = jt.stft_magnitude(y_hat, n_fft, hop, win)
    mag = jt.stft_magnitude(y, n_fft, hop, win)
    sc = jnp.linalg.norm(mag - mag_hat) / jnp.maximum(jnp.linalg.norm(mag), 1e-8)
    log_mag = jnp.mean(jnp.abs(jnp.log(jnp.clip(mag, min=1e-5)) - jnp.log(jnp.clip(mag_hat, min=1e-5))))
    return sc, log_mag


def multiscale_stft_loss(
    y_hat, y, n_ffts=(1024, 2048, 512), hops=(120, 240, 50), wins=(600, 1200, 240)
):
    """(reference ``losses.py:37``)"""
    sc_total, mag_total = 0.0, 0.0
    for n_fft, hop, win in zip(n_ffts, hops, wins):
        sc, mag = stft_loss(y_hat, y, n_fft, hop, win)
        sc_total += sc
        mag_total += mag
    n = len(n_ffts)
    return sc_total / n, mag_total / n


def l1_spec_loss(y_hat, y, sample_rate, n_fft, hop, win, n_mels=None, fmin=0.0, fmax=None, use_mel=True):
    """L1 between (mel-)spectrograms (reference ``losses.py:61``)."""
    if use_mel:
        m_hat = jt.wav_to_mel(y_hat, n_fft, n_mels, sample_rate, hop, win, fmin, fmax, center=True)
        m = jt.wav_to_mel(y, n_fft, n_mels, sample_rate, hop, win, fmin, fmax, center=True)
    else:
        m_hat = jt.stft_magnitude(y_hat, n_fft, hop, win)
        m = jt.stft_magnitude(y, n_fft, hop, win)
    return jnp.mean(jnp.abs(m - m_hat))


def feature_matching_loss(feats_fake: List, feats_real: List) -> jnp.ndarray:
    """(reference ``losses.py:151`` MelganFeatureLoss)"""
    loss, count = 0.0, 0
    for ff, fr in zip(feats_fake, feats_real):
        for f_hat, f in zip(ff, fr):
            loss += jnp.mean(jnp.abs(f_hat - jax.lax.stop_gradient(f)))
            count += 1
    return loss / max(count, 1)


class GeneratorLossConfig:
    """Loss switchboard mirroring the reference config fields."""

    def __init__(self, config):
        self.use_stft_loss = getattr(config, "use_stft_loss", False)
        self.use_subband_stft_loss = getattr(config, "use_subband_stft_loss", False)
        self.use_mse_gan_loss = getattr(config, "use_mse_gan_loss", True)
        self.use_hinge_gan_loss = getattr(config, "use_hinge_gan_loss", False)
        self.use_feat_match_loss = getattr(config, "use_feat_match_loss", False)
        self.use_l1_spec_loss = getattr(config, "use_l1_spec_loss", False)
        self.stft_loss_weight = getattr(config, "stft_loss_weight", 0.0)
        self.subband_stft_loss_weight = getattr(config, "subband_stft_loss_weight", 0.0)
        self.mse_G_loss_weight = getattr(config, "mse_G_loss_weight", 1.0)
        self.hinge_G_loss_weight = getattr(config, "hinge_G_loss_weight", 0.0)
        self.feat_match_loss_weight = getattr(config, "feat_match_loss_weight", 0.0)
        self.l1_spec_loss_weight = getattr(config, "l1_spec_loss_weight", 0.0)
        self.stft_loss_params = getattr(config, "stft_loss_params", None) or {
            "n_ffts": [1024, 2048, 512],
            "hop_lengths": [120, 240, 50],
            "win_lengths": [600, 1200, 240],
        }
        self.subband_stft_loss_params = getattr(config, "subband_stft_loss_params", None) or {
            "n_ffts": [384, 683, 171],
            "hop_lengths": [30, 60, 10],
            "win_lengths": [150, 300, 60],
        }
        audio = config.audio
        self.l1_spec_params = dict(
            sample_rate=audio["sample_rate"] if isinstance(audio, dict) else audio.sample_rate,
            n_fft=audio["fft_size"] if isinstance(audio, dict) else audio.fft_size,
            hop=audio["hop_length"] if isinstance(audio, dict) else audio.hop_length,
            win=audio["win_length"] if isinstance(audio, dict) else audio.win_length,
            n_mels=audio["num_mels"] if isinstance(audio, dict) else audio.num_mels,
        )


def generator_loss(
    cfg: GeneratorLossConfig,
    y_hat=None,
    y=None,
    scores_fake=None,
    feats_fake=None,
    feats_real=None,
    y_hat_sub=None,
    y_sub=None,
) -> Dict[str, jnp.ndarray]:
    """Composite generator loss (reference ``losses.py:218`` GeneratorLoss)."""
    out: Dict[str, jnp.ndarray] = {}
    gen_loss = 0.0
    adv_loss = 0.0
    if cfg.use_stft_loss:
        p = cfg.stft_loss_params
        sc, mag = multiscale_stft_loss(
            y_hat[..., 0], y[..., 0], p["n_ffts"], p["hop_lengths"], p["win_lengths"]
        )
        out["G_stft_loss_mg"] = mag
        out["G_stft_loss_sc"] = sc
        gen_loss += cfg.stft_loss_weight * (mag + sc)
    if cfg.use_subband_stft_loss and y_hat_sub is not None:
        p = cfg.subband_stft_loss_params
        B, T, N = y_hat_sub.shape
        sc, mag = multiscale_stft_loss(
            y_hat_sub.transpose(0, 2, 1).reshape(B * N, T),
            y_sub.transpose(0, 2, 1).reshape(B * N, T),
            p["n_ffts"], p["hop_lengths"], p["win_lengths"],
        )
        out["G_subband_stft_loss_mg"] = mag
        out["G_subband_stft_loss_sc"] = sc
        gen_loss += cfg.subband_stft_loss_weight * (mag + sc)
    if cfg.use_l1_spec_loss:
        l1 = l1_spec_loss(y_hat[..., 0], y[..., 0], **cfg.l1_spec_params)
        out["G_l1_spec_loss"] = l1
        gen_loss += cfg.l1_spec_loss_weight * l1
    if cfg.use_mse_gan_loss and scores_fake is not None:
        mse = sum(jnp.mean((1.0 - s) ** 2) for s in scores_fake) / len(scores_fake)
        out["G_mse_fake_loss"] = mse
        adv_loss += cfg.mse_G_loss_weight * mse
    if cfg.use_hinge_gan_loss and scores_fake is not None:
        hinge = sum(-jnp.mean(s) for s in scores_fake) / len(scores_fake)
        out["G_hinge_fake_loss"] = hinge
        adv_loss += cfg.hinge_G_loss_weight * hinge
    if cfg.use_feat_match_loss and feats_fake is not None:
        fm = feature_matching_loss(feats_fake, feats_real)
        out["G_feat_match_loss"] = fm
        adv_loss += cfg.feat_match_loss_weight * fm
    out["G_loss"] = gen_loss + adv_loss
    out["G_gen_loss"] = gen_loss
    out["G_adv_loss"] = adv_loss
    return out


def discriminator_loss(scores_fake, scores_real, use_mse: bool = True, use_hinge: bool = False):
    """(reference ``losses.py:311`` DiscriminatorLoss)"""
    out: Dict[str, jnp.ndarray] = {}
    loss = 0.0
    if use_mse:
        fake = sum(jnp.mean(s**2) for s in scores_fake) / len(scores_fake)
        real = sum(jnp.mean((1.0 - s) ** 2) for s in scores_real) / len(scores_real)
        out["D_mse_gan_loss"] = real + fake
        out["D_mse_gan_real_loss"] = real
        out["D_mse_gan_fake_loss"] = fake
        loss += real + fake
    if use_hinge:
        fake = sum(jnp.mean(nn_relu(1.0 + s)) for s in scores_fake) / len(scores_fake)
        real = sum(jnp.mean(nn_relu(1.0 - s)) for s in scores_real) / len(scores_real)
        out["D_hinge_gan_loss"] = real + fake
        loss += real + fake
    out["D_loss"] = loss
    return out


def nn_relu(x):
    return jnp.maximum(x, 0.0)
