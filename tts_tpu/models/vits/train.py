"""VITS training step — fused GAN update.

The reference sequences two optimizer steps per batch through the trainer
(D then G, caching generator outputs in module state, ``vits.py:1230-1340``).
Here both gradients come from ONE backward pass: the discriminator loss
stops gradients through the generator outputs, the generator's adversarial
loss stops gradients at the discriminator *parameters* (but flows through
its activations).  XLA CSEs the shared forwards, so one jitted step does
the work the reference needs two for.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from tts_tpu.audio import jax_transforms as jt
from tts_tpu.ops import segment
from tts_tpu.trainer.optim import build_lr_schedule, build_optimizer
from tts_tpu.trainer.precision import is_mixed_precision, mp_value_and_grad
from tts_tpu.trainer.state import TrainState

from .model import (
    Vits,
    discriminator_adv_loss,
    feature_loss,
    generator_adv_loss,
    kl_loss,
)


def make_optimizers(config) -> Dict[str, Any]:
    gen_sched = build_lr_schedule(config.lr_scheduler_gen, config.lr_gen, config.lr_scheduler_gen_params)
    disc_sched = build_lr_schedule(
        config.lr_scheduler_disc, config.lr_disc, config.lr_scheduler_disc_params
    )
    clip = config.grad_clip if isinstance(config.grad_clip, (int, float)) else config.grad_clip[0]
    accum = int(getattr(config, "grad_accum_steps", 1) or 1)
    skip_nf = bool(getattr(config, "skip_non_finite_grads", False))
    return {
        "gen": build_optimizer(config.optimizer, gen_sched, config.optimizer_params, clip, accum, skip_nf),
        "disc": build_optimizer(config.optimizer, disc_sched, config.optimizer_params, clip, accum, skip_nf),
    }


def _make_speaker_embed_fn(model, audio):
    """In-graph frozen speaker-encoder embedding of an output-rate waveform
    segment ``[B, T, 1]`` → ``[B, D]`` (reference ``vits.py:1078-1095``: the
    reference resamples via torchaudio; here a linear resize approximates the
    rate bridge — adequate for a similarity loss)."""
    enc = getattr(getattr(model, "speaker_manager", None), "encoder", None)
    if enc is None and model.args.speaker_encoder_model_path:
        from tts_tpu.encoder.model import load_speaker_encoder

        enc, _ = load_speaker_encoder(
            model.args.speaker_encoder_model_path, model.args.speaker_encoder_config_path
        )
    if enc is None or enc.params is None:
        raise ValueError(
            "use_speaker_encoder_as_loss requires a loaded speaker encoder: set "
            "model_args.speaker_encoder_model_path/speaker_encoder_config_path or "
            "pass encoder paths to the SpeakerManager"
        )
    ea = enc.config.audio
    eget = (lambda k: ea[k]) if isinstance(ea, dict) else (lambda k: getattr(ea, k))
    enc_sr = int(eget("sample_rate"))
    mel_kw = dict(
        n_fft=int(eget("fft_size")),
        num_mels=enc.module.input_dim,
        sample_rate=enc_sr,
        hop_length=int(eget("hop_length")),
        win_length=int(eget("win_length")),
    )
    frozen = jax.tree.map(jax.lax.stop_gradient, enc.params)

    def spk_embed(wav):  # [B, T, 1] at audio.sample_rate
        w = wav[..., 0]
        if enc_sr != audio.sample_rate:
            t2 = max(1, int(round(w.shape[1] * enc_sr / audio.sample_rate)))
            w = jax.image.resize(w, (w.shape[0], t2), method="linear")
        mel = jnp.swapaxes(jt.wav_to_mel(w, **mel_kw), 1, 2)  # [B, T, M]
        return enc.module.apply(frozen, mel)

    return spk_embed


def make_train_step(model: Vits, config):
    """Returns ``train_step(state, batch, rng) -> (state, metrics)``."""
    audio = config.audio
    hop = audio.hop_length
    seg_frames = model.args.spec_segment_size
    # encoder_sample_rate variant: slice_ids index encoder-rate frames, but
    # the waveform is at the output rate — each frame spans hop*factor
    # samples (reference vits.py:944-950 scales slices and segment size)
    hop *= int(round(getattr(model.module, "interpolate_factor", 1.0)))

    # speaker-consistency loss (YourTTS SCL, reference vits.py:754,1078-1095
    # + losses.py loss_spk_enc): embed real and generated segments with a
    # frozen speaker encoder, maximize cosine similarity
    spk_embed = None
    if getattr(model.args, "use_speaker_encoder_as_loss", False):
        spk_embed = _make_speaker_embed_fn(model, audio)
    mel_kw = dict(
        n_fft=audio.fft_size,
        num_mels=audio.num_mels,
        sample_rate=audio.sample_rate,
        hop_length=audio.hop_length,
        win_length=audio.win_length,
        fmin=audio.mel_fmin,
        fmax=audio.mel_fmax,
    )
    optimizers = make_optimizers(config)

    def loss_fn(gen_params, disc_params, batch, rngs):
        out = model.module.apply(
            gen_params,
            batch["text_input"],
            batch["text_lengths"],
            batch["spec"],
            batch["spec_lengths"],
            batch.get("waveform"),
            aux_input={
                "d_vectors": batch.get("d_vectors"),
                "speaker_ids": batch.get("speaker_ids"),
                "language_ids": batch.get("language_ids"),
            },
            train=True,
            rngs=rngs,
        )
        wav_fake = out["model_outputs"]  # [B, seg*hop, 1]
        wav_real = segment(
            batch["waveform"], out["slice_ids"] * hop, seg_frames * hop, pad_short=True
        )

        # ---- discriminator branch (grads only into disc_params) ----------
        scores_d_fake, _, scores_d_real, _ = model.discriminator.apply(
            disc_params, jax.lax.stop_gradient(wav_fake), wav_real
        )
        loss_disc, _, _ = discriminator_adv_loss(scores_d_real, scores_d_fake)

        # ---- generator branch (grads only into gen_params) ---------------
        frozen_disc = jax.lax.stop_gradient(disc_params)
        scores_g_fake, feats_g_fake, _, feats_g_real = model.discriminator.apply(
            frozen_disc, wav_fake, wav_real
        )
        mel_fake = jt.wav_to_mel(wav_fake[..., 0], **mel_kw)
        mel_real = jt.wav_to_mel(wav_real[..., 0], **mel_kw)
        # fp32 loss reduction (reference AMP keeps loss islands fp32, vits.py:1273)
        loss_mel = (
            jnp.mean(jnp.abs(mel_fake.astype(jnp.float32) - mel_real.astype(jnp.float32)))
            * config.mel_loss_alpha
        )
        loss_kl = (
            kl_loss(out["z_p"], out["logs_q"], out["m_p"], out["logs_p"], z_mask=out["y_mask"])
            * config.kl_loss_alpha
        )
        loss_feat = feature_loss(feats_g_real, feats_g_fake) * config.feat_loss_alpha
        loss_gen = generator_adv_loss(scores_g_fake) * config.gen_loss_alpha
        loss_dur = out["loss_duration"] * config.dur_loss_alpha
        loss_gen_total = loss_mel + loss_kl + loss_feat + loss_gen + loss_dur
        loss_spk = None
        if spk_embed is not None:
            emb_gt = spk_embed(jax.lax.stop_gradient(wav_real))
            emb_syn = spk_embed(wav_fake)
            cos = jnp.sum(emb_gt * emb_syn, axis=-1) / jnp.maximum(
                jnp.linalg.norm(emb_gt, axis=-1) * jnp.linalg.norm(emb_syn, axis=-1), 1e-8
            )
            # reference losses.py cosine_similarity_loss: -cos.mean() * alpha
            loss_spk = -jnp.mean(cos) * config.speaker_encoder_loss_alpha
            loss_gen_total = loss_gen_total + loss_spk

        total = loss_gen_total + loss_disc * config.disc_loss_alpha
        metrics = {
            "loss": total,
            "loss_gen_total": loss_gen_total,
            "loss_disc": loss_disc,
            "loss_mel": loss_mel,
            "loss_kl": loss_kl,
            "loss_feat": loss_feat,
            "loss_gen": loss_gen,
            "loss_duration": loss_dur,
        }
        if loss_spk is not None:
            metrics["loss_spk_enc"] = loss_spk
        return total, metrics

    mixed = is_mixed_precision(config)

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        r_noise, r_seg, r_drop = jax.random.split(jax.random.fold_in(rng, state.step), 3)
        rngs = {"noise": r_noise, "segments": r_seg, "dropout": r_drop}
        grad_fn = mp_value_and_grad(loss_fn, argnums=(0, 1), has_aux=True, enabled=mixed)
        (_, metrics), (gen_grads, disc_grads) = grad_fn(
            state.params["gen"], state.params["disc"], batch, rngs
        )
        state = state.apply_updates(optimizers, {"gen": gen_grads, "disc": disc_grads})
        return state, metrics

    def eval_step(state: TrainState, batch) -> Dict:
        """Deterministic no-grad loss (fixed rngs; posterior sampling noise
        is part of the VITS objective so it stays on, just seeded)."""
        fixed = jax.random.PRNGKey(0)
        rngs = {
            "noise": fixed,
            "segments": jax.random.fold_in(fixed, 1),
            "dropout": jax.random.fold_in(fixed, 2),
        }
        _, metrics = loss_fn(state.params["gen"], state.params["disc"], batch, rngs)
        return metrics

    return train_step, eval_step, optimizers


def create_train_state(model: Vits, config, rng) -> TrainState:
    gen_params, disc_params = model.init_params(rng)
    optimizers = make_optimizers(config)
    return TrainState.create({"gen": gen_params, "disc": disc_params}, optimizers)
