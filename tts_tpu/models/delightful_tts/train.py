"""DelightfulTTS training step — joint acoustic + HiFiGAN GAN update.

The reference trains the acoustic model and its waveform decoder jointly,
sequencing two optimizer steps per batch through the trainer (D then G,
caching generator outputs — ``delightful_tts.py:919-1035``).  Like the VITS
step (``models/vits/train.py``), both gradients here come from ONE backward
pass: the discriminator loss stops gradients through the generated waveform,
the generator's adversarial loss stops gradients at the discriminator
*parameters*.  XLA CSEs the shared forwards.

Reference semantics preserved:
- the vocoder consumes *detached* random slices of the predicted mel
  (``delightful_tts.py:871`` ``vocoder_input_slices.detach()``) — the
  acoustic model learns only from the mel/prosody losses;
- vocoder mel loss compares the GT mel slice with the mel of the generated
  segment (``:1760``, ``vocoder_mel_loss_alpha``);
- the discriminator joins after ``steps_to_start_discriminator``
  (``:744``), implemented as a traced step gate so one compiled step serves
  both phases.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from tts_tpu.audio import jax_transforms as jt
from tts_tpu.ops import rand_segments, segment
from tts_tpu.trainer.optim import build_lr_schedule, build_optimizer
from tts_tpu.trainer.precision import is_mixed_precision, mp_value_and_grad
from tts_tpu.trainer.state import TrainState

from tts_tpu.models.vits.model import (
    discriminator_adv_loss,
    feature_loss,
    generator_adv_loss,
)


def make_optimizers(config) -> Dict[str, Any]:
    gen_sched = build_lr_schedule(
        config.lr_scheduler_gen, config.lr_gen, config.lr_scheduler_gen_params
    )
    disc_sched = build_lr_schedule(
        config.lr_scheduler_disc, config.lr_disc, config.lr_scheduler_disc_params
    )
    clip = config.grad_clip[0] if isinstance(config.grad_clip, (list, tuple)) else config.grad_clip
    accum = int(getattr(config, "grad_accum_steps", 1) or 1)
    skip_nf = bool(getattr(config, "skip_non_finite_grads", False))
    return {
        "gen": build_optimizer(config.optimizer, gen_sched, config.optimizer_params, clip, accum, skip_nf),
        "disc": build_optimizer(config.optimizer, disc_sched, config.optimizer_params, clip, accum, skip_nf),
    }


def make_train_step(model, config):
    """Returns ``(train_step, eval_step, optimizers)`` for the Trainer."""
    audio = config.audio
    hop = audio.hop_length
    seg_frames = model.args.spec_segment_size
    disc_start = int(getattr(config, "steps_to_start_discriminator", 0) or 0)
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

    def loss_fn(gen_params, disc_params, batch, rngs, disc_on):
        # mel targets computed in-graph from the waveform so the acoustic
        # target and the vocoder mel loss share one convention (reference
        # format_batch_on_device, delightful_tts.py:1342-1365)
        wav = batch["waveform"]
        if wav.ndim == 2:
            wav = wav[:, :, None]
        mel_gt = jnp.swapaxes(jt.wav_to_mel(wav[..., 0].astype(jnp.float32), **mel_kw), 1, 2)
        T_de = batch["mel_input"].shape[1]
        if mel_gt.shape[1] >= T_de:
            mel_gt = mel_gt[:, :T_de]
        else:
            mel_gt = jnp.pad(mel_gt, ((0, 0), (0, T_de - mel_gt.shape[1]), (0, 0)))
        batch = {**batch, "mel_input": mel_gt, "waveform": wav}

        # acoustic losses (mel/dur/pitch/energy/prosody/aligner)
        acoustic_loss, metrics = model.train_step(
            {"acoustic": gen_params["acoustic"]}, batch, rngs=rngs, train=True
        )
        outputs = metrics.pop("outputs")

        # random mel slices → vocoder; GT waveform slices aligned by hop
        mel_pred = outputs["model_outputs"]  # [B, T_de, M]
        mel_slice_hat_in, slice_ids = rand_segments(
            rngs["segments"], jax.lax.stop_gradient(mel_pred), batch["mel_lengths"],
            segment_size=seg_frames, let_short_samples=True, pad_short=True,
        )
        wav_hat = model.vocoder.apply(gen_params["vocoder"], mel_slice_hat_in)  # [B, seg*hop, 1]
        wav_seg = segment(wav, slice_ids * hop, seg_frames * hop, pad_short=True)

        # ---- discriminator branch (grads only into disc_params) ----------
        scores_d_fake, _, scores_d_real, _ = model.discriminator.apply(
            disc_params, jax.lax.stop_gradient(wav_hat), wav_seg
        )
        loss_disc, _, _ = discriminator_adv_loss(scores_d_real, scores_d_fake)
        loss_disc = loss_disc * disc_on

        # ---- generator branch (grads only into gen_params) ---------------
        frozen_disc = jax.lax.stop_gradient(disc_params)
        scores_g_fake, feats_g_fake, _, feats_g_real = model.discriminator.apply(
            frozen_disc, wav_hat, wav_seg
        )
        # fp32 loss islands (reference wraps the criterion in autocast(False))
        mel_slice = segment(
            batch["mel_input"].astype(jnp.float32), slice_ids, seg_frames, pad_short=True
        )
        # wav_to_mel returns [B, M, T]; dataset mels are [B, T, M]
        mel_slice_hat = jnp.swapaxes(
            jt.wav_to_mel(wav_hat[..., 0].astype(jnp.float32), **mel_kw), 1, 2
        )
        T = min(mel_slice.shape[1], mel_slice_hat.shape[1])
        loss_voc_mel = (
            jnp.mean(jnp.abs(mel_slice[:, :T] - mel_slice_hat[:, :T]))
            * getattr(config, "vocoder_mel_loss_alpha", 10.0)
        )
        loss_feat = feature_loss(feats_g_real, feats_g_fake) * config.feat_loss_alpha * disc_on
        loss_gen = generator_adv_loss(scores_g_fake) * config.gen_loss_alpha * disc_on

        total = acoustic_loss + loss_voc_mel + loss_feat + loss_gen + loss_disc * config.disc_loss_alpha
        metrics.update(
            loss=total,
            loss_acoustic=acoustic_loss,
            loss_vocoder_mel=loss_voc_mel,
            loss_feat=loss_feat,
            loss_gen=loss_gen,
            loss_disc=loss_disc,
        )
        return total, metrics

    mixed = is_mixed_precision(config)

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        step_rng = jax.random.fold_in(rng, state.step)
        rngs = {
            "dropout": step_rng,
            "noise": jax.random.fold_in(step_rng, 1),
            "segments": jax.random.fold_in(step_rng, 2),
        }
        disc_on = (state.step >= disc_start).astype(jnp.float32)
        grad_fn = mp_value_and_grad(loss_fn, argnums=(0, 1), has_aux=True, enabled=mixed)
        (_, metrics), (gen_grads, disc_grads) = grad_fn(
            state.params["gen"], state.params["disc"], batch, rngs, disc_on
        )
        state = state.apply_updates(optimizers, {"gen": gen_grads, "disc": disc_grads})
        return state, metrics

    def eval_step(state: TrainState, batch) -> Dict:
        fixed = jax.random.PRNGKey(0)
        rngs = {
            "dropout": fixed,
            "noise": jax.random.fold_in(fixed, 1),
            "segments": jax.random.fold_in(fixed, 2),
        }
        _, metrics = loss_fn(
            state.params["gen"], state.params["disc"], batch, rngs, jnp.float32(1.0)
        )
        return metrics

    return train_step, eval_step, optimizers


def create_train_state(model, config, rng) -> TrainState:
    params = model.init_params(rng)
    disc_params = model.discriminator.init(
        jax.random.fold_in(rng, 7), jnp.zeros((1, 256, 1)), jnp.zeros((1, 256, 1))
    )
    optimizers = make_optimizers(config)
    return TrainState.create({"gen": params, "disc": disc_params}, optimizers)
