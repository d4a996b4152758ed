"""Generic GAN vocoder: any generator × any discriminator
(reference ``TTS/vocoder/models/gan.py:21``).

Training uses the same fused single-backward GAN step as VITS: disc loss
stops gradients through the generator output; generator adversarial loss
stops gradients at discriminator params.  Discriminator warmup
(``steps_to_start_discriminator``) gates the adversarial terms with a
step-conditioned multiplier inside the jitted step (no recompile).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.trainer.optim import build_lr_schedule, build_optimizer
from tts_tpu.trainer.precision import is_mixed_precision, mp_value_and_grad
from tts_tpu.trainer.state import TrainState
from tts_tpu.vocoder.losses import GeneratorLossConfig, discriminator_loss, generator_loss
from tts_tpu.vocoder.models import setup_discriminator, setup_generator
from tts_tpu.vocoder.models.melgan_generator import PQMF


class GAN:
    """Host wrapper composing generator + discriminator (reference ``gan.py``)."""

    def __init__(self, config):
        self.config = config
        gen_cls = setup_generator(config.generator_model)
        disc_cls = setup_discriminator(config.discriminator_model)
        gen_kwargs = dict(config.generator_model_params or {})
        # reference passes mel dim separately
        if "in_channels" not in gen_kwargs and hasattr(gen_cls, "in_channels"):
            gen_kwargs["in_channels"] = config.audio.num_mels
        self.generator = gen_cls(**gen_kwargs)
        self.discriminator = disc_cls(**(config.discriminator_model_params or {}))
        self.use_pqmf = getattr(config, "use_pqmf", False)
        self.pqmf = PQMF(N=getattr(self.generator, "out_channels", 4)) if self.use_pqmf else None
        self.loss_cfg = GeneratorLossConfig(config)

    # ------------------------------------------------------------------
    def init_params(self, rng) -> Tuple[Any, Any]:
        mel_frames = max(8, self.config.seq_len // self.config.audio.hop_length)
        c = jnp.zeros((1, mel_frames, self.config.audio.num_mels))
        gen_params = self.generator.init(rng, c)
        wav = jnp.zeros((1, self.config.seq_len, 1))
        disc_params = self.discriminator.init(jax.random.fold_in(rng, 1), wav)
        return gen_params, disc_params

    def generate(self, gen_params, c):
        """mel [B, T, M] → waveform [B, T*hop, 1] (through PQMF if enabled)."""
        y_hat = self.generator.apply(gen_params, c)
        if self.use_pqmf:
            y_hat = self.pqmf.synthesis(y_hat)
        return y_hat

    # ------------------------------------------------------------------
    def make_train_step(self, config, rng):
        gen_sched = build_lr_schedule(config.lr_scheduler_gen, config.lr_gen, config.lr_scheduler_gen_params)
        disc_sched = build_lr_schedule(config.lr_scheduler_disc, config.lr_disc, config.lr_scheduler_disc_params)
        clip = config.grad_clip[0] if isinstance(config.grad_clip, (list, tuple)) else config.grad_clip
        accum = int(getattr(config, "grad_accum_steps", 1) or 1)
        skip_nf = bool(getattr(config, "skip_non_finite_grads", False))
        optimizers = {
            "gen": build_optimizer(config.optimizer, gen_sched, config.optimizer_params, clip, accum, skip_nf),
            "disc": build_optimizer(config.optimizer, disc_sched, config.optimizer_params, clip, accum, skip_nf),
        }
        gen_params, disc_params = self.init_params(rng)
        state = TrainState.create({"gen": gen_params, "disc": disc_params}, optimizers)

        generator = self.generator
        discriminator = self.discriminator
        pqmf = self.pqmf
        use_pqmf = self.use_pqmf
        loss_cfg = self.loss_cfg
        d_start = getattr(config, "steps_to_start_discriminator", 0)

        def loss_fn(g_params, d_params, batch, disc_on):
            c, y = batch["mel"], batch["waveform"]  # [B,T,M], [B,T*hop,1]
            y_hat = generator.apply(g_params, c)
            y_hat_sub = y_sub = None
            if use_pqmf:
                y_hat_sub = y_hat
                y_hat = pqmf.synthesis(y_hat_sub)
                y_sub = pqmf.analysis(y)
            # crop to match (transposed convs can overshoot by a few samples);
            # fp32 loss islands like the reference's AMP autocast exclusions
            T = min(y_hat.shape[1], y.shape[1])
            y_hat_c, y_c = y_hat[:, :T].astype(jnp.float32), y[:, :T].astype(jnp.float32)

            # discriminator branch
            sf_d, _ = _run_disc(discriminator, d_params, jax.lax.stop_gradient(y_hat_c))
            sr_d, _ = _run_disc(discriminator, d_params, y_c)
            d_losses = discriminator_loss(sf_d, sr_d)
            # generator branch
            frozen_d = jax.lax.stop_gradient(d_params)
            sf_g, ff_g = _run_disc(discriminator, frozen_d, y_hat_c)
            _, fr_g = _run_disc(discriminator, frozen_d, y_c)
            g_losses = generator_loss(
                loss_cfg,
                y_hat=y_hat_c,
                y=y_c,
                scores_fake=[s * disc_on for s in sf_g] if sf_g else None,
                feats_fake=ff_g,
                feats_real=fr_g,
                y_hat_sub=y_hat_sub,
                y_sub=y_sub,
            )
            total = g_losses["G_gen_loss"] + disc_on * (
                g_losses["G_adv_loss"] + d_losses["D_loss"]
            )
            metrics = {**g_losses, **d_losses, "loss": total}
            return total, metrics

        mixed = is_mixed_precision(config)

        def train_step(state: TrainState, batch, rng_):
            disc_on = (state.step >= d_start).astype(jnp.float32)
            grad_fn = mp_value_and_grad(loss_fn, argnums=(0, 1), has_aux=True, enabled=mixed)
            (_, metrics), (g_grads, d_grads) = grad_fn(
                state.params["gen"], state.params["disc"], batch, disc_on
            )
            state = state.apply_updates(optimizers, {"gen": g_grads, "disc": d_grads})
            return state, metrics

        self._eval_loss_fn = loss_fn
        return train_step, optimizers, state

    def make_eval_step(self, config):
        """Deterministic no-grad eval metrics over a batch."""
        if getattr(self, "_eval_loss_fn", None) is None:
            import jax as _jax

            self.make_train_step(config, _jax.random.PRNGKey(0))
        loss_fn = self._eval_loss_fn

        def eval_step(state: TrainState, batch):
            _, metrics = loss_fn(
                state.params["gen"], state.params["disc"], batch, jnp.float32(1.0)
            )
            return metrics

        return eval_step

    def eval_log(self, batch, state):
        """Trainer hook after eval: vocode one conditioning mel and return
        (figures, audios) for the dashboard (reference ``gan.py eval_log`` →
        ``plot_results``)."""
        import numpy as np

        from tts_tpu.audio.processor import AudioProcessor
        from tts_tpu.utils.visual import plot_results

        if getattr(self, "_eval_ap", None) is None:
            self._eval_ap = AudioProcessor.init_from_config(self.config.audio, verbose=False)
        y_hat = np.asarray(self.generate(state.params["gen"], batch["mel"][:1]))
        y = np.asarray(batch["waveform"][:1])
        # unprefixed keys: the Trainer's dashboard already scopes by "eval"
        figures = plot_results(y_hat, y, self._eval_ap)
        audios = {"audio": y_hat[0].squeeze()}
        return figures, audios

    def get_dataset(self, config, samples, is_eval: bool = False):
        from tts_tpu.vocoder.dataset import GANDataset

        return GANDataset(config, samples, is_eval=is_eval)

    def format_batch(self, batch: dict) -> dict:
        return batch


def _run_disc(disc, params, x):
    """Normalize discriminator outputs to (list_of_scores, list_of_feats)."""
    out = disc.apply(params, x)
    if isinstance(out, tuple) and len(out) == 2:
        scores, feats = out
        if not isinstance(scores, (list, tuple)):
            scores, feats = [scores], [feats]
        return list(scores), list(feats)
    if isinstance(out, tuple) and len(out) == 4:
        # VitsDiscriminator-style (scores_hat, feats_hat, scores_real, feats_real)
        raise ValueError("unexpected discriminator output")
    return [out], [[out]]
