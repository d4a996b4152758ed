"""DelightfulTTS — prosody-rich E2E TTS with joint HiFiGAN vocoder
(reference ``TTS/tts/models/delightful_tts.py`` +
``layers/delightful_tts/*``).

Acoustic model: the reference-depth :class:`AcousticModel`
(``acoustic_model.py`` — conformer encoder/decoder with relative-position
attention and Conv1dGLU speaker conditioning, CoordConv+GRU reference
encoders with style-token utterance prosody and attention-based phoneme
prosody, BSConv variance adaptors), weight-compatible with converted
reference checkpoints.  The waveform head is the shared HiFiGAN generator
trained jointly with the fused GAN step over random mel segments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tts_tpu.layers import losses as L
from tts_tpu.vocoder.models.hifigan_generator import HifiganGenerator

from .acoustic_model import AcousticModel
from .config import DelightfulTTSConfig


class DelightfulTTS:
    """Host wrapper: acoustic model + joint HiFiGAN vocoder."""

    def __init__(self, config: DelightfulTTSConfig):
        self.config = config
        self.args = config.model_args
        self.acoustic_model = AcousticModel(args=self.args, num_mels=config.audio.num_mels)
        v = config.vocoder
        self.vocoder = HifiganGenerator(
            in_channels=config.audio.num_mels,
            out_channels=1,
            resblock_type=v.resblock_type_decoder,
            resblock_dilation_sizes=tuple(map(tuple, v.resblock_dilation_sizes_decoder)),
            resblock_kernel_sizes=tuple(v.resblock_kernel_sizes_decoder),
            upsample_kernel_sizes=tuple(v.upsample_kernel_sizes_decoder),
            upsample_initial_channel=v.upsample_initial_channel_decoder,
            upsample_factors=tuple(v.upsample_rates_decoder),
        )
        from tts_tpu.models.vits.modules import VitsDiscriminator

        self.discriminator = VitsDiscriminator(
            periods=tuple(v.periods_discriminator),
            width_mult=v.discriminator_width_mult,
        )

    @classmethod
    def init_from_config(cls, config: DelightfulTTSConfig, samples=None):
        from tts_tpu.models.base import init_tokenizer

        tokenizer, config = init_tokenizer(config)
        model = cls(config)
        model.tokenizer = tokenizer
        return model

    def init_params(self, rng, t_en: int = 11, t_de: int = 40):
        M = self.config.audio.num_mels
        a = self.args
        r1, r2, r3 = jax.random.split(rng, 3)
        kw = {}
        if a.use_d_vector_file:
            kw["d_vectors"] = jnp.zeros((1, a.d_vector_dim))
        elif a.use_speaker_embedding and a.num_speakers > 0:
            kw["speaker_idx"] = jnp.zeros((1,), jnp.int32)

        def _init(rng_):
            return self.acoustic_model.init(
                {"params": rng_, "dropout": r2},
                jnp.zeros((1, t_en), jnp.int32),
                jnp.full((1,), t_en, jnp.int32),
                jnp.zeros((1, t_de, M)),
                jnp.full((1,), t_de, jnp.int32),
                jnp.zeros((1, t_de, 1)),
                jnp.zeros((1, t_de, 1)),
                **kw,
            )

        acoustic = jax.jit(_init)(r1)
        voc = self.vocoder.init(r3, jnp.zeros((1, 8, M)))
        return {"acoustic": acoustic, "vocoder": voc}

    def forward(self, params, batch, train: bool = False, rngs=None):
        B, T_de = batch["mel_input"].shape[:2]
        pitch = batch.get("pitch")
        energy = batch.get("energy")
        if pitch is None:
            pitch = jnp.zeros((B, T_de, 1))
        if energy is None:
            energy = jnp.zeros((B, T_de, 1))
        return self.acoustic_model.apply(
            params["acoustic"],
            batch["text_input"],
            batch["text_lengths"],
            batch["mel_input"],
            batch["mel_lengths"],
            pitch,
            energy,
            attn_priors=batch.get("attn_priors"),
            d_vectors=batch.get("d_vectors"),
            speaker_idx=batch.get("speaker_ids"),
            train=train,
            rngs=rngs,
        )

    def train_step(self, params, batch, rngs=None, train: bool = True):
        """Acoustic losses (GAN vocoder training runs via the GAN wrapper on
        mel segments; reference trains both jointly — composed in the
        Trainer with the fused step in a follow-up)."""
        outputs = self.forward(params, batch, train=train, rngs=rngs)
        c = self.config
        mel, mel_lens, text_lens = batch["mel_input"], batch["mel_lengths"], batch["text_lengths"]
        l_mel = L.l1_loss_masked(outputs["model_outputs"], mel, mel_lens)
        l_dur = L.mse_loss_masked(
            outputs["dr_log_pred"][:, :, None],
            outputs["dr_log_target"][:, :, None],
            text_lens,
        )
        l_pitch = L.mse_loss_masked(
            outputs["pitch_pred"][:, :, None], outputs["pitch_target"][:, :, None], text_lens
        )
        l_energy = L.mse_loss_masked(
            outputs["energy_pred"][:, :, None], outputs["energy_target"][:, :, None], text_lens
        )
        l_u = jnp.mean((outputs["u_prosody_pred"] - jax.lax.stop_gradient(outputs["u_prosody_ref"])) ** 2)
        l_p = jnp.mean((outputs["p_prosody_pred"] - jax.lax.stop_gradient(outputs["p_prosody_ref"])) ** 2)
        l_align = L.forward_sum_loss(outputs["aligner_logprob"], text_lens, mel_lens)
        l_bin = L.binary_alignment_loss(outputs["aligner_mas"], outputs["aligner_soft"])
        loss = (
            l_mel * c.mel_loss_alpha / 45.0
            + l_dur * c.dur_loss_alpha
            + l_pitch * c.pitch_loss_alpha
            + l_energy * c.energy_loss_alpha
            + l_u * c.u_prosody_loss_alpha
            + l_p * c.p_prosody_loss_alpha
            + l_align * c.aligner_loss_alpha
            + l_bin * c.binary_align_loss_alpha
        )
        return loss, {
            "loss": loss, "loss_mel": l_mel, "loss_dur": l_dur, "loss_pitch": l_pitch,
            "loss_energy": l_energy, "loss_u_prosody": l_u, "loss_p_prosody": l_p,
            "loss_aligner": l_align, "loss_binary": l_bin, "outputs": outputs,
        }

    def make_train_step(self, config, rng):
        """Trainer hook: fused joint acoustic+vocoder GAN step
        (see ``delightful_tts/train.py``; reference sequences two optimizer
        steps, ``delightful_tts.py:919``)."""
        from .train import create_train_state, make_train_step

        state = create_train_state(self, config, rng)
        step_fn, eval_fn, optimizers = make_train_step(self, config)
        self._eval_step_fn = eval_fn
        return step_fn, optimizers, state

    def make_eval_step(self, config):
        if getattr(self, "_eval_step_fn", None) is None:
            from .train import make_train_step

            _, self._eval_step_fn, _ = make_train_step(self, config)
        return self._eval_step_fn

    def inference(self, params, x, x_lengths, aux_input=None, max_frames: int = 500):
        aux_input = aux_input or {}
        out = self.acoustic_model.apply(
            params["acoustic"], x, x_lengths,
            d_vectors=aux_input.get("d_vectors"),
            speaker_idx=aux_input.get("speaker_ids"),
            max_frames=max_frames,
            method=self.acoustic_model.inference,
        )
        wav = self.vocoder.apply(params["vocoder"], out["model_outputs"])
        out["waveform"] = wav
        return out
