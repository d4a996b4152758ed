"""XTTS GPT fine-tuning (reference
``TTS/tts/layers/xtts/trainer/gpt_trainer.py:69`` GPTTrainer).

Loss = weighted text CE + mel-code CE; audio codes are extracted on the
fly by the (frozen) DVAE; conditioning mels computed from reference audio.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tts_tpu.trainer.optim import build_lr_schedule, build_optimizer
from tts_tpu.trainer.precision import is_mixed_precision, mp_value_and_grad
from tts_tpu.trainer.state import TrainState

from .dvae import DiscreteVAE
from .model import Xtts, wav_to_mel_cloning


def _masked_ce(logits, targets, lengths):
    """Cross entropy over valid positions (+1 for the stop token)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], -1)[..., 0]
    mask = jnp.arange(targets.shape[1])[None] <= lengths[:, None]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


class _ByteTokenizer:
    """Minimal corpus tokenizer for fine-tune smoke runs without a BPE
    vocab file: UTF-8 bytes folded into the text-token id range (ids 0/1
    reserved for stop/unk like the reference vocab)."""

    def __init__(self, num_text_tokens: int):
        self.n = int(num_text_tokens)

    def encode(self, text: str, lang: str):
        return [2 + (b % (self.n - 2)) for b in text.encode("utf-8")]


class GPTTrainer:
    """Host wrapper implementing the trainer-model contract for XTTS GPT
    fine-tuning."""

    def __init__(self, config):
        self.config = config
        self.xtts = Xtts(config)
        self.dvae = DiscreteVAE(
            channels=80,
            num_tokens=config.model_args.gpt_num_audio_tokens - 2,
            codebook_dim=512,
            hidden_dim=512,
        )
        self.dvae_params = None
        self.text_ce_weight = getattr(config, "gpt_loss_text_ce_weight", 0.01)
        self.mel_ce_weight = getattr(config, "gpt_loss_mel_ce_weight", 1.0)

    @classmethod
    def init_from_config(cls, config, samples=None):
        return cls(config)

    def get_dataset(self, config, samples, is_eval: bool = False):
        """Trainer hook: real-corpus fine-tune batches (reference
        ``xtts/trainer/dataset.py`` XTTSDataset)."""
        from .dataset import XTTSDataset

        tokenizer = getattr(self.xtts, "tokenizer", None)
        if tokenizer is None or getattr(tokenizer, "tokenizer", True) is None:
            tok_file = getattr(config.model_args, "tokenizer_file", None)
            if tok_file:
                from .tokenizer import VoiceBpeTokenizer

                tokenizer = VoiceBpeTokenizer(tok_file)
            else:
                tokenizer = _ByteTokenizer(config.model_args.gpt_number_text_tokens)
        return XTTSDataset(
            config,
            samples,
            tokenizer,
            sample_rate=getattr(config.audio, "sample_rate", 22050),
            is_eval=is_eval,
        )

    def init_params(self, rng, t_text: int = 16, t_mel: int = 64, t_cond: int = 64):
        r1, r2 = jax.random.split(rng)
        self.xtts.init_params(r1, t_text=t_text, t_codes=t_mel // 4, t_cond=t_cond)
        self.dvae_params = self.dvae.init(r2, jnp.zeros((1, t_mel, 80)))
        return {"gpt": self.xtts.gpt_params, "dvae": self.dvae_params}

    def extract_codes(self, dvae_params, mel: jnp.ndarray) -> jnp.ndarray:
        return self.dvae.apply(dvae_params, mel, method=self.dvae.get_codebook_indices)

    def loss_fn(self, gpt_params, dvae_params, batch, train: bool = True,
                core_fn=None):
        """``core_fn(gpt_params, h) -> h`` overrides the transformer core —
        the sequence-parallel path injects a shard_map'd ring-attention
        core here while embeddings/heads stay data-parallel."""
        mel = batch["mel_input"]  # [B, T, 80] cloning-domain mel
        codes = jax.lax.stop_gradient(self.extract_codes(dvae_params, mel))
        code_lengths = batch["mel_lengths"] // 4
        gpt = self.xtts.gpt
        if core_fn is None:
            out = gpt.apply(
                gpt_params,
                batch["text_input"],
                batch["text_lengths"],
                codes,
                code_lengths,
                cond_mels=batch["cond_mels"],
                train=train,
            )
        else:
            h, aux = gpt.apply(
                gpt_params,
                batch["text_input"],
                batch["text_lengths"],
                codes,
                code_lengths,
                cond_mels=batch["cond_mels"],
                method=gpt.build_sequence,
            )
            h = core_fn(gpt_params, h)
            out = gpt.apply(gpt_params, h, method=gpt.finalize, **aux)
        text_ce = _masked_ce(out["text_logits"], out["text_targets"], batch["text_lengths"])
        mel_ce = _masked_ce(out["mel_logits"], out["mel_targets"], code_lengths)
        loss = self.text_ce_weight * text_ce + self.mel_ce_weight * mel_ce
        return loss, {"loss": loss, "loss_text_ce": text_ce, "loss_mel_ce": mel_ce}

    def make_seq_parallel_core(self, mesh, seq_axis: str = "seq"):
        """Transformer core under ``shard_map``: sequence sharded over
        ``seq_axis``, batch over ``data``, ring attention rotating K/V
        (the sequence-parallel capability the reference lacks — SURVEY §5).
        Returns ``core_fn`` for :meth:`loss_fn`."""
        from jax.sharding import PartitionSpec as P

        from tts_tpu.parallel import shard_map_compat

        from .gpt_core import GPT2Core

        a = self.config.model_args
        core = GPT2Core(
            layers=a.gpt_layers, dim=a.gpt_n_model_channels, heads=a.gpt_n_heads,
            use_pallas=False, remat=a.gpt_use_remat, seq_axis=seq_axis,
        )
        n_seq = mesh.shape[seq_axis]

        def core_fn(gpt_params, h):
            T = h.shape[1]
            pad = (-T) % n_seq
            hp = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
            sub = {"params": gpt_params["params"]["gpt"]}
            fn = shard_map_compat(
                lambda p, x: core.apply(p, x)[0],
                mesh,
                in_specs=(P(), P("data", seq_axis, None)),
                out_specs=P("data", seq_axis, None),
            )
            return fn(sub, hp)[:, :T]

        return core_fn

    def make_train_step(self, config, rng, mesh=None):
        """``mesh`` (with ``data``/``seq`` axes) is required when
        ``config.model_args.gpt_seq_parallel`` is set; the GPT core then
        runs sequence-parallel (ring attention) under shard_map."""
        params = self.init_params(rng)
        sched = build_lr_schedule(
            getattr(config, "lr_scheduler", None), getattr(config, "lr", 5e-6),
            getattr(config, "lr_scheduler_params", {}),
        )
        tx = build_optimizer(
            getattr(config, "optimizer", "adamw"), sched,
            getattr(config, "optimizer_params", {}) or {},
            getattr(config, "grad_clip", 0.0),
            grad_accum=int(getattr(config, "grad_accum_steps", 1) or 1),
            skip_non_finite=bool(getattr(config, "skip_non_finite_grads", False)),
        )
        optimizers = {"gpt": tx}
        state = TrainState.create({"gpt": params["gpt"]}, optimizers)
        dvae_params = params["dvae"]
        self._dvae_params = dvae_params
        mixed = is_mixed_precision(config)

        core_fn = None
        if getattr(config.model_args, "gpt_seq_parallel", False):
            if mesh is None:
                raise ValueError(
                    "gpt_seq_parallel=True needs a mesh with 'data' and "
                    "'seq' axes (tts_tpu.parallel.get_mesh(data=…, seq=…))"
                )
            core_fn = self.make_seq_parallel_core(mesh)

        def train_step(state: TrainState, batch, rng_):
            (loss, metrics), grads = mp_value_and_grad(
                lambda p, b: self.loss_fn(p, dvae_params, b, core_fn=core_fn),
                has_aux=True, enabled=mixed
            )(state.params["gpt"], batch)
            state = state.apply_updates(optimizers, {"gpt": grads})
            return state, metrics

        return train_step, optimizers, state

    def make_eval_step(self, config):
        """Deterministic no-grad text/mel-CE over a batch."""
        if getattr(self, "_dvae_params", None) is None:
            import jax as _jax

            self.make_train_step(config, _jax.random.PRNGKey(0))
        dvae_params = self._dvae_params

        def eval_step(state: TrainState, batch):
            _, metrics = self.loss_fn(state.params["gpt"], dvae_params, batch, train=False)
            return metrics

        return eval_step
