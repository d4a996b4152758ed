"""Training loop (replaces the reference's external coqui `trainer` package;
usage mirrors ``TTS/bin/train_tts.py:58-67``: ``Trainer(args, config,
output_path, model, train_samples, eval_samples).fit()``).

One jitted step per model: single-optimizer models go through the generic
value_and_grad path; GAN models (VITS, vocoder GAN) provide their own fused
step via ``make_train_step``.  Data-parallelism: params replicated over the
mesh, batches sharded on the leading axis, gradients all-reduced by XLA.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

from tts_tpu.parallel import get_mesh, replicate, with_data_parallel
from tts_tpu.trainer.optim import build_lr_schedule, build_optimizer
from tts_tpu.trainer.state import TrainState
from tts_tpu.utils.io import save_checkpoint, save_config


@dataclass
class TrainerArgs:
    """CLI-facing args (reference TrainerArgs)."""

    continue_path: str = ""
    restore_path: str = ""
    rank: int = 0
    use_ddp: bool = False  # unused; mesh data-parallel is always on
    grad_accum_steps: int = 1


class KeepAverage:
    """Running means of scalar metrics (reference ``generic_utils.py:185``)."""

    def __init__(self):
        self.avg: Dict[str, float] = {}
        self.n: Dict[str, int] = {}

    def update(self, values: Dict[str, float]):
        for k, v in values.items():
            if k not in self.avg:
                self.avg[k] = float(v)
                self.n[k] = 1
            else:
                self.n[k] += 1
                self.avg[k] += (float(v) - self.avg[k]) / self.n[k]


class Trainer:
    """Generic training runtime."""

    def __init__(
        self,
        args: TrainerArgs,
        config,
        output_path: str,
        model,
        train_samples: List[dict],
        eval_samples: Optional[List[dict]] = None,
        training_assets: Optional[Dict] = None,
    ):
        self.args = args
        self.config = config
        self.output_path = output_path
        self.model = model
        self.train_samples = train_samples
        self.eval_samples = eval_samples or []
        os.makedirs(output_path, exist_ok=True)
        save_config(config, os.path.join(output_path, "config.json"))

        self.mesh = get_mesh(data=-1, model=1)
        self.rng = jax.random.PRNGKey(getattr(config, "seed", 54321))

        # build step fn + state
        if hasattr(type(model), "make_train_step") or hasattr(model, "make_train_step"):
            # model-provided fused step (e.g. GAN models)
            self.train_step_fn, self.optimizers, self.state = model.make_train_step(config, self.rng)
        else:
            self._build_generic_step()
        self.state = jax.device_put(self.state, replicate(self.mesh))
        # no buffer donation: eval reuses the step fn and discards the state
        self._jitted_step = jax.jit(self.train_step_fn)
        self.global_step = int(self.state.step)
        self.best_loss = float("inf")
        self._restore_if_needed()

    # ------------------------------------------------------------------
    def _build_generic_step(self):
        config = self.config
        sched = build_lr_schedule(
            getattr(config, "lr_scheduler", None), config.lr, getattr(config, "lr_scheduler_params", {})
        )
        tx = build_optimizer(
            config.optimizer, sched, getattr(config, "optimizer_params", {}) or {},
            getattr(config, "grad_clip", 0.0),
        )
        self.optimizers = {"model": tx}
        params = self.model.init_params(self.rng)
        self.state = TrainState.create({"model": params}, self.optimizers)
        model = self.model
        optimizers = self.optimizers

        def train_step(state: TrainState, batch, rng):
            step_rng = jax.random.fold_in(rng, state.step)
            rngs = {
                "dropout": step_rng,
                "noise": jax.random.fold_in(step_rng, 1),
                "segments": jax.random.fold_in(step_rng, 2),
            }

            def loss_fn(p):
                loss, aux = model.train_step(p, batch, rngs=rngs)
                metrics = {k: v for k, v in aux.items() if k != "outputs"}
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params["model"]
            )
            state = state.apply_updates(optimizers, {"model": grads})
            metrics["loss"] = loss
            return state, metrics

        self.train_step_fn = train_step

    def _restore_if_needed(self):
        path = self.args.continue_path or self.args.restore_path
        if not path:
            return
        ckpt = path
        if os.path.isdir(path):
            ckpts = sorted(
                (f for f in os.listdir(path) if f.startswith("checkpoint_") and f.endswith(".msgpack")),
                key=lambda f: int(f.split("_")[1].split(".")[0]),
            )
            if not ckpts:
                return
            ckpt = os.path.join(path, ckpts[-1])
        from tts_tpu.utils.io import load_checkpoint
        import flax.serialization

        params, _, meta = load_checkpoint(ckpt)
        # restore parameters into the live state (optimizer state restarts
        # unless the checkpoint carries it; reference --restore_path behaves
        # the same for model weights)
        self.state = self.state.replace(params=jax.tree.map(lambda t, s: jax.numpy.asarray(s), self.state.params, params))
        if "step" in meta:
            import jax.numpy as jnp

            self.state = self.state.replace(step=jnp.asarray(meta["step"], jnp.int32))
            self.global_step = int(meta["step"])
        print(f" > Restored checkpoint {ckpt} at step {self.global_step}")

    # ------------------------------------------------------------------
    def get_dataset(self, samples, is_eval: bool = False):
        if hasattr(self.model, "get_dataset"):
            return self.model.get_dataset(self.config, samples, is_eval)
        from tts_tpu.audio.processor import AudioProcessor
        from tts_tpu.data.dataset import TTSDataset

        ap = AudioProcessor.init_from_config(self.config.audio, verbose=False)
        tokenizer = getattr(self.model, "tokenizer", None)
        speaker_manager = getattr(self.model, "speaker_manager", None)
        language_manager = getattr(self.model, "language_manager", None)
        ds = TTSDataset(
            samples=samples,
            ap=ap,
            tokenizer=tokenizer,
            speaker_id_mapping=speaker_manager.name_to_id if speaker_manager else None,
            language_id_mapping=language_manager.name_to_id if language_manager else None,
            d_vector_mapping=(
                speaker_manager.embeddings
                if speaker_manager and getattr(self.config, "use_d_vector_file", False)
                else None
            ),
            compute_linear_spec=getattr(self.config, "compute_linear_spec", False),
            return_wav=getattr(self.config, "return_wav", False),
            compute_f0=getattr(self.config, "compute_f0", False),
            compute_energy=getattr(self.config, "compute_energy", False),
            min_text_len=getattr(self.config, "min_text_len", 0),
            max_text_len=getattr(self.config, "max_text_len", float("inf")),
            min_audio_len=getattr(self.config, "min_audio_len", 0),
            max_audio_len=getattr(self.config, "max_audio_len", float("inf")),
        )
        ds.preprocess_samples()
        return ds

    def _format_batch(self, batch: dict) -> dict:
        """Numpy-only view, with model-specific key mapping."""
        fmt = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        if hasattr(self.model, "format_batch"):
            fmt = self.model.format_batch(fmt)
        return fmt

    def fit(self):
        config = self.config
        train_ds = self.get_dataset(self.train_samples)
        eval_ds = self.get_dataset(self.eval_samples, is_eval=True) if self.eval_samples else None
        keep_avg = KeepAverage()

        for epoch in range(config.epochs):
            epoch_start = time.time()
            for batch in train_ds.batches(config.batch_size, shuffle=True, seed=epoch):
                batch = self._format_batch(batch)
                batch = with_data_parallel(self.mesh, batch)
                self.state, metrics = self._jitted_step(self.state, batch, self.rng)
                self.global_step += 1
                if self.global_step % config.print_step == 0:
                    host_metrics = {k: float(v) for k, v in metrics.items()}
                    keep_avg.update(host_metrics)
                    ms = " - ".join(f"{k}: {v:.4f}" for k, v in sorted(host_metrics.items()))
                    print(f" > step {self.global_step}: {ms}", flush=True)
                if config.save_step > 0 and self.global_step % config.save_step == 0:
                    self.save(f"checkpoint_{self.global_step}.msgpack")
            print(
                f" > epoch {epoch} done in {time.time() - epoch_start:.1f}s "
                f"({self.global_step} steps)",
                flush=True,
            )
            if eval_ds is not None and getattr(config, "run_eval", True):
                self.evaluate(eval_ds)
        self.save("best_model.msgpack")
        return self.state

    def evaluate(self, eval_ds):
        # eval shares the jitted step's loss path but without updates: run
        # the loss on one eval batch for monitoring
        for batch in eval_ds.batches(
            max(1, getattr(self.config, "eval_batch_size", 8)), shuffle=False
        ):
            batch = self._format_batch(batch)
            batch = with_data_parallel(self.mesh, batch)
            _, metrics = self._jitted_step(self.state, batch, self.rng)
            print(
                " > eval: "
                + " - ".join(f"{k}: {float(v):.4f}" for k, v in sorted(metrics.items())),
                flush=True,
            )
            break

    def save(self, filename: str):
        path = os.path.join(self.output_path, filename)
        params = jax.device_get(self.state.params)
        save_checkpoint(path, params, config=self.config, meta={"step": self.global_step})
        print(f" > Saved checkpoint {path}", flush=True)
