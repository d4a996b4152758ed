"""Training loop (replaces the reference's external coqui `trainer` package;
usage mirrors ``TTS/bin/train_tts.py:58-67``: ``Trainer(args, config,
output_path, model, train_samples, eval_samples).fit()``).

One jitted step per model: single-optimizer models go through the generic
value_and_grad path; GAN models (VITS, vocoder GAN) provide their own fused
step via ``make_train_step``.  Data-parallelism: params replicated over the
mesh, batches sharded on the leading axis, gradients all-reduced by XLA.

Reference-trainer features covered here:
  * deterministic no-grad eval over the full eval set (separate jitted step)
  * best-model tracking (``save_best_after``/``save_all_best``) + rolling
    checkpoint pruning (``save_n_checkpoints``)
  * full-state checkpoints: params + optimizer states + step + best_loss,
    restored by ``--continue_path`` (``--restore_path`` = weights only)
  * gradient accumulation (``grad_accum_steps`` via ``optax.MultiSteps``)
  * bf16 mixed precision (``mixed_precision``; fp32 master params)
  * TensorBoard scalars/figures/audio + per-epoch test-sentence synthesis
    (reference ``train_log``/``test_run``, ``vits.py:1350-1462``)
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import optax

from tts_tpu.parallel import get_mesh, replicate, with_data_parallel
from tts_tpu.trainer.logging import logger_factory
from tts_tpu.trainer.optim import build_lr_schedule, build_optimizer
from tts_tpu.trainer.precision import is_mixed_precision, mp_value_and_grad
from tts_tpu.trainer.state import TrainState
from tts_tpu.utils.io import load_checkpoint_full, save_checkpoint, save_config


@dataclass
class TrainerArgs:
    """CLI-facing args (reference TrainerArgs)."""

    continue_path: str = ""
    restore_path: str = ""
    rank: int = 0
    use_ddp: bool = False  # unused; mesh data-parallel is always on
    grad_accum_steps: int = 1
    skip_train_epoch: bool = False


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
        callbacks: Optional[Dict] = None,
    ):
        from tts_tpu.trainer.callbacks import TrainerCallback

        self.args = args
        self.config = config
        self.output_path = output_path
        self.model = model
        self.train_samples = train_samples
        self.eval_samples = eval_samples or []
        self.callbacks = TrainerCallback(callbacks)
        self.callbacks.on_init_start(self)
        os.makedirs(output_path, exist_ok=True)
        save_config(config, os.path.join(output_path, "config.json"))

        # CLI grad_accum_steps overrides the config (reference TrainerArgs);
        # model-built optimizers read it back off the config
        if args.grad_accum_steps and args.grad_accum_steps > 1:
            config.grad_accum_steps = args.grad_accum_steps
        self.grad_accum = max(1, int(getattr(config, "grad_accum_steps", 1)))
        self.mixed_precision = is_mixed_precision(config)

        mesh_model = max(1, int(getattr(config, "model_axis", 1)))
        self.mesh = get_mesh(data=int(getattr(config, "data_axis", -1)), model=mesh_model)
        self.rng = jax.random.PRNGKey(getattr(config, "seed", 54321))

        # build step fn + state
        if hasattr(type(model), "make_train_step") or hasattr(model, "make_train_step"):
            # model-provided fused step (e.g. GAN models)
            self.train_step_fn, self.optimizers, self.state = model.make_train_step(config, self.rng)
        else:
            self._build_generic_step()
        self._build_eval_step()
        self.state = jax.device_put(self.state, replicate(self.mesh))
        # no buffer donation: eval may reuse the step fn and discard the state
        self._jitted_step = jax.jit(self.train_step_fn)
        self._jitted_eval = jax.jit(self.eval_step_fn) if self.eval_step_fn is not None else None
        self.global_step = int(self.state.step)
        self.best_loss = float("inf")
        self.epochs_done = 0
        self.dashboard = logger_factory(config, output_path)
        self._saved_checkpoints: List[str] = []
        self._restore_if_needed()
        self.callbacks.on_init_end(self)

    # ------------------------------------------------------------------
    def _build_generic_step(self):
        config = self.config
        sched = build_lr_schedule(
            getattr(config, "lr_scheduler", None), config.lr, getattr(config, "lr_scheduler_params", {})
        )
        tx = build_optimizer(
            config.optimizer, sched, getattr(config, "optimizer_params", {}) or {},
            getattr(config, "grad_clip", 0.0), grad_accum=self.grad_accum,
            skip_non_finite=bool(getattr(config, "skip_non_finite_grads", False)),
        )
        self.optimizers = {"model": tx}
        params = self.model.init_params(self.rng)
        self.state = TrainState.create({"model": params}, self.optimizers)
        model = self.model
        optimizers = self.optimizers
        mixed = self.mixed_precision

        def train_step(state: TrainState, batch, rng):
            step_rng = jax.random.fold_in(rng, state.step)
            rngs = {
                "dropout": step_rng,
                "noise": jax.random.fold_in(step_rng, 1),
                "segments": jax.random.fold_in(step_rng, 2),
            }

            def loss_fn(p, batch):
                loss, aux = model.train_step(p, batch, rngs=rngs)
                metrics = {k: v for k, v in aux.items() if k != "outputs"}
                return loss, metrics

            (loss, metrics), grads = mp_value_and_grad(
                loss_fn, argnums=0, has_aux=True, enabled=mixed
            )(state.params["model"], batch)
            state = state.apply_updates(optimizers, {"model": grads})
            metrics["loss"] = loss
            metrics["grad_norm"] = optax.global_norm(grads)
            return state, metrics

        self.train_step_fn = train_step

    def _build_eval_step(self):
        """Deterministic no-grad loss (reference trainer eval loop)."""
        model = self.model
        config = self.config
        self.eval_step_fn = None
        if hasattr(model, "make_eval_step"):
            self.eval_step_fn = model.make_eval_step(config)
            return
        if hasattr(model, "eval_step"):

            def eval_step(state: TrainState, batch):
                loss, aux = model.eval_step(state.params["model"], batch)
                metrics = {k: v for k, v in aux.items() if k != "outputs"}
                metrics["loss"] = loss
                return metrics

            self.eval_step_fn = eval_step
            return
        if hasattr(model, "train_step") and not hasattr(model, "make_train_step"):
            # fallback: run the model loss with train=False semantics if the
            # model's train_step accepts it, else with fixed rngs
            import inspect

            accepts_train = "train" in inspect.signature(model.train_step).parameters
            fixed = jax.random.PRNGKey(0)
            rngs = {
                "dropout": fixed,
                "noise": jax.random.fold_in(fixed, 1),
                "segments": jax.random.fold_in(fixed, 2),
            }

            def eval_step(state: TrainState, batch):
                if accepts_train:
                    loss, aux = model.train_step(
                        state.params["model"], batch, rngs=rngs, train=False
                    )
                else:
                    loss, aux = model.train_step(state.params["model"], batch, rngs=rngs)
                metrics = {k: v for k, v in aux.items() if k != "outputs"}
                metrics["loss"] = loss
                return metrics

            self.eval_step_fn = eval_step

    # ------------------------------------------------------------------
    def _restore_if_needed(self):
        path = self.args.continue_path or self.args.restore_path
        if not path:
            return
        full_resume = bool(self.args.continue_path)
        ckpt = path
        if os.path.isdir(path):
            names = [
                f for f in os.listdir(path)
                if (f.startswith("checkpoint_") or f.startswith("best_model")) and f.endswith(".msgpack")
            ]
            ckpts = sorted(
                (f for f in names if f.startswith("checkpoint_")),
                key=lambda f: int(f.split("_")[1].split(".")[0]),
            )
            if ckpts:
                ckpt = os.path.join(path, ckpts[-1])
            elif "best_model.msgpack" in names:
                ckpt = os.path.join(path, "best_model.msgpack")
            else:
                return
        payload = load_checkpoint_full(ckpt)
        params, meta = payload["params"], payload.get("meta", {})
        if full_resume:
            # exact resume: trees must match
            merged = jax.tree.map(
                lambda t, s: jax.numpy.asarray(s), self.state.params, params
            )
        else:
            # --restore_path transfer learning: copy every leaf whose path
            # exists in the checkpoint with a matching shape, keep the fresh
            # init elsewhere (reference set_init_dict, generic_utils.py:149)
            merged = self._partial_merge(self.state.params, params)
        self.state = self.state.replace(params=merged)
        if full_resume:
            import flax.serialization
            import jax.numpy as jnp

            if "opt_states" in payload:
                try:
                    restored = flax.serialization.from_state_dict(
                        self.state.opt_states, payload["opt_states"]
                    )
                    self.state = self.state.replace(
                        opt_states=jax.tree.map(jnp.asarray, restored)
                    )
                except (KeyError, ValueError) as e:
                    print(f" [!] optimizer state mismatch, restarting optimizer ({e})")
            if "step" in meta:
                self.state = self.state.replace(step=jnp.asarray(meta["step"], jnp.int32))
                self.global_step = int(meta["step"])
            self.best_loss = float(meta.get("best_loss", float("inf")))
            self.epochs_done = int(meta.get("epochs_done", 0))
        print(
            f" > Restored checkpoint {ckpt} at step {self.global_step}"
            + ("" if full_resume else " (weights only)")
        )

    @staticmethod
    def _partial_merge(target, source):
        """Copy checkpoint leaves into the fresh param tree wherever the
        path exists with a matching shape; everything else keeps its init
        (reference partial-restore ``set_init_dict``)."""
        import numpy as _np

        flat_src = {}

        def _flatten(node, path):
            if isinstance(node, dict):
                for k, v in node.items():
                    _flatten(v, path + (k,))
            else:
                flat_src[path] = node

        _flatten(source, ())
        copied = skipped = 0

        def _key(path):
            return tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in path)

        def _merge(path, leaf):
            nonlocal copied, skipped
            src = flat_src.get(_key(path))
            if src is not None and _np.shape(src) == _np.shape(leaf):
                copied += 1
                return jax.numpy.asarray(src)
            skipped += 1
            return leaf

        merged = jax.tree_util.tree_map_with_path(_merge, target)
        print(f" > Partial restore: {copied} tensors copied, {skipped} kept from init")
        return merged

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
            outputs_per_step=int(getattr(self.config, "r", 1) or 1),
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
            # coarser boundaries → fewer distinct shapes → fewer train-step
            # compiles (tiny CI configs set these large to compile once)
            pad_to_multiple_text=getattr(self.config, "pad_to_multiple_text", 16),
            pad_to_multiple_mel=getattr(self.config, "pad_to_multiple_mel", 32),
        )
        ds.preprocess_samples()
        return ds

    def _sample_weights(self, samples) -> Optional[np.ndarray]:
        """Weighted-sampler weights from the config switches (reference
        ``vits.py:1548 get_sampler``)."""
        from tts_tpu.data.samplers import (
            get_language_balancer_weights,
            get_length_balancer_weights,
            get_speaker_balancer_weights,
        )

        config = self.config
        weights = None
        if getattr(config, "use_language_weighted_sampler", False):
            alpha = getattr(config, "language_weighted_sampler_alpha", 1.0)
            weights = get_language_balancer_weights(samples) * alpha
        if getattr(config, "use_speaker_weighted_sampler", False):
            alpha = getattr(config, "speaker_weighted_sampler_alpha", 1.0)
            w = get_speaker_balancer_weights(samples) * alpha
            weights = w if weights is None else weights + w
        if getattr(config, "use_length_weighted_sampler", False):
            alpha = getattr(config, "length_weighted_sampler_alpha", 1.0)
            w = get_length_balancer_weights(samples) * alpha
            weights = w if weights is None else weights + w
        return weights

    def _format_batch(self, batch: dict) -> dict:
        """Numpy-only view, with model-specific key mapping."""
        fmt = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        if hasattr(self.model, "format_batch"):
            fmt = self.model.format_batch(fmt)
        return fmt

    # ------------------------------------------------------------------
    def fit(self):
        config = self.config
        train_ds = self.get_dataset(self.train_samples)
        eval_ds = self.get_dataset(self.eval_samples, is_eval=True) if self.eval_samples else None
        weights = None
        try:
            weights = self._sample_weights(getattr(train_ds, "samples", self.train_samples))
        except (KeyError, ValueError) as e:
            print(f" [!] weighted sampler disabled: {e}")

        try:
            self._fit_epochs(config, train_ds, eval_ds, weights)
        except KeyboardInterrupt:
            # graceful-stop contract (reference trainer ``on_keyboard_interrupt``
            # callback + rank-0 save): persist full state, then exit cleanly
            self.callbacks.on_keyboard_interrupt(self)
            self.save(f"checkpoint_{self.global_step}_interrupted.msgpack")
            print(" > KeyboardInterrupt: saved interrupted-state checkpoint", flush=True)
            self.dashboard.close()
            return self.state
        # final state checkpoint; best_model.msgpack is only written by
        # _track_best so it always holds the best params seen
        if self.best_loss == float("inf"):
            self.save("best_model.msgpack", final=True)
        else:
            self.save(f"checkpoint_{self.global_step}.msgpack")
        self.dashboard.close()
        return self.state

    def _fit_epochs(self, config, train_ds, eval_ds, weights):
        for epoch in range(self.epochs_done, config.epochs):
            self.callbacks.on_epoch_start(self)
            if hasattr(self.model, "on_epoch_start") and self.model.on_epoch_start(self):
                # schedule changed static shapes (e.g. Tacotron gradual-
                # training r): re-jit so the step retraces the new module
                self._jitted_step = jax.jit(self.train_step_fn)
                if self.eval_step_fn is not None:
                    self._jitted_eval = jax.jit(self.eval_step_fn)
                new_r = int(getattr(config, "r", 1) or 1)
                for ds in (train_ds, eval_ds):
                    if ds is not None and hasattr(ds, "outputs_per_step"):
                        ds.outputs_per_step = new_r
            if not self.args.skip_train_epoch:
                self._train_epoch(train_ds, epoch, weights)
            self.epochs_done = epoch + 1
            eval_avg = None
            if eval_ds is not None and getattr(config, "run_eval", True):
                eval_avg = self.evaluate(eval_ds)
            self._track_best(eval_avg)
            if epoch >= getattr(config, "test_delay_epochs", 0):
                self.test_run()
            self.callbacks.on_epoch_end(self)
            self.dashboard.flush()

    def _train_epoch(self, train_ds, epoch: int, weights: Optional[np.ndarray]):
        config = self.config
        keep_avg = KeepAverage()
        epoch_start = time.time()
        self._last_train_avg = keep_avg
        batch_kwargs = dict(shuffle=True, seed=epoch)
        try:
            import inspect

            supported = inspect.signature(train_ds.batches).parameters
            if weights is not None and "weights" in supported:
                batch_kwargs["weights"] = weights
            workers = int(getattr(config, "num_loader_workers", 0))
            if workers > 0 and "num_workers" in supported:
                batch_kwargs["num_workers"] = workers
                mode = getattr(config, "loader_worker_mode", "thread")
                if mode and "worker_mode" in supported:
                    batch_kwargs["worker_mode"] = mode
        except (TypeError, ValueError):
            pass
        for batch in train_ds.batches(config.batch_size, **batch_kwargs):
            step_start = time.time()
            self.callbacks.on_train_step_start(self)
            batch = self._format_batch(batch)
            batch = with_data_parallel(self.mesh, batch)
            self.state, metrics = self._jitted_step(self.state, batch, self.rng)
            self.global_step += 1
            self.callbacks.on_train_step_end(self)
            if self.global_step % config.print_step == 0:
                host_metrics = {k: float(v) for k, v in metrics.items()}
                host_metrics["step_time"] = time.time() - step_start
                keep_avg.update(host_metrics)
                ms = " - ".join(f"{k}: {v:.4f}" for k, v in sorted(host_metrics.items()))
                print(f" > step {self.global_step}: {ms}", flush=True)
                self.dashboard.add_scalars("train", host_metrics, self.global_step)
            if (
                getattr(config, "save_checkpoints", True)
                and config.save_step > 0
                and self.global_step % config.save_step == 0
            ):
                self.save(f"checkpoint_{self.global_step}.msgpack")
        print(
            f" > epoch {epoch} done in {time.time() - epoch_start:.1f}s "
            f"({self.global_step} steps)",
            flush=True,
        )

    def evaluate(self, eval_ds) -> Optional[float]:
        """Deterministic no-grad loss over the FULL eval set; returns the
        average 'loss' (used for best-model tracking)."""
        if self._jitted_eval is None:
            return None
        keep_avg = KeepAverage()
        bs = max(1, getattr(self.config, "eval_batch_size", 8))
        last_batch = None
        for batch in eval_ds.batches(bs, shuffle=False):
            batch = self._format_batch(batch)
            batch = with_data_parallel(self.mesh, batch)
            metrics = self._jitted_eval(self.state, batch)
            keep_avg.update({k: float(v) for k, v in metrics.items()})
            last_batch = batch
        if not keep_avg.avg:
            return None
        if last_batch is not None and hasattr(self.model, "eval_log"):
            try:
                figures, audios = self.model.eval_log(last_batch, self.state)
                if figures:
                    self.dashboard.add_figures("eval", figures, self.global_step)
                if audios:
                    self.dashboard.add_audios(
                        "eval", audios, self.global_step, self.config.audio.sample_rate
                    )
            except Exception as e:  # never kill training on a logging hook
                print(f" [!] eval_log failed: {e}")
        print(
            " > eval: " + " - ".join(f"{k}: {v:.4f}" for k, v in sorted(keep_avg.avg.items())),
            flush=True,
        )
        self.dashboard.add_scalars("eval", keep_avg.avg, self.global_step)
        return keep_avg.avg.get("loss")

    def _track_best(self, eval_avg: Optional[float]):
        """Best-model selection (reference ``save_best_after`` semantics)."""
        config = self.config
        target = eval_avg
        if target is None:
            target = getattr(self, "_last_train_avg", None)
            target = target.avg.get("loss") if target and target.avg else None
        if target is None:
            return
        if target < self.best_loss:
            self.best_loss = float(target)
            if self.global_step >= getattr(config, "save_best_after", 0):
                self.save("best_model.msgpack", final=True)
                if getattr(config, "save_all_best", False):
                    self.save(f"best_model_{self.global_step}.msgpack", final=True)
                print(f" > new best loss {self.best_loss:.4f}", flush=True)

    # ------------------------------------------------------------------
    def test_run(self):
        """Synthesize ``config.test_sentences`` and push audio + figures to
        the dashboard (reference ``base_tts.py:380 test_run``)."""
        sentences = getattr(self.config, "test_sentences", None)
        model = self.model
        if not sentences or not hasattr(model, "inference") or getattr(model, "tokenizer", None) is None:
            return
        from tts_tpu.utils.synthesis import synthesis
        from tts_tpu.utils.visual import plot_alignment, plot_spectrogram

        try:
            from tts_tpu.audio.processor import AudioProcessor

            ap = getattr(model, "ap", None) or AudioProcessor.init_from_config(
                self.config.audio, verbose=False
            )
        except (AttributeError, TypeError):
            ap = None
        params = self.state.params.get("model") or self.state.params.get("gen")
        if params is None:
            return
        audios, figures = {}, {}
        for i, sent in enumerate(sentences[:3]):
            if isinstance(sent, (list, tuple)):
                sent = sent[0]
            try:
                out = synthesis(model, str(sent), params, use_griffin_lim=True, ap=ap)
            except Exception as e:  # never kill training on a test sentence
                print(f" [!] test_run failed on sentence {i}: {e}")
                continue
            if out.get("wav") is not None:
                audios[f"test_{i}/audio"] = out["wav"]
            mo = out.get("model_outputs")
            if mo is not None and np.asarray(mo).ndim == 2 and np.asarray(mo).shape[-1] > 1:
                figures[f"test_{i}/spectrogram"] = plot_spectrogram(mo)
            align = out.get("outputs", {}).get("alignments")
            if align is not None:
                figures[f"test_{i}/alignment"] = plot_alignment(np.asarray(align))
        if audios and ap is not None:
            self.dashboard.add_audios("test", audios, self.global_step, ap.sample_rate)
        if figures:
            self.dashboard.add_figures("test", figures, self.global_step)

    # ------------------------------------------------------------------
    def save(self, filename: str, final: bool = False):
        path = os.path.join(self.output_path, filename)
        params = jax.device_get(self.state.params)
        opt_states = jax.device_get(self.state.opt_states)
        save_checkpoint(
            path,
            params,
            config=self.config,
            meta={
                "step": self.global_step,
                "best_loss": self.best_loss,
                "epochs_done": self.epochs_done,
            },
            opt_states=opt_states,
        )
        print(f" > Saved checkpoint {path}", flush=True)
        if not final and filename.startswith("checkpoint_"):
            self._saved_checkpoints.append(path)
            keep = max(1, int(getattr(self.config, "save_n_checkpoints", 5)))
            while len(self._saved_checkpoints) > keep:
                victim = self._saved_checkpoints.pop(0)
                try:
                    os.remove(victim)
                    print(f" > Pruned old checkpoint {victim}", flush=True)
                except OSError:
                    pass
