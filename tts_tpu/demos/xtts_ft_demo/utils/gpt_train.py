"""XTTS GPT fine-tuning glue for the demo
(reference ``TTS/demos/xtts_ft_demo/utils/gpt_train.py``).

Builds the dataset config + ``GPTTrainer`` + ``Trainer`` and runs the
fine-tune.  Pretrained weights come from a local XTTS checkpoint: a torch
``model.pth`` (converted on the fly via ``utils/convert.py``) or an
already-converted ``.msgpack``; with neither, training starts from random
init (smoke-test mode — the reference always fine-tunes from the zoo
checkpoint it downloads, which a zero-egress environment cannot)."""

from __future__ import annotations

import os
from typing import Optional, Tuple


def train_gpt(
    language: str,
    num_epochs: int,
    batch_size: int,
    grad_acumm: int,
    train_csv: str,
    eval_csv: str,
    output_path: str,
    xtts_checkpoint: Optional[str] = None,
    tokenizer_file: Optional[str] = None,
    lr: float = 5e-6,
    tiny: bool = False,
) -> Tuple[str, str]:
    """Returns (run_config_path, best_checkpoint_path)."""
    import jax

    from tts_tpu.data import load_tts_samples
    from tts_tpu.models.xtts import XttsArgs, XttsConfig
    from tts_tpu.models.xtts.trainer import GPTTrainer
    from tts_tpu.trainer.trainer import Trainer, TrainerArgs

    out_path = os.path.join(output_path, "run", "training")
    os.makedirs(out_path, exist_ok=True)

    config = XttsConfig()
    if tiny:
        # smoke-scale GPT for tests / dry runs
        config.model_args = XttsArgs(
            gpt_layers=1, gpt_n_model_channels=32, gpt_n_heads=2,
            gpt_number_text_tokens=40, gpt_num_audio_tokens=18,
            gpt_start_audio_token=16, gpt_stop_audio_token=17,
            gpt_start_text_token=38, gpt_stop_text_token=0,
            gpt_max_text_tokens=200, gpt_max_audio_tokens=256,
            decoder_input_dim=32,
        )
    if tokenizer_file:
        config.model_args.tokenizer_file = tokenizer_file
    config.epochs = num_epochs
    config.batch_size = batch_size
    config.eval_batch_size = batch_size
    config.grad_accum_steps = grad_acumm
    config.lr = lr
    config.optimizer = "adamw"
    config.optimizer_params = {"betas": [0.9, 0.96], "eps": 1e-8, "weight_decay": 1e-2}
    config.lr_scheduler = None
    config.print_step = 1
    config.save_step = 1000
    config.run_eval = True
    config.datasets = [
        {
            "formatter": "coqui",
            "dataset_name": "ft_dataset",
            "path": os.path.dirname(train_csv),
            "meta_file_train": os.path.basename(train_csv),
            "meta_file_val": os.path.basename(eval_csv),
            "language": language,
        }
    ]

    train_samples, eval_samples = load_tts_samples(
        config.datasets, eval_split=True
    )

    model = GPTTrainer.init_from_config(config)
    trainer = Trainer(
        TrainerArgs(grad_accum_steps=grad_acumm),
        config,
        out_path,
        model=model,
        train_samples=train_samples,
        eval_samples=eval_samples,
    )

    if xtts_checkpoint:
        _load_pretrained(trainer, model, xtts_checkpoint)

    trainer.fit()

    best = os.path.join(out_path, "best_model.msgpack")
    if not os.path.isfile(best):
        cands = sorted(f for f in os.listdir(out_path) if f.endswith(".msgpack"))
        best = os.path.join(out_path, cands[-1]) if cands else best
    return os.path.join(out_path, "config.json"), best


def _load_pretrained(trainer, model, checkpoint: str) -> None:
    """Load pretrained GPT weights into the live train state."""
    import jax
    import jax.numpy as jnp

    if checkpoint.endswith(".pth"):
        from tts_tpu.utils.convert import convert_xtts_gpt, load_torch_checkpoint

        a = model.config.model_args
        gpt_params = convert_xtts_gpt(
            load_torch_checkpoint(checkpoint),
            layers=a.gpt_layers,
            heads=a.gpt_n_heads,
            use_perceiver=a.gpt_use_perceiver_resampler,
        )
    else:
        from tts_tpu.utils.io import load_checkpoint

        params, _, _ = load_checkpoint(checkpoint)
        gpt_params = params.get("gpt", params) if isinstance(params, dict) else params
    trainer.state = trainer.state.replace(
        params=jax.tree.map(
            lambda t, s: jnp.asarray(s), trainer.state.params, {"gpt": gpt_params}
        )
    )
    print(f" > Loaded pretrained GPT weights from {checkpoint}")
