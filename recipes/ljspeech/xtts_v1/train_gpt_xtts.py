"""XTTS v1.1 GPT fine-tuning recipe
(reference recipes/ljspeech/xtts_v1/train_gpt_xtts.py): same pipeline as
the v2 recipe but with the v1 token layout (8194 audio tokens, no
perceiver resampler).  Point ``XTTS_CHECKPOINT`` at the converted v1.1
checkpoint artifacts."""

import os

from tts_tpu.config.shared import BaseDatasetConfig
from tts_tpu.data import load_tts_samples
from tts_tpu.models.xtts import XttsConfig
from tts_tpu.models.xtts.trainer import GPTTrainer
from tts_tpu.trainer.trainer import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))

XTTS_CHECKPOINT = os.environ.get("XTTS_CHECKPOINT")  # v1.1 model.pth or .msgpack
TOKENIZER_FILE = os.environ.get("XTTS_VOCAB")  # v1.1 vocab.json

dataset_config = BaseDatasetConfig(
    formatter="ljspeech",
    dataset_name="ljspeech",
    meta_file_train="metadata.csv",
    path=os.path.join(output_path, "../LJSpeech-1.1/"),
    language="en",
)

config = XttsConfig(
    run_name="GPT_XTTS_LJSpeech_FT",
    batch_size=3,
    eval_batch_size=2,
    epochs=1000,
    grad_accum_steps=84,  # effective batch 252 (reference recipe)
    lr=5e-6,
    optimizer="adamw",
    optimizer_params={"betas": [0.9, 0.96], "eps": 1e-8, "weight_decay": 1e-2},
    print_step=50,
    save_step=1000,
    run_eval=True,
    output_path=output_path,
    datasets=[dataset_config],
)
# v1.1 token layout (reference xtts_v1 recipe model_args block)
config.model_args.gpt_num_audio_tokens = 8194
config.model_args.gpt_start_audio_token = 8192
config.model_args.gpt_stop_audio_token = 8193
config.model_args.gpt_use_masking_gt_prompt_approach = False
config.model_args.gpt_use_perceiver_resampler = False
if TOKENIZER_FILE:
    config.model_args.tokenizer_file = TOKENIZER_FILE

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        [dataset_config.to_dict()], eval_split=True, eval_split_size=config.eval_split_size
    )
    model = GPTTrainer.init_from_config(config)
    trainer = Trainer(TrainerArgs(), config, output_path, model, train_samples, eval_samples)
    if XTTS_CHECKPOINT:
        from tts_tpu.demos.xtts_ft_demo.utils.gpt_train import _load_pretrained

        _load_pretrained(trainer, model, XTTS_CHECKPOINT)
    trainer.fit()
