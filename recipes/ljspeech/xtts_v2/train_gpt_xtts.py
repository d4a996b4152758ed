"""XTTS v2 GPT fine-tuning recipe
(reference recipes/ljspeech/xtts_v2/train_gpt_xtts.py): fine-tune the
XTTS GPT on LJSpeech via the XTTSDataset.  Point ``XTTS_CHECKPOINT`` at a
local converted checkpoint (or the torch ``model.pth``) to start from the
pretrained model; vocab.json enables the real BPE tokenizer."""

import os

from tts_tpu.config.shared import BaseDatasetConfig
from tts_tpu.data import load_tts_samples
from tts_tpu.models.xtts import XttsConfig
from tts_tpu.models.xtts.trainer import GPTTrainer
from tts_tpu.trainer.trainer import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))

# set these to the downloaded/converted XTTS v2 artifacts (zoo:
# tts_models/multilingual/multi-dataset/xtts_v2)
XTTS_CHECKPOINT = os.environ.get("XTTS_CHECKPOINT")  # model.pth or .msgpack
TOKENIZER_FILE = os.environ.get("XTTS_VOCAB")  # vocab.json

dataset_config = BaseDatasetConfig(
    formatter="ljspeech",
    dataset_name="ljspeech",
    meta_file_train="metadata.csv",
    path=os.path.join(output_path, "../LJSpeech-1.1/"),
    language="en",
)

config = XttsConfig(
    batch_size=3,
    eval_batch_size=2,
    epochs=1000,
    grad_accum_steps=84,  # effective batch 252 (reference recipe :164)
    lr=5e-6,
    optimizer="adamw",
    optimizer_params={"betas": [0.9, 0.96], "eps": 1e-8, "weight_decay": 1e-2},
    print_step=50,
    save_step=1000,
    run_eval=True,
    output_path=output_path,
    datasets=[dataset_config],
)
if TOKENIZER_FILE:
    config.model_args.tokenizer_file = TOKENIZER_FILE

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        [dataset_config.to_dict()], eval_split=True, eval_split_size=config.eval_split_size
    )
    model = GPTTrainer.init_from_config(config)
    trainer = Trainer(
        TrainerArgs(), config, output_path, model, train_samples, eval_samples
    )
    if XTTS_CHECKPOINT:
        from tts_tpu.demos.xtts_ft_demo.utils.gpt_train import _load_pretrained

        _load_pretrained(trainer, model, XTTS_CHECKPOINT)
    trainer.fit()
