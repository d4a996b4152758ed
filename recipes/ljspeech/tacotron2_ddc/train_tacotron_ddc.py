"""Tacotron2-DDC LJSpeech recipe
(reference recipes/ljspeech/tacotron2-DDC/train_tacotron_ddc.py):
double decoder consistency + the gradual-training r schedule."""

import os

from tts_tpu.config.shared import BaseDatasetConfig
from tts_tpu.data import load_tts_samples
from tts_tpu.models import setup_model
from tts_tpu.models.tacotron2 import Tacotron2Config
from tts_tpu.trainer.trainer import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))

dataset_config = BaseDatasetConfig(
    formatter="ljspeech",
    dataset_name="ljspeech",
    meta_file_train="metadata.csv",
    path=os.path.join(output_path, "../LJSpeech-1.1/"),
    language="en",
)

config = Tacotron2Config(
    batch_size=64,
    eval_batch_size=16,
    run_eval=True,
    r=6,
    gradual_training=[[0, 6, 64], [10000, 4, 32], [50000, 3, 32], [100000, 2, 32]],
    double_decoder_consistency=True,
    ddc_r=6,
    epochs=1000,
    text_cleaner="phoneme_cleaners",
    use_phonemes=True,
    phoneme_language="en-us",
    print_step=25,
    output_path=output_path,
    datasets=[dataset_config],
)

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        [dataset_config.to_dict()], eval_split=True, eval_split_size=config.eval_split_size
    )
    model = setup_model(config)
    trainer = Trainer(TrainerArgs(), config, output_path, model, train_samples, eval_samples)
    trainer.fit()
