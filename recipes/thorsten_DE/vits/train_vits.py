"""VITS Thorsten (German) recipe
(reference recipes/thorsten_DE/vits_tts/train_vits.py)."""

import os

from tts_tpu.config.shared import BaseDatasetConfig
from tts_tpu.data import load_tts_samples
from tts_tpu.models import setup_model
from tts_tpu.models.vits import VitsConfig
from tts_tpu.trainer.trainer import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))

dataset_config = BaseDatasetConfig(
    formatter="thorsten",
    dataset_name="thorsten",
    meta_file_train="metadata.csv",
    path=os.path.join(output_path, "../thorsten-de/"),
    language="de",
)

config = VitsConfig(
    batch_size=32,
    eval_batch_size=16,
    epochs=1000,
    text_cleaner="phoneme_cleaners",
    use_phonemes=True,
    phoneme_language="de",
    compute_linear_spec=True,
    return_wav=True,
    print_step=25,
    output_path=output_path,
    datasets=[dataset_config],
)

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        [dataset_config.to_dict()], eval_split=True, eval_split_size=config.eval_split_size
    )
    model = setup_model(config)
    model.format_batch = lambda b: {**b, "spec_lengths": b["mel_lengths"]}
    trainer = Trainer(TrainerArgs(), config, output_path, model, train_samples, eval_samples)
    trainer.fit()
