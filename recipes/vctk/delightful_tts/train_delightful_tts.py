"""DelightfulTTS VCTK recipe — multi-speaker joint acoustic + HiFiGAN
GAN training (reference recipes/vctk/delightful_tts/train_delightful_tts.py)."""

import os

from tts_tpu.config.shared import BaseDatasetConfig
from tts_tpu.data import load_tts_samples
from tts_tpu.models import setup_model
from tts_tpu.models.delightful_tts import DelightfulTTSConfig
from tts_tpu.trainer.trainer import Trainer, TrainerArgs
from tts_tpu.utils.managers import SpeakerManager

output_path = os.path.dirname(os.path.abspath(__file__))

dataset_config = BaseDatasetConfig(
    formatter="vctk",
    dataset_name="vctk",
    meta_file_train="",
    path=os.path.join(output_path, "../VCTK/"),
    language="en",
)

config = DelightfulTTSConfig(
    run_name="delightful_tts_vctk",
    batch_size=32,
    eval_batch_size=16,
    run_eval=True,
    epochs=1000,
    text_cleaner="english_cleaners",
    use_phonemes=True,
    phoneme_language="en-us",
    compute_f0=True,
    f0_cache_path=os.path.join(output_path, "f0_cache"),
    compute_energy=True,
    energy_cache_path=os.path.join(output_path, "energy_cache"),
    return_wav=True,
    steps_to_start_discriminator=200000,
    print_step=50,
    use_speaker_weighted_sampler=True,
    output_path=output_path,
    datasets=[dataset_config],
)
config.model_args.use_speaker_embedding = True

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        [dataset_config.to_dict()], eval_split=True, eval_split_size=config.eval_split_size
    )
    speaker_manager = SpeakerManager(data_items=train_samples + eval_samples)
    config.model_args.num_speakers = speaker_manager.num_speakers
    model = setup_model(config)
    model.speaker_manager = speaker_manager
    trainer = Trainer(TrainerArgs(), config, output_path, model, train_samples, eval_samples)
    trainer.fit()
