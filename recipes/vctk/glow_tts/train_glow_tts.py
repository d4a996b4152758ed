"""GlowTTS VCTK recipe — multi-speaker with learned speaker embeddings
(reference recipes/vctk/glow_tts/train_glow_tts.py)."""

import os

from tts_tpu.config.shared import BaseAudioConfig, BaseDatasetConfig
from tts_tpu.data import load_tts_samples
from tts_tpu.models import setup_model
from tts_tpu.models.glow_tts import GlowTTSConfig
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

audio_config = BaseAudioConfig(sample_rate=22050, resample=True, do_trim_silence=True, trim_db=23.0)

config = GlowTTSConfig(
    batch_size=64,
    eval_batch_size=16,
    audio=audio_config,
    run_eval=True,
    test_delay_epochs=-1,
    epochs=1000,
    text_cleaner="phoneme_cleaners",
    use_phonemes=True,
    phoneme_language="en-us",
    print_step=25,
    mixed_precision=True,
    output_path=output_path,
    datasets=[dataset_config],
    use_speaker_embedding=True,
    min_text_len=0,
    max_text_len=500,
    min_audio_len=0,
    max_audio_len=500000,
)

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        [dataset_config.to_dict()], eval_split=True, eval_split_size=config.eval_split_size
    )
    speaker_manager = SpeakerManager(data_items=train_samples + eval_samples)
    config.num_speakers = speaker_manager.num_speakers
    model = setup_model(config)
    model.speaker_manager = speaker_manager
    trainer = Trainer(TrainerArgs(), config, output_path, model, train_samples, eval_samples)
    trainer.fit()
