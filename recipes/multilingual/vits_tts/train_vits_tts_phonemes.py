"""Multilingual VITS recipe with per-language phonemizers
(reference recipes/multilingual/vits_tts/train_vits_tts_phonemes.py):
language embeddings + MultiPhonemizer routing each dataset's language to
its phonemizer backend."""

import glob
import os

from tts_tpu.config.shared import BaseDatasetConfig
from tts_tpu.data import load_tts_samples
from tts_tpu.models import setup_model
from tts_tpu.models.vits import VitsConfig
from tts_tpu.trainer.trainer import Trainer, TrainerArgs
from tts_tpu.utils.managers import LanguageManager, SpeakerManager

output_path = os.path.dirname(os.path.abspath(__file__))
mailabs_path = os.path.join(output_path, "../mailabs/**")

dataset_paths = glob.glob(mailabs_path)
dataset_configs = [
    BaseDatasetConfig(
        formatter="mailabs",
        dataset_name="mailabs",
        meta_file_train="",
        path=path,
        language=os.path.basename(path).split("_")[0] or "en",
    )
    for path in dataset_paths
]

config = VitsConfig(
    batch_size=32,
    eval_batch_size=16,
    epochs=1000,
    text_cleaner="multilingual_cleaners",
    use_phonemes=True,
    phoneme_language=None,
    phonemizer="multi_phonemizer",
    compute_input_seq_cache=True,
    compute_linear_spec=True,
    return_wav=True,
    use_language_weighted_sampler=True,
    print_step=25,
    min_audio_len=16000,
    max_audio_len=16000 * 10,
    output_path=output_path,
    datasets=dataset_configs,
)
config.audio.sample_rate = 16000
config.model_args.use_language_embedding = True
config.model_args.embedded_language_dim = 4
config.model_args.use_speaker_embedding = True
config.model_args.use_sdp = False

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        [d.to_dict() for d in dataset_configs],
        eval_split=True,
        eval_split_size=config.eval_split_size,
    )
    all_samples = train_samples + eval_samples
    speaker_manager = SpeakerManager(data_items=all_samples)
    language_manager = LanguageManager(data_items=all_samples)
    config.model_args.num_speakers = speaker_manager.num_speakers
    config.model_args.num_languages = language_manager.num_languages
    model = setup_model(config)
    model.speaker_manager = speaker_manager
    model.language_manager = language_manager
    model.format_batch = lambda b: {**b, "spec_lengths": b["mel_lengths"]}
    trainer = Trainer(TrainerArgs(), config, output_path, model, train_samples, eval_samples)
    trainer.fit()
