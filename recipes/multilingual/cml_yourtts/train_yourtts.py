"""YourTTS on CML-TTS + LibriTTS — the CML-TTS-paper experiment 1
(reference recipes/multilingual/cml_yourtts/train_yourtts.py): VITS with
external d-vectors, language embeddings, and balanced sampling across the
seven CML languages + English LibriTTS.

Precompute per-dataset d-vectors first:
  python -m tts_tpu.bin.compute_embeddings \
      --model_path <speaker_encoder.msgpack> --config_path <enc_config.json> \
      --config_dataset_path <dataset config json> \
      --output_path <dataset>/speakers.pth"""

import os

from tts_tpu.config.shared import BaseDatasetConfig
from tts_tpu.data import load_tts_samples
from tts_tpu.models import setup_model
from tts_tpu.models.vits import VitsConfig
from tts_tpu.trainer.trainer import Trainer, TrainerArgs
from tts_tpu.utils.managers import LanguageManager, SpeakerManager

output_path = os.path.dirname(os.path.abspath(__file__))
CML_DATASET_PATH = os.path.join(output_path, "../CML-TTS-Dataset/")
LIBRITTS_PATH = os.path.join(output_path, "../LibriTTS/train-clean-360/")
SAMPLE_RATE = 24000

dataset_configs = [
    BaseDatasetConfig(
        formatter="libri_tts",
        dataset_name="libri_tts",
        meta_file_train="",
        path=LIBRITTS_PATH,
        language="en",
    )
] + [
    BaseDatasetConfig(
        formatter="cml_tts",
        dataset_name="cml_tts",
        meta_file_train="train.csv",
        path=os.path.join(CML_DATASET_PATH, f"cml_tts_dataset_{name}_v0.1/"),
        language=lang,
    )
    for name, lang in [
        ("portuguese", "pt-br"),
        ("polish", "pl"),
        ("italian", "it"),
        ("french", "fr"),
        ("dutch", "du"),
        ("german", "ge"),
        ("spanish", "sp"),
    ]
]

D_VECTOR_FILES = [os.path.join(d.path, "speakers.pth") for d in dataset_configs]

config = VitsConfig(
    run_name="YourTTS-CML-TTS",
    batch_size=32,
    eval_batch_size=16,
    epochs=1000,
    text_cleaner="multilingual_cleaners",
    use_phonemes=False,
    compute_linear_spec=True,
    return_wav=True,
    use_language_weighted_sampler=True,
    use_speaker_weighted_sampler=True,
    print_step=50,
    save_step=5000,
    output_path=output_path,
    datasets=dataset_configs,
)
config.audio.sample_rate = SAMPLE_RATE
# YourTTS architecture changes over plain VITS (reference VitsArgs block)
config.model_args.use_d_vector_file = True
config.model_args.d_vector_file = D_VECTOR_FILES
config.model_args.d_vector_dim = 512
config.model_args.use_language_embedding = True
config.model_args.embedded_language_dim = 4
config.model_args.use_speaker_encoder_as_loss = False
config.use_d_vector_file = True

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        [d.to_dict() for d in dataset_configs],
        eval_split=True,
        eval_split_size=config.eval_split_size,
    )
    all_samples = train_samples + eval_samples
    speaker_manager = SpeakerManager(d_vectors_file_path=D_VECTOR_FILES)
    language_manager = LanguageManager(data_items=all_samples)
    config.model_args.num_languages = language_manager.num_languages
    model = setup_model(config)
    model.speaker_manager = speaker_manager
    model.language_manager = language_manager
    model.format_batch = lambda b: {**b, "spec_lengths": b["mel_lengths"]}
    trainer = Trainer(TrainerArgs(), config, output_path, model, train_samples, eval_samples)
    trainer.fit()
