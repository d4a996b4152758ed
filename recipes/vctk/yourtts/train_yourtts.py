"""YourTTS VCTK recipe — VITS with d-vectors + speaker-consistency loss
(reference recipes/vctk/yourtts/train_yourtts.py).

Precompute d-vectors first:
  python -m tts_tpu.bin.compute_embeddings \
      --model_path <speaker_encoder.msgpack> --config_path <enc_config.json> \
      --config_dataset_path <this config saved as json> \
      --output_path VCTK/speakers.pth
"""

import os

from tts_tpu.config.shared import BaseDatasetConfig
from tts_tpu.data import load_tts_samples
from tts_tpu.models import setup_model
from tts_tpu.models.vits import VitsConfig
from tts_tpu.trainer.trainer import Trainer, TrainerArgs
from tts_tpu.utils.managers import SpeakerManager

output_path = os.path.dirname(os.path.abspath(__file__))
D_VECTOR_FILE = os.path.join(output_path, "../VCTK/speakers.pth")

dataset_config = BaseDatasetConfig(
    formatter="vctk",
    dataset_name="vctk",
    meta_file_train="",
    path=os.path.join(output_path, "../VCTK/"),
    language="en",
)

config = VitsConfig(
    batch_size=32,
    eval_batch_size=16,
    epochs=1000,
    text_cleaner="multilingual_cleaners",
    use_phonemes=False,
    compute_linear_spec=True,
    return_wav=True,
    use_speaker_weighted_sampler=True,
    print_step=25,
    output_path=output_path,
    datasets=[dataset_config],
)
# YourTTS = VITS + d-vectors (+ optional speaker-consistency loss)
config.model_args.use_d_vector_file = True
config.model_args.d_vector_dim = 512
config.model_args.use_speaker_encoder_as_loss = True
config.use_d_vector_file = True

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        [dataset_config.to_dict()], eval_split=True, eval_split_size=config.eval_split_size
    )
    speaker_manager = SpeakerManager(d_vectors_file_path=D_VECTOR_FILE)
    model = setup_model(config)
    model.speaker_manager = speaker_manager
    model.format_batch = lambda b: {**b, "spec_lengths": b["mel_lengths"]}
    trainer = Trainer(TrainerArgs(), config, output_path, model, train_samples, eval_samples)
    trainer.fit()
