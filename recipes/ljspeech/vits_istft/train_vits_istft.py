"""iSTFT-VITS LJSpeech recipe — the MB-iSTFT-VITS decoder variant
(arXiv:2210.15975), TPU-only addition with no reference counterpart.

Replaces HiFiGAN's two sample-rate transposed-conv stages with an
inverse-STFT head: the [8, 8] trunk upsamples 64x and the iSTFT (hop 4)
synthesizes the remaining 4x at frame rate, so total upsampling matches
hop_length 256. ~2-4x faster vocoding at comparable quality per the
paper; set istft_subbands_decoder=4 (and trunk [4, 4]) for the
multi-band variant with PQMF synthesis."""

import os

from tts_tpu.config.shared import BaseDatasetConfig
from tts_tpu.data import load_tts_samples
from tts_tpu.models import setup_model
from tts_tpu.models.vits import VitsConfig
from tts_tpu.trainer.trainer import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))

dataset_config = BaseDatasetConfig(
    formatter="ljspeech",
    dataset_name="ljspeech",
    meta_file_train="metadata.csv",
    path=os.path.join(output_path, "../LJSpeech-1.1/"),
    language="en",
)

config = VitsConfig(
    batch_size=32,
    eval_batch_size=16,
    epochs=1000,
    text_cleaner="english_cleaners",
    use_phonemes=True,
    phoneme_language="en-us",
    compute_linear_spec=True,
    return_wav=True,
    print_step=25,
    output_path=output_path,
    datasets=[dataset_config],
)
config.model_args.decoder_type = "istft"
config.model_args.upsample_rates_decoder = [8, 8]
config.model_args.upsample_kernel_sizes_decoder = [16, 16]
config.model_args.istft_n_fft_decoder = 16
config.model_args.istft_hop_decoder = 4

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        [dataset_config.to_dict()],
        eval_split=True,
        eval_split_size=config.eval_split_size,
    )
    model = setup_model(config)
    trainer = Trainer(
        TrainerArgs(), config, output_path, model, train_samples, eval_samples
    )
    trainer.fit()
