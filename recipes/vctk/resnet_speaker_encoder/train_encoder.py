"""ResNet speaker-encoder VCTK recipe
(reference recipes/vctk/resnet_speaker_encoder/train_encoder.py):
SE-ResNet + ASP d-vector network with the softmaxproto loss, trained by
the bespoke encoder loop (``tts_tpu.bin.train_encoder``)."""

import json
import os

from tts_tpu.bin.train_encoder import main as train_encoder_main
from tts_tpu.config.shared import BaseDatasetConfig
from tts_tpu.encoder.configs import SpeakerEncoderConfig

output_path = os.path.dirname(os.path.abspath(__file__))

dataset_config = BaseDatasetConfig(
    formatter="vctk",
    dataset_name="vctk",
    meta_file_train="",
    path=os.path.join(output_path, "../VCTK/"),
    language="en",
)

config = SpeakerEncoderConfig(
    run_name="resnet_speaker_encoder_vctk",
    datasets=[dataset_config],
    num_classes_in_batch=100,
    num_utter_per_class=4,
    eval_num_classes_in_batch=100,
    eval_num_utter_per_class=4,
    epochs=10000,
    loss="softmaxproto",
    run_eval=False,
    save_step=2000,
    model_params={
        "model_name": "resnet",
        "input_dim": 64,
        "log_input": True,
        "proj_dim": 512,
    },
    voice_len=2.0,
    output_path=output_path,
)
config.audio.fft_size = 512
config.audio.win_length = 400
config.audio.hop_length = 160
config.audio.sample_rate = 16000
config.audio.preemphasis = 0.97
config.audio.num_mels = 64
config.audio.mel_fmax = 8000.0
config.audio.do_trim_silence = False
config.audio.signal_norm = False
config.audio.do_rms_norm = True
config.audio.db_level = -27.0

if __name__ == "__main__":
    config_path = os.path.join(output_path, "config_se.json")
    with open(config_path, "w", encoding="utf-8") as f:
        json.dump(config.to_dict(), f, indent=2)
    train_encoder_main(["--config_path", config_path, "--output_path", output_path])
