"""VITS same-model voice transfer through the Synthesizer surface
(reference ``synthesizer.py:443-490`` — ``tts --reference_wav`` path)."""

import json

import jax
import numpy as np

from tts_tpu.audio.numpy_transforms import save_wav
from tts_tpu.models.vits import Vits, VitsArgs, VitsConfig
from tts_tpu.utils.io import save_checkpoint
from tts_tpu.utils.synthesizer import Synthesizer
from helpers import fast_params


def test_voice_transfer_through_synthesizer(tmp_path):
    args = VitsArgs(
        num_chars=40,
        out_channels=65,
        spec_segment_size=8,
        hidden_channels=32,
        hidden_channels_ffn_text_encoder=64,
        num_layers_text_encoder=2,
        num_layers_posterior_encoder=2,
        num_layers_flow=2,
        upsample_rates_decoder=[4, 4],
        upsample_kernel_sizes_decoder=[8, 8],
        upsample_initial_channel_decoder=64,
        resblock_kernel_sizes_decoder=[3],
        resblock_dilation_sizes_decoder=[[1, 3]],
        periods_multi_period_discriminator=[2, 3],
        use_speaker_embedding=True,
        num_speakers=2,
    )
    cfg = VitsConfig(model_args=args)
    cfg.audio.fft_size = 128
    cfg.audio.win_length = 128
    cfg.audio.hop_length = 16
    cfg.audio.num_mels = 20
    cfg.use_speaker_embedding = True
    spk_file = tmp_path / "speakers.json"
    spk_file.write_text(json.dumps({"spk_a": 0, "spk_b": 1}))
    cfg.speakers_file = str(spk_file)

    model = Vits(cfg)
    gen_params, _ = fast_params(model.init_params, jax.random.PRNGKey(0))
    ckpt = tmp_path / "model.msgpack"
    save_checkpoint(str(ckpt), {"model": gen_params}, config=cfg)

    sr = cfg.audio.sample_rate
    ref = tmp_path / "ref.wav"
    save_wav(wav=0.1 * np.sin(np.linspace(0, 440 * 2 * np.pi, sr)).astype(np.float32),
             path=str(ref), sample_rate=sr)

    synth = Synthesizer(tts_checkpoint=str(ckpt))
    wavs = synth.tts(
        reference_wav=str(ref), speaker_name="spk_b", reference_speaker_name="spk_a"
    )
    wav = np.asarray(wavs, np.float32)
    assert wav.size > sr // 4  # VC emits real-length audio
    assert np.isfinite(wav).all()
