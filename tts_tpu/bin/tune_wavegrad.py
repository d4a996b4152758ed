"""Search the best WaveGrad noise schedule against held-out data
(reference ``TTS/bin/tune_wavegrad.py``)."""

from __future__ import annotations

import argparse
import itertools

import jax
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--num_iter", type=int, default=6)
    parser.add_argument("--search_depth", type=int, default=3)
    args = parser.parse_args()

    from tts_tpu.audio import jax_transforms as jt
    from tts_tpu.config import load_config
    from tts_tpu.utils.io import load_checkpoint
    from tts_tpu.vocoder.dataset import GANDataset, load_wav_data
    from tts_tpu.vocoder.models.wavegrad import Wavegrad, wavegrad_inference

    config = load_config(args.config_path)
    params, _, _ = load_checkpoint(args.checkpoint_path)
    if isinstance(params, dict) and "model" in params:
        params = params["model"]
    model = Wavegrad(**{k: v for k, v in config.model_params.items() if k != "use_weight_norm"})
    eval_samples, _ = load_wav_data(config.data_path, config.eval_split_size)
    ds = GANDataset(config, eval_samples[:4], is_eval=True)
    batch = next(ds.batches(4, shuffle=False))

    audio = config.audio
    mel_kw = dict(n_fft=audio.fft_size, num_mels=audio.num_mels, sample_rate=audio.sample_rate,
                  hop_length=audio.hop_length, win_length=audio.win_length)
    best = (None, np.inf)
    import jax.numpy as jnp

    for exponents in itertools.product([-6, -5, -4, -3, -2, -1], repeat=args.search_depth):
        betas = np.logspace(min(exponents), max(exponents), args.num_iter)
        alpha = 1 - betas
        alpha_hat = np.cumprod(alpha)
        noise_level = np.concatenate([[1.0], alpha_hat**0.5])
        sched = (jnp.asarray(betas), jnp.asarray(alpha), jnp.asarray(alpha_hat), jnp.asarray(noise_level))
        y = wavegrad_inference(model, params, jnp.asarray(batch["mel"]), jax.random.PRNGKey(0), sched)
        mel_hat = jt.wav_to_mel(y[..., 0], **mel_kw)
        mel_ref = jt.wav_to_mel(jnp.asarray(batch["waveform"][..., 0]), **mel_kw)
        err = float(jnp.mean(jnp.abs(mel_hat - mel_ref)))
        if err < best[1]:
            best = (betas, err)
            print(f" > new best mel L1 {err:.4f} for schedule {betas}")
    print(" > Best schedule:", best[0])


if __name__ == "__main__":
    main()
