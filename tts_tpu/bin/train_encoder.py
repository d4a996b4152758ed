"""Train a speaker/emotion encoder — bespoke loop like the reference
(``TTS/bin/train_encoder.py:126-267``): PerfectBatchSampler class-balanced
batches + GE2E/AngleProto losses.
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--output_path", default="run_encoder")
    parser.add_argument("--max_steps", type=int, default=None)
    args, rest = parser.parse_known_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tts_tpu.audio.processor import AudioProcessor
    from tts_tpu.config import load_config
    from tts_tpu.data import load_tts_samples
    from tts_tpu.data.samplers import PerfectBatchSampler
    from tts_tpu.encoder.losses import AngleProtoLoss, GE2ELoss, SoftmaxAngleProtoLoss
    from tts_tpu.encoder.model import SpeakerEncoder
    from tts_tpu.trainer.optim import build_optimizer
    from tts_tpu.utils.io import save_checkpoint

    config = load_config(args.config_path)
    rest = config.parse_args(rest)
    os.makedirs(args.output_path, exist_ok=True)

    train_samples, _ = load_tts_samples([d.to_dict() for d in config.datasets], eval_split=False)
    for s in train_samples:
        s["class_name"] = s.get(config.class_name_key) or s["speaker_name"]
    classes = sorted({s["class_name"] for s in train_samples})

    ap = AudioProcessor.init_from_config(config.audio, verbose=False)
    encoder = SpeakerEncoder(config)
    enc_params = encoder.init_params(jax.random.PRNGKey(config.seed))

    n_cls = config.num_classes_in_batch
    n_utt = config.num_utter_per_class
    if config.loss == "ge2e":
        loss_mod = GE2ELoss()
    elif config.loss == "angleproto":
        loss_mod = AngleProtoLoss()
    else:
        loss_mod = SoftmaxAngleProtoLoss(
            embedding_dim=config.model_params["proj_dim"], n_speakers=len(classes)
        )
    dummy = jnp.zeros((n_cls, n_utt, config.model_params["proj_dim"]))
    if config.loss == "softmaxproto":
        loss_params = loss_mod.init(jax.random.PRNGKey(0), dummy, jnp.zeros((n_cls * n_utt,), jnp.int32))
    else:
        loss_params = loss_mod.init(jax.random.PRNGKey(0), dummy)

    params = {"enc": enc_params, "loss": loss_params}
    tx = build_optimizer(config.optimizer, config.lr, config.optimizer_params, config.grad_clip)
    opt_state = tx.init(params)

    voice_len = int(config.voice_len * config.audio.sample_rate)
    mel_frames = voice_len // config.audio.hop_length

    def load_utt(sample):
        wav = ap.load_wav(sample["audio_file"])
        if len(wav) < voice_len:
            wav = np.pad(wav, (0, voice_len - len(wav)))
        start = np.random.randint(0, max(1, len(wav) - voice_len))
        mel = ap.melspectrogram(wav[start : start + voice_len]).T[:mel_frames]
        return mel.astype(np.float32)

    @jax.jit
    def train_step(params, opt_state, mels, labels):
        def loss_fn(p):
            feats = encoder.module.apply(p["enc"], mels)
            feats = feats.reshape(n_cls, n_utt, -1)
            if config.loss == "softmaxproto":
                return loss_mod.apply(p["loss"], feats, labels)
            return loss_mod.apply(p["loss"], feats)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    sampler = PerfectBatchSampler(
        train_samples, classes, batch_size=n_cls * n_utt, num_classes_in_batch=n_cls
    )
    step = 0
    max_steps = args.max_steps or config.max_train_step
    t0 = time.time()
    done = False
    while not done:
        for batch_idxs in sampler:
            mels = np.stack([load_utt(train_samples[i]) for i in batch_idxs])
            labels = np.asarray(
                [classes.index(train_samples[i]["class_name"]) for i in batch_idxs], np.int32
            )
            params, opt_state, loss = train_step(params, opt_state, jnp.asarray(mels), jnp.asarray(labels))
            step += 1
            if step % max(1, getattr(config, "print_step", 10)) == 0:
                print(f" > step {step}: loss {float(loss):.4f} ({time.time() - t0:.1f}s)", flush=True)
            if step >= max_steps:
                done = True
                break
    save_checkpoint(os.path.join(args.output_path, "best_model.msgpack"), params, config=config,
                    meta={"step": step})
    print(f" > Saved encoder checkpoint after {step} steps")


if __name__ == "__main__":
    main()
