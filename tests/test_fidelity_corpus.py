"""Golden-mel fidelity corpus: committed reference outputs (generated ONCE
by ``scripts/gen_fidelity_corpus.py`` from reference code at fixed seeds —
env is zero-egress, so reference *code* stands in for real zoo checkpoints)
replayed torch-free through our converters + models; per-family distortion
numbers are recorded in ``FIDELITY.json`` (BASELINE.json north star: "output
fidelity within mel-distortion tolerance").

Metrics: ``lsd_db`` — log-mel-spectral distance between reference and our
waveform (the mel-distortion number); ``rmse``/``max_abs`` for mel/raw
outputs; ``1 - cos`` for embeddings.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import synth_state_from_manifest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(REPO, "tests", "fixtures", "fidelity")

_RESULTS = {}


def _load(family):
    path = os.path.join(FIXTURE_DIR, f"{family}.npz")
    if not os.path.exists(path):
        pytest.skip(f"fixture {family}.npz not generated")
    npz = np.load(path)
    meta = json.loads(bytes(npz["meta"]).decode())
    if "state_manifest" in meta:
        state = synth_state_from_manifest(meta["state_manifest"], meta["state_seed"])
    else:
        state = {k[3:]: npz[k] for k in npz.files if k.startswith("sd/")}
    ins = {k[3:]: npz[k] for k in npz.files if k.startswith("in/")}
    outs = {k[4:]: npz[k] for k in npz.files if k.startswith("out/")}
    return state, ins, outs, meta


def _log_mel(wav, n_fft=64, hop=16, n_mels=20, sr=1600):
    """Tiny log-mel front end for distortion measurement (fixture wavs are a
    few hundred samples)."""
    from tts_tpu.audio.numpy_transforms import build_mel_basis, stft

    spec = np.abs(
        stft(y=wav.astype(np.float32), fft_size=n_fft, hop_length=hop,
             win_length=n_fft, pad_mode="reflect")
    )
    basis = build_mel_basis(sample_rate=sr, fft_size=n_fft, num_mels=n_mels)
    mel = np.maximum(basis @ spec, 1e-5)
    return 20.0 * np.log10(mel)


def _lsd_db(ref_wav, our_wav):
    """Log-mel-spectral distance in dB (frame-mean RMS over mel bins)."""
    a, b = _log_mel(ref_wav), _log_mel(our_wav)
    return float(np.mean(np.sqrt(np.mean((a - b) ** 2, axis=0))))


def _record(family, **metrics):
    _RESULTS[family] = {k: round(float(v), 6) for k, v in metrics.items()}


def _wav_metrics(family, ref, ours, tol_db=0.5):
    ref = np.asarray(ref, np.float32).reshape(-1)
    ours = np.asarray(ours, np.float32).reshape(-1)
    n = min(len(ref), len(ours))
    assert abs(len(ref) - len(ours)) <= 64, (len(ref), len(ours))
    ref, ours = ref[:n], ours[:n]
    lsd = _lsd_db(ref, ours)
    _record(family, lsd_db=lsd, max_abs=np.max(np.abs(ref - ours)),
            rmse=np.sqrt(np.mean((ref - ours) ** 2)))
    assert lsd < tol_db, f"{family}: log-mel-spectral distance {lsd:.4f} dB"


def _mel_metrics(family, ref, ours, tol_rmse=5e-3):
    ref = np.asarray(ref, np.float32)
    ours = np.asarray(ours, np.float32)
    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    rmse = float(np.sqrt(np.mean((ref - ours) ** 2)))
    _record(family, rmse=rmse, max_abs=np.max(np.abs(ref - ours)))
    assert rmse < tol_rmse, f"{family}: mel RMSE {rmse}"


@pytest.fixture(scope="module", autouse=True)
def write_fidelity_artifact():
    """Write FIDELITY.json after the module's tests so the distortion
    numbers are a committed artifact, not just assertions."""
    yield
    if _RESULTS:
        path = os.path.join(REPO, "FIDELITY.json")
        existing = {}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    existing = json.load(f)
            except Exception:
                existing = {}
        existing.update(_RESULTS)
        with open(path, "w") as f:
            json.dump(existing, f, indent=1, sort_keys=True)
            f.write("\n")


def test_vits_fidelity():
    from tts_tpu.models.vits import Vits, VitsConfig
    from tts_tpu.utils.convert import convert_vits_generator

    state, ins, outs, meta = _load("vits")
    cfg = VitsConfig()
    for k, v in meta["args"].items():
        setattr(cfg.model_args, k, v)
    cfg.model_args.inference_noise_scale = 0.0
    cfg.model_args.inference_noise_scale_dp = 0.0
    model = Vits(cfg)
    params = convert_vits_generator(state, cfg.model_args)

    ref_lens = outs["y_lengths"]
    max_frames = int(((ref_lens.max() + 31) // 32) * 32)
    out = model.inference(
        params, jnp.asarray(ins["text"]), jnp.asarray(ins["text_lengths"]),
        max_frames=max_frames,
    )
    np.testing.assert_array_equal(np.asarray(out["y_lengths"]), ref_lens)
    up = meta["upsample_total"]
    ref_wav = outs["wav"]  # [B, 1, T_wav_max] (padded by batch max)
    our_wav = np.asarray(out["model_outputs"])  # [B, T, 1]
    ref_cat, our_cat = [], []
    for b, L in enumerate(ref_lens):
        ref_cat.append(ref_wav[b, 0, : L * up])
        our_cat.append(our_wav[b, : L * up, 0])
    _wav_metrics("vits", np.concatenate(ref_cat), np.concatenate(our_cat))


def test_glow_tts_fidelity():
    from tts_tpu.models.glow_tts.config import GlowTTSConfig
    from tts_tpu.models.glow_tts.model import GlowTTS
    from tts_tpu.utils.convert import convert_glow_tts

    state, ins, outs, meta = _load("glow_tts")
    cfg = GlowTTSConfig()
    for k, v in meta["config"].items():
        setattr(cfg, k, v)
    model = GlowTTS(cfg)
    params = convert_glow_tts(state, cfg)

    ref_lens = outs["y_lengths"]
    max_frames = int(((ref_lens.max() + 31) // 32) * 32)
    out = model.inference(
        params, jnp.asarray(ins["text"]), jnp.asarray(ins["text_lengths"]),
        max_frames=max_frames,
    )
    np.testing.assert_array_equal(np.asarray(out["y_lengths"]), ref_lens)
    ours = np.asarray(out["model_outputs"])
    ref = outs["mel"]  # [B, T_max, C]
    pieces_r, pieces_o = [], []
    for b, L in enumerate(ref_lens):
        pieces_r.append(ref[b, :L])
        pieces_o.append(ours[b, :L])
    _mel_metrics("glow_tts", np.concatenate(pieces_r), np.concatenate(pieces_o))


def test_fastpitch_fidelity():
    from tts_tpu.models.forward_tts.config import FastPitchConfig
    from tts_tpu.models.forward_tts.model import ForwardTTS
    from tts_tpu.utils.convert import convert_forward_tts

    state, ins, outs, meta = _load("fastpitch")
    cfg = FastPitchConfig()
    a = cfg.model_args
    a.num_chars, a.out_channels, a.hidden_channels = 40, 20, 32
    a.use_pitch, a.use_energy, a.use_aligner = True, False, True
    a.duration_predictor_hidden_channels = 48
    a.pitch_predictor_hidden_channels = 48
    a.encoder_params = {"hidden_channels_ffn": 64, "num_heads": 2,
                        "num_layers": 2, "dropout_p": 0.0}
    a.decoder_params = {"hidden_channels_ffn": 64, "num_heads": 2,
                        "num_layers": 2, "dropout_p": 0.0}
    params = convert_forward_tts(state, a)
    jm = ForwardTTS(cfg)
    out = jm.module.apply(
        params, jnp.asarray(ins["text"], jnp.int32),
        jnp.asarray(ins["text_lengths"], jnp.int32),
        max_frames=64, method=jm.module.inference,
    )
    ref = outs["mel"][0]
    T = int(np.asarray(out["y_lengths"])[0])
    assert T == ref.shape[0], (T, ref.shape)
    _mel_metrics("fastpitch", ref, np.asarray(out["model_outputs"])[0, :T])


def test_tacotron2_fidelity():
    from tts_tpu.models.tacotron2.model import Tacotron2Module
    from tts_tpu.utils.convert import convert_tacotron2

    state, ins, outs, meta = _load("tacotron2")
    params = convert_tacotron2(state)
    module = Tacotron2Module(num_chars=meta["num_chars"], r=meta["r"],
                             norm_type="folded")
    text, mel = ins["text"], ins["mel"]
    B, T_IN = text.shape
    out = module.apply(
        params, jnp.asarray(text), jnp.full((B,), T_IN),
        jnp.asarray(mel), jnp.full((B,), mel.shape[1]),
    )
    _mel_metrics("tacotron2", outs["mel"], np.asarray(out["model_outputs"]))


def test_hifigan_fidelity():
    from tts_tpu.utils.convert import convert_hifigan_generator
    from tts_tpu.vocoder.models.hifigan_generator import HifiganGenerator

    state, ins, outs, meta = _load("hifigan")
    m = meta["module"]
    params = convert_hifigan_generator(state)
    jg = HifiganGenerator(
        in_channels=m["in_channels"], out_channels=m["out_channels"],
        resblock_type=m["resblock_type"],
        resblock_dilation_sizes=tuple(map(tuple, m["resblock_dilation_sizes"])),
        resblock_kernel_sizes=tuple(m["resblock_kernel_sizes"]),
        upsample_kernel_sizes=tuple(m["upsample_kernel_sizes"]),
        upsample_initial_channel=m["upsample_initial_channel"],
        upsample_factors=tuple(m["upsample_factors"]),
    )
    wav = jg.apply(params, jnp.asarray(ins["mel"].transpose(0, 2, 1)))
    _wav_metrics("hifigan", outs["wav"][0, 0], np.asarray(wav)[0, :, 0])


def test_multiband_melgan_fidelity():
    from tts_tpu.utils.convert import convert_melgan_generator
    from tts_tpu.vocoder.models.melgan_generator import MultibandMelganGenerator

    state, ins, outs, meta = _load("multiband_melgan")
    params = convert_melgan_generator(
        state, num_upsample_stages=meta["num_upsample_stages"],
        num_res_blocks=meta["num_res_blocks"],
    )
    jm = MultibandMelganGenerator(
        in_channels=20, out_channels=4, base_channels=32,
        upsample_factors=(2, 2), num_res_blocks=2,
        inference_padding=meta["inference_padding"],
    )
    wav = jm.apply(
        params, jnp.asarray(ins["mel"].transpose(0, 2, 1)), method=jm.inference
    )
    _wav_metrics("multiband_melgan", outs["wav"][0, 0], np.asarray(wav)[0, :, 0])


def test_parallel_wavegan_fidelity():
    from tts_tpu.utils.convert import convert_parallel_wavegan_generator
    from tts_tpu.vocoder.models.parallel_wavegan_generator import (
        ParallelWaveganGenerator,
    )

    state, ins, outs, meta = _load("parallel_wavegan")
    params = convert_parallel_wavegan_generator(
        state, num_res_blocks=meta["num_res_blocks"],
        num_upsample_stages=meta["num_upsample_stages"],
    )
    jm = ParallelWaveganGenerator(
        num_res_blocks=6, stacks=3, res_channels=8, gate_channels=16,
        skip_channels=8, aux_channels=80, upsample_factors=(4, 4),
    )
    wav = jm.apply(
        params, jnp.asarray(ins["mel"].transpose(0, 2, 1)),
        jnp.asarray(ins["noise"].transpose(0, 2, 1)),
    )
    _wav_metrics("parallel_wavegan", outs["wav"][0, 0], np.asarray(wav)[0, :, 0])


def test_univnet_fidelity():
    from tts_tpu.utils.convert import convert_univnet_generator
    from tts_tpu.vocoder.models.univnet_generator import UnivnetGenerator

    state, ins, outs, meta = _load("univnet")
    params = convert_univnet_generator(
        state, num_blocks=meta["num_blocks"],
        kpnet_res_blocks=meta["kpnet_res_blocks"],
    )
    jm = UnivnetGenerator(
        in_channels=8, hidden_channels=8, cond_channels=20,
        upsample_factors=(2, 2), lvc_layers_each_block=2,
        kpnet_hidden_channels=8,
    )
    wav = jm.apply(
        params, jnp.asarray(ins["mel"].transpose(0, 2, 1)),
        x=jnp.asarray(ins["noise"].transpose(0, 2, 1)),
    )
    _wav_metrics("univnet", outs["wav"][0, 0], np.asarray(wav)[0, :, 0])


def test_wavegrad_fidelity():
    from tts_tpu.utils.convert import convert_wavegrad
    from tts_tpu.vocoder.models.wavegrad import Wavegrad

    state, ins, outs, meta = _load("wavegrad")
    params = convert_wavegrad(state)
    jm = Wavegrad(in_channels=20, y_conv_channels=8, x_conv_channels=24,
                  dblock_out_channels=(8, 12), ublock_out_channels=(24, 12, 8),
                  upsample_factors=(2, 2, 2), upsample_dilations=((1, 2, 1, 2),) * 3)
    y = jm.apply(
        params, jnp.asarray(ins["x"].transpose(0, 2, 1)),
        jnp.asarray(ins["mel"].transpose(0, 2, 1)),
        jnp.asarray(ins["noise_scale"]),
    )
    _wav_metrics("wavegrad", outs["wav"][0, 0], np.asarray(y)[0, :, 0])


def test_wavernn_fidelity():
    from tts_tpu.utils.convert import convert_wavernn
    from tts_tpu.vocoder.models.wavernn import Wavernn

    state, ins, outs, meta = _load("wavernn")
    params = convert_wavernn(
        state, num_res_blocks=meta["num_res_blocks"],
        num_upsample_stages=meta["num_upsample_stages"],
    )
    jm = Wavernn(rnn_dims=16, fc_dims=16, compute_dims=8, res_out_dims=8,
                 num_res_blocks=2, feat_dims=20, upsample_factors=(2, 2),
                 norm_type="folded")
    y = jm.apply(params, jnp.asarray(ins["x"]),
                 jnp.asarray(ins["mel"].transpose(0, 2, 1)))
    ref, ours = outs["logits"][0], np.asarray(y)[0]
    rmse = float(np.sqrt(np.mean((ref - ours) ** 2)))
    _record("wavernn", rmse=rmse, max_abs=np.max(np.abs(ref - ours)))
    assert rmse < 5e-3


def test_xtts_hifi_decoder_fidelity():
    from tts_tpu.utils.convert import convert_hifigan_generator
    from tts_tpu.vocoder.models.hifigan_generator import HifiganGenerator

    state, ins, outs, meta = _load("xtts_hifi_decoder")
    params = convert_hifigan_generator(state)
    jm = HifiganGenerator(
        in_channels=24, out_channels=1, resblock_type="1",
        resblock_dilation_sizes=((1, 3, 5),), resblock_kernel_sizes=(3,),
        upsample_kernel_sizes=(8, 8), upsample_initial_channel=32,
        upsample_factors=(4, 4), inference_padding=0, cond_channels=16,
        conv_post_bias=False, cond_in_each_up_layer=True,
    )
    wav = jm.apply(
        params, jnp.asarray(ins["latents"].transpose(0, 2, 1)),
        jnp.asarray(ins["spk"][:, :, 0])[:, None, :],
    )
    _wav_metrics("xtts_hifi_decoder", outs["wav"][0, 0], np.asarray(wav)[0, :, 0])


def test_encodec_decoder_fidelity():
    from tts_tpu.models.bark.encodec import EncodecDecoder, EncodecVocoder
    from tts_tpu.utils.convert import convert_encodec_decoder

    state, ins, outs, meta = _load("encodec_decoder")
    m = meta["module"]
    params, codebooks = convert_encodec_decoder(
        state, upsampling_ratios=tuple(m["upsampling_ratios"])
    )
    dec = EncodecDecoder(
        hidden_size=m["hidden_size"], num_filters=m["num_filters"],
        upsampling_ratios=tuple(m["upsampling_ratios"]),
        kernel_size=m["kernel_size"], last_kernel_size=m["last_kernel_size"],
        residual_kernel_size=m["residual_kernel_size"],
        num_lstm_layers=m["num_lstm_layers"],
        num_residual_layers=m["num_residual_layers"],
    )
    voc = EncodecVocoder(params, codebooks, dec)
    wav = voc.decode(ins["codes"][0])  # [n_q, T] -> wav
    _wav_metrics("encodec_decoder", outs["wav"].reshape(-1),
                 np.asarray(wav).reshape(-1))


def test_speaker_encoder_fidelity():
    from tts_tpu.encoder.model import ResNetSpeakerEncoder
    from tts_tpu.utils.convert import convert_resnet_speaker_encoder

    state, ins, outs, meta = _load("speaker_encoder_resnet")
    params = convert_resnet_speaker_encoder(state)
    module = ResNetSpeakerEncoder(
        input_dim=meta["input_dim"], proj_dim=meta["proj_dim"],
        log_input=True, norm_type="folded",
    )
    emb = module.apply(
        {"params": params}, jnp.asarray(ins["mel"].transpose(0, 2, 1)),
        l2_norm=True,
    )
    ref, ours = outs["emb"], np.asarray(emb)
    cos = np.sum(ref * ours, axis=-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(ours, axis=-1)
    )
    _record("speaker_encoder_resnet", one_minus_cos=float(np.max(1 - cos)),
            max_abs=np.max(np.abs(ref - ours)))
    assert np.all(cos > 0.9999), cos
