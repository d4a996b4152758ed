#!/usr/bin/env python
"""Generate the golden-mel fidelity corpus (run ONCE, fixtures committed).

For each converted model family, instantiate the REFERENCE torch modules
(/root/reference, PUBLIC UNTRUSTED CODE — executed only to produce
ground-truth tensors) at tiny-but-structurally-complete dims with fixed
seeds, run a DETERMINISTIC inference/forward (noise scales zeroed, noise
inputs pinned), and store {state_dict, inputs, golden outputs, meta} into
``tests/fixtures/fidelity/<family>.npz``.

``tests/test_fidelity_corpus.py`` then replays each fixture torch-free:
convert the stored state dict with ``tts_tpu.utils.convert``, run our
model, and record per-family mel-distortion numbers into ``FIDELITY.json``
(the BASELINE.json north star: "output fidelity within mel-distortion
tolerance").  Env is zero-egress, so golden outputs come from reference
*code* at fixed seeds rather than real zoo checkpoints (VERDICT r4 item 5).
"""

import json
import os
import sys

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "fidelity")
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

from ref_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()


def _np_state(mod_or_dict, prefix=""):
    if isinstance(mod_or_dict, dict):
        items = mod_or_dict.items()
    else:
        items = mod_or_dict.state_dict().items()
    return {f"{prefix}{k}": np.asarray(v.detach().numpy() if torch.is_tensor(v) else v)
            for k, v in items}


def _seeded_load(module_dict_or_mod, seed):
    """Replace a torch module's weights with seeded numpy gaussians (via
    tests/helpers.synth_state_from_manifest) and return (state_np, manifest).

    Committing a 60 MB state dict per family is not viable; the manifest
    (name -> shape/dtype) + seed reconstructs the exact same state torch-free
    in the replay test, while golden outputs stay frozen in the fixture.
    """
    from helpers import synth_state_from_manifest

    mod = module_dict_or_mod
    manifest = {
        k: [list(v.shape), str(v.numpy().dtype)]
        for k, v in mod.state_dict().items()
    }
    state = synth_state_from_manifest(manifest, seed)
    mod.load_state_dict({k: torch.from_numpy(v) for k, v in state.items()})
    return state, manifest


def _save(family, state, inputs, outputs, meta):
    os.makedirs(OUT_DIR, exist_ok=True)
    arrs = {}
    for k, v in state.items():
        arrs[f"sd/{k}"] = v
    for k, v in inputs.items():
        arrs[f"in/{k}"] = v
    for k, v in outputs.items():
        arrs[f"out/{k}"] = v
    arrs["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    path = os.path.join(OUT_DIR, f"{family}.npz")
    np.savez_compressed(path, **arrs)
    kb = os.path.getsize(path) / 1024
    print(f" > {family}: {len(state)} tensors, {kb:.0f} KiB -> {path}")


# ---------------------------------------------------------------------------
# VITS: full text -> waveform, reference inference composition
# (TTS/tts/models/vits.py:1125-1161) with noise scales zeroed.
# ---------------------------------------------------------------------------

def gen_vits():
    from TTS.tts.layers.vits.networks import (
        PosteriorEncoder, ResidualCouplingBlocks, TextEncoder,
    )
    from TTS.tts.layers.vits.stochastic_duration_predictor import (
        StochasticDurationPredictor,
    )
    from TTS.tts.utils.helpers import generate_path, sequence_mask
    from TTS.vocoder.models.hifigan_generator import HifiganGenerator

    HIDDEN, SPEC_CH, NUM_CHARS = 32, 65, 181
    torch.manual_seed(0)
    text_encoder = TextEncoder(NUM_CHARS, HIDDEN, HIDDEN, 64, 2, 2, 3, 0.0)
    posterior_encoder = PosteriorEncoder(SPEC_CH, HIDDEN, HIDDEN, 5, 1, 2)
    flow = ResidualCouplingBlocks(HIDDEN, HIDDEN, 5, 1, 2)
    duration_predictor = StochasticDurationPredictor(HIDDEN, 192, 3, 0.5, 4)
    waveform_decoder = HifiganGenerator(
        HIDDEN, 1, "1", [[1, 3, 5]], [3], [8, 8], 64, [4, 4],
        inference_padding=0, conv_pre_weight_norm=False,
        conv_post_weight_norm=False, conv_post_bias=False,
    )
    mods = {
        "text_encoder": text_encoder, "posterior_encoder": posterior_encoder,
        "flow": flow, "duration_predictor": duration_predictor,
        "waveform_decoder": waveform_decoder,
    }
    for m in mods.values():
        m.eval()

    rs = np.random.RandomState(0)
    x = rs.randint(1, NUM_CHARS, (2, 13)).astype(np.int64)
    xl = np.array([13, 9], np.int64)
    with torch.no_grad():
        xt, xlt = torch.from_numpy(x), torch.from_numpy(xl)
        h, m_p, logs_p, x_mask = text_encoder(xt, xlt)
        logw = duration_predictor(h, x_mask, reverse=True, noise_scale=0.0)
        w = torch.exp(logw) * x_mask  # length_scale = 1
        w_ceil = torch.ceil(w)
        y_lengths = torch.clamp_min(torch.sum(w_ceil, [1, 2]), 1).long()
        y_mask = sequence_mask(y_lengths, None).to(x_mask.dtype).unsqueeze(1)
        attn_mask = x_mask * y_mask.transpose(1, 2)
        attn = generate_path(w_ceil.squeeze(1), attn_mask.squeeze(1).transpose(1, 2))
        m_p_e = torch.matmul(attn.transpose(1, 2), m_p.transpose(1, 2)).transpose(1, 2)
        z_p = m_p_e  # inference_noise_scale = 0
        z = flow(z_p, y_mask, reverse=True)
        # decode at the same 32-multiple static frame budget our inference
        # uses, so conv boundary effects match and the comparison is exact
        maxf = int(int((y_lengths.max() + 31) // 32) * 32)
        pad = maxf - z.shape[-1]
        z = torch.nn.functional.pad(z, (0, pad))
        y_mask_p = torch.nn.functional.pad(y_mask, (0, pad))
        wav = waveform_decoder(z * y_mask_p).numpy()

    state = {}
    for prefix, mod in mods.items():
        state.update(_np_state(mod, f"{prefix}."))
    _save(
        "vits", state,
        {"text": x, "text_lengths": xl},
        {"wav": wav, "y_lengths": y_lengths.numpy()},
        {
            "kind": "wav", "hop": 16, "sample_rate": 22050,
            "upsample_total": 16,
            "args": {
                "num_chars": NUM_CHARS, "out_channels": SPEC_CH,
                "hidden_channels": HIDDEN,
                "hidden_channels_ffn_text_encoder": 64,
                "num_heads_text_encoder": 2, "num_layers_text_encoder": 2,
                "kernel_size_text_encoder": 3,
                "num_layers_posterior_encoder": 2, "num_layers_flow": 2,
                "upsample_rates_decoder": [4, 4],
                "upsample_kernel_sizes_decoder": [8, 8],
                "upsample_initial_channel_decoder": 64,
                "resblock_kernel_sizes_decoder": [3],
                "resblock_dilation_sizes_decoder": [[1, 3, 5]],
                "use_sdp": True,
            },
        },
    )


# ---------------------------------------------------------------------------
# GlowTTS: full text -> mel, reference inference (glow_tts.py:342-364),
# noise scale 0.
# ---------------------------------------------------------------------------

def gen_glow_tts():
    from TTS.tts.layers.glow_tts.decoder import Decoder
    from TTS.tts.layers.glow_tts.encoder import Encoder
    from TTS.tts.utils.helpers import generate_path, sequence_mask

    NUM_CHARS = 181
    enc_params = {"kernel_size": 3, "dropout_p": 0.0, "num_layers": 2,
                  "num_heads": 2, "hidden_channels_ffn": 64,
                  "rel_attn_window_size": 4}
    torch.manual_seed(0)
    enc = Encoder(NUM_CHARS, out_channels=20, hidden_channels=32,
                  hidden_channels_dp=48, encoder_type="rel_pos_transformer",
                  encoder_params=enc_params, mean_only=True, use_prenet=True)
    dec = Decoder(20, 24, 5, 1, 2, 2, num_splits=4, num_squeeze=2)
    for f in dec.flows:
        if hasattr(f, "initialized"):
            f.initialized = True
        if hasattr(f, "set_ddi"):
            f.set_ddi(False)
    enc.eval(), dec.eval()

    rs = np.random.RandomState(1)
    # B=1, unpadded: the reference's clamp_min(ceil(w), 1) assigns padded
    # tokens duration 1, a padded-batch quirk its own usage never hits
    x = rs.randint(1, NUM_CHARS, (1, 11)).astype(np.int64)
    xl = np.array([11], np.int64)
    with torch.no_grad():
        o_mean, o_log_scale, o_dur_log, x_mask = enc(
            torch.from_numpy(x), torch.from_numpy(xl)
        )
        w = (torch.exp(o_dur_log) - 1) * x_mask  # length_scale = 1
        w_ceil = torch.clamp_min(torch.ceil(w), 1)
        y_lengths = torch.clamp_min(torch.sum(w_ceil, [1, 2]), 1).long()
        # decoder squeezes by 2: reference pads y_max_length to a multiple
        # inside preprocess(); mirror our num_squeeze floor instead and trim
        y_lengths = (y_lengths // 2) * 2
        y_mask = torch.unsqueeze(
            sequence_mask(y_lengths, None), 1
        ).to(x_mask.dtype)
        attn_mask = torch.unsqueeze(x_mask, -1) * torch.unsqueeze(y_mask, 2)
        attn = generate_path(w_ceil.squeeze(1), attn_mask.squeeze(1)).unsqueeze(1)
        y_mean = torch.matmul(
            attn.squeeze(1).transpose(1, 2), o_mean.transpose(1, 2)
        ).transpose(1, 2)
        z = y_mean * y_mask  # inference_noise_scale = 0
        y, _ = dec(z, y_mask, reverse=True)
        mel = y.transpose(1, 2).numpy()  # [B, T, C]

    state = {}
    state.update(_np_state(enc, "encoder."))
    state.update(_np_state(dec, "decoder."))
    _save(
        "glow_tts", state,
        {"text": x, "text_lengths": xl},
        {"mel": mel, "y_lengths": y_lengths.numpy()},
        {
            "kind": "mel",
            "config": {
                "num_chars": NUM_CHARS, "out_channels": 20,
                "hidden_channels_enc": 32, "hidden_channels_dec": 24,
                "hidden_channels_dp": 48, "encoder_params": enc_params,
                "num_flow_blocks_dec": 2, "num_block_layers": 2,
                "num_splits": 4, "num_squeeze": 2, "mean_only": True,
                "inference_noise_scale": 0.0, "dropout_p_dp": 0.0,
                "dropout_p_dec": 0.0,
            },
        },
    )


# ---------------------------------------------------------------------------
# FastPitch (ForwardTTS): full reference model, deterministic inference
# (forward_tts.py:687).
# ---------------------------------------------------------------------------

def gen_fastpitch():
    from TTS.tts.models.forward_tts import ForwardTTS as RefForwardTTS
    from TTS.tts.models.forward_tts import ForwardTTSArgs as RefArgs

    torch.manual_seed(0)
    args = RefArgs(
        num_chars=40, out_channels=20, hidden_channels=32,
        use_pitch=True, use_energy=False, use_aligner=True,
        duration_predictor_hidden_channels=48,
        pitch_predictor_hidden_channels=48,
        encoder_params={"hidden_channels_ffn": 64, "num_heads": 2,
                        "num_layers": 2, "dropout_p": 0.0},
        decoder_params={"hidden_channels_ffn": 64, "num_heads": 2,
                        "num_layers": 2, "dropout_p": 0.0},
    )
    m = RefForwardTTS(args)
    m.eval()
    x = np.array([[3, 7, 11, 2, 9, 14, 5]], np.int64)  # B=1: reference
    # aligner masks break on padded batches at inference (upstream quirk)
    xl = np.array([7], np.int64)
    with torch.no_grad():
        out = m.inference(
            torch.from_numpy(x), aux_input={"x_lengths": torch.from_numpy(xl)}
        )
    mel = out["model_outputs"].numpy()
    _save(
        "fastpitch", _np_state(m),
        {"text": x, "text_lengths": xl},
        {"mel": mel},
        {"kind": "mel", "hidden_channels": 32, "out_channels": 20,
         "num_chars": 40},
    )


# ---------------------------------------------------------------------------
# Tacotron2: teacher-forced forward (deterministic; AR stop behavior with
# random weights is not well-defined), reference composition per
# TTS/tts/models/tacotron2.py:186-224.
# ---------------------------------------------------------------------------

def gen_tacotron2():
    from TTS.tts.layers.tacotron.tacotron2 import Decoder, Encoder, Postnet

    NUM_CHARS, R, T_IN, T_MEL, B = 30, 2, 9, 12, 2
    torch.manual_seed(0)

    class RefT2(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = torch.nn.Embedding(NUM_CHARS, 512)
            self.encoder = Encoder(512)
            self.decoder = Decoder(
                512, 80, R, "original", False, "softmax", "original", True,
                forward_attn=False, trans_agent=False, forward_attn_mask=False,
                location_attn=True, attn_K=5, separate_stopnet=True,
                max_decoder_steps=500,
            )
            self.postnet = Postnet(80)

    model = RefT2()
    model.eval()
    # the full 512-dim state is ~100 MB: commit a shape manifest + seed
    # instead; the replay test reconstructs identical weights torch-free
    _, manifest = _seeded_load(model, seed=1234)

    rs = np.random.RandomState(0)
    text = rs.randint(1, NUM_CHARS, (B, T_IN)).astype(np.int64)
    mel = rs.randn(B, T_MEL, 80).astype(np.float32)
    with torch.no_grad():
        emb = model.embedding(torch.from_numpy(text)).transpose(1, 2)
        enc = model.encoder(emb, torch.full((B,), T_IN))
        mask = torch.ones(B, T_IN, dtype=torch.bool)
        dec, aligns, _ = model.decoder(enc, torch.from_numpy(mel), mask)
        post = model.postnet(dec)
        golden = (dec + post).transpose(1, 2).numpy()  # [B, T, 80]

    _save(
        "tacotron2", {},
        {"text": text, "mel": mel},
        {"mel": golden, "alignments": aligns.numpy()},
        {"kind": "mel", "teacher_forced": True, "num_chars": NUM_CHARS, "r": R,
         "state_seed": 1234, "state_manifest": manifest},
    )


# ---------------------------------------------------------------------------
# Vocoders: mel (+ pinned noise where the generator consumes noise) -> wav.
# ---------------------------------------------------------------------------

def gen_hifigan():
    from TTS.vocoder.models.hifigan_generator import HifiganGenerator

    torch.manual_seed(0)
    g = HifiganGenerator(
        in_channels=20, out_channels=1, resblock_type="1",
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
        resblock_kernel_sizes=[3, 7], upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=32, upsample_factors=[4, 4],
    )
    g.eval()
    g.remove_weight_norm()
    mel = np.random.RandomState(0).randn(1, 20, 31).astype(np.float32)
    with torch.no_grad():
        wav = g(torch.from_numpy(mel)).numpy()
    _save(
        "hifigan", _np_state(g), {"mel": mel}, {"wav": wav},
        {"kind": "wav", "upsample_total": 16,
         "module": {"in_channels": 20, "out_channels": 1, "resblock_type": "1",
                    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
                    "resblock_kernel_sizes": [3, 7],
                    "upsample_kernel_sizes": [8, 8],
                    "upsample_initial_channel": 32,
                    "upsample_factors": [4, 4]}},
    )


def gen_melgan():
    from TTS.vocoder.models.multiband_melgan_generator import (
        MultibandMelganGenerator,
    )

    torch.manual_seed(1)
    g = MultibandMelganGenerator(
        in_channels=20, out_channels=4, proj_kernel=7, base_channels=32,
        upsample_factors=(2, 2), num_res_blocks=2,
    )
    g.eval()
    g.remove_weight_norm()
    mel = np.random.RandomState(1).randn(1, 20, 23).astype(np.float32)
    with torch.no_grad():
        wav = g.inference(torch.from_numpy(mel)).numpy()  # PQMF synthesis
    _save(
        "multiband_melgan", _np_state(g), {"mel": mel}, {"wav": wav},
        {"kind": "wav", "upsample_total": 16, "num_res_blocks": 2,
         "num_upsample_stages": 2, "inference_padding": 2},
    )


def gen_parallel_wavegan():
    from TTS.vocoder.models.parallel_wavegan_generator import (
        ParallelWaveganGenerator,
    )

    torch.manual_seed(0)
    g = ParallelWaveganGenerator(
        in_channels=1, out_channels=1, kernel_size=3, num_res_blocks=6,
        stacks=3, res_channels=8, gate_channels=16, skip_channels=8,
        aux_channels=80, upsample_factors=[4, 4],
    )
    g.eval()
    g.remove_weight_norm()
    rs = np.random.RandomState(0)
    mel = rs.randn(1, 80, 19).astype(np.float32)
    noise = rs.randn(1, 1, 19 * 16).astype(np.float32)
    import unittest.mock as mock

    with torch.no_grad(), mock.patch(
        "torch.randn", lambda *a, **k: torch.from_numpy(noise.copy())
    ):
        wav = g(torch.from_numpy(mel)).numpy()
    _save(
        "parallel_wavegan", _np_state(g), {"mel": mel, "noise": noise},
        {"wav": wav},
        {"kind": "wav", "upsample_total": 16, "num_res_blocks": 6,
         "num_upsample_stages": 2},
    )


def gen_univnet():
    from TTS.vocoder.models.univnet_generator import UnivnetGenerator

    torch.manual_seed(0)
    g = UnivnetGenerator(
        in_channels=8, out_channels=1, hidden_channels=8, cond_channels=20,
        upsample_factors=[2, 2], lvc_layers_each_block=2, lvc_kernel_size=3,
        kpnet_hidden_channels=8, kpnet_conv_size=3, dropout=0.0,
    )
    g.eval()
    g.remove_weight_norm()
    rs = np.random.RandomState(0)
    mel = rs.randn(1, 20, 17).astype(np.float32)
    noise = rs.randn(1, 8, 17).astype(np.float32)
    import unittest.mock as mock

    with torch.no_grad(), mock.patch(
        "torch.randn", lambda *a, **k: torch.from_numpy(noise.copy())
    ):
        wav = g(torch.from_numpy(mel)).numpy()
    _save(
        "univnet", _np_state(g), {"mel": mel, "noise": noise}, {"wav": wav},
        {"kind": "wav", "upsample_total": 4, "num_blocks": 2,
         "kpnet_res_blocks": 3},
    )


def gen_wavegrad():
    from TTS.vocoder.models.wavegrad import Wavegrad as RefWavegrad
    from TTS.vocoder.models.wavegrad import WavegradArgs

    class FakeConfig:
        def __init__(self, p):
            self.model_params = p

        def __contains__(self, k):
            return hasattr(self, k)

    torch.manual_seed(0)
    args = WavegradArgs(
        in_channels=20, out_channels=1, use_weight_norm=False,
        y_conv_channels=8, x_conv_channels=24,
        dblock_out_channels=[8, 12], ublock_out_channels=[24, 12, 8],
        upsample_factors=[2, 2, 2], upsample_dilations=[[1, 2, 1, 2]] * 3,
    )
    g = RefWavegrad(FakeConfig(args))
    g.eval()
    rs = np.random.RandomState(0)
    mel = rs.randn(1, 20, 9).astype(np.float32)
    x = rs.randn(1, 1, 72).astype(np.float32)
    noise_scale = np.asarray([0.37], np.float32)
    with torch.no_grad():
        y = g(torch.from_numpy(x), torch.from_numpy(mel),
              torch.from_numpy(noise_scale)).numpy()
    _save(
        "wavegrad", _np_state(g), {"mel": mel, "x": x, "noise_scale": noise_scale},
        {"wav": y},
        {"kind": "wav", "upsample_total": 8},
    )


def gen_wavernn():
    import TTS.vocoder.models.wavernn as ref_wrn

    ref_wrn.AudioProcessor = lambda **kw: None

    class AudioObj:
        hop_length = 4

        def to_dict(self):
            return {}

    class FakeConfig:
        def __init__(self, p):
            self.model_args = p
            self.audio = AudioObj()

        def __contains__(self, k):
            return hasattr(self, k)

    torch.manual_seed(0)
    wargs = ref_wrn.WavernnArgs(
        rnn_dims=16, fc_dims=16, compute_dims=8, res_out_dims=8,
        num_res_blocks=2, use_aux_net=True, use_upsample_net=True,
        upsample_factors=[2, 2], feat_dims=20, mode="mold", mulaw=True, pad=2,
    )
    m = ref_wrn.Wavernn(FakeConfig(wargs))
    m.eval()
    rs = np.random.RandomState(0)
    mel = rs.randn(1, 20, 12).astype(np.float32)
    x = rs.randn(1, (12 - 4) * 4).astype(np.float32)
    with torch.no_grad():
        y = m(torch.from_numpy(x), torch.from_numpy(mel)).numpy()
    _save(
        "wavernn", _np_state(m), {"mel": mel, "x": x}, {"logits": y},
        {"kind": "raw", "num_res_blocks": 2, "num_upsample_stages": 2},
    )


# ---------------------------------------------------------------------------
# XTTS HiFi decoder (latents -> wav; the audio end of the flagship) and
# EnCodec decoder (codes -> wav; Bark's audio end, HF transformers layout).
# ---------------------------------------------------------------------------

def gen_xtts_hifi_decoder():
    from TTS.tts.layers.xtts.hifigan_decoder import HifiganGenerator

    torch.manual_seed(0)
    g = HifiganGenerator(
        24, 1, "1", [[1, 3, 5]], [3], [8, 8], 32, [4, 4],
        inference_padding=0, cond_channels=16, conv_pre_weight_norm=False,
        conv_post_weight_norm=False, conv_post_bias=False,
        cond_in_each_up_layer=True,
    )
    g.eval()  # weight norm left in place: the converter folds it
    rs = np.random.RandomState(0)
    latents = rs.randn(1, 24, 21).astype(np.float32)
    spk = rs.randn(1, 16, 1).astype(np.float32)
    with torch.no_grad():
        wav = g(torch.from_numpy(latents), g=torch.from_numpy(spk)).numpy()
    _save(
        "xtts_hifi_decoder", _np_state(g), {"latents": latents, "spk": spk},
        {"wav": wav},
        {"kind": "wav", "upsample_total": 16},
    )


def gen_encodec_decoder():
    from transformers.models.encodec import modeling_encodec as tfe

    torch.manual_seed(0)
    cfg = tfe.EncodecConfig(
        target_bandwidths=[16.0], sampling_rate=1600, audio_channels=1,
        num_filters=4, hidden_size=16, upsampling_ratios=[4, 2],
        codebook_size=32, codebook_dim=16, kernel_size=5, last_kernel_size=5,
        residual_kernel_size=3, num_lstm_layers=2, num_residual_layers=1,
    )
    m = tfe.EncodecModel(cfg).eval()
    rs = np.random.RandomState(0)
    codes = rs.randint(0, 32, (1, 8, 15)).astype(np.int64)  # [B, n_q, T]
    with torch.no_grad():
        wav = m.decode(
            torch.from_numpy(codes)[None], audio_scales=[None]
        ).audio_values.numpy()
    _save(
        "encodec_decoder", _np_state(m), {"codes": codes}, {"wav": wav},
        {"kind": "wav", "upsample_total": 8,
         "module": {"hidden_size": 16, "num_filters": 4,
                    "upsampling_ratios": [4, 2], "kernel_size": 5,
                    "last_kernel_size": 5, "residual_kernel_size": 3,
                    "num_lstm_layers": 2, "num_residual_layers": 1}},
    )


# ---------------------------------------------------------------------------
# Speaker encoder (d-vector cosine fidelity).
# ---------------------------------------------------------------------------

def gen_speaker_encoder():
    # default layer/filter layout: the reference hardcodes attention dims to
    # it, and it is the exact net inside every XTTS checkpoint
    from TTS.tts.layers.xtts.hifigan_decoder import ResNetSpeakerEncoder

    torch.manual_seed(1)
    m = ResNetSpeakerEncoder(
        input_dim=64, proj_dim=512, log_input=True, use_torch_spec=False
    )
    m.eval()
    _, manifest = _seeded_load(m, seed=4321)  # ~29 MB state -> manifest+seed
    mel = np.abs(np.random.RandomState(4).randn(2, 64, 80)).astype(np.float32) + 0.1
    with torch.no_grad():
        emb = m(torch.from_numpy(mel), l2_norm=True).numpy()
    _save(
        "speaker_encoder_resnet", {}, {"mel": mel}, {"emb": emb},
        {"kind": "embedding", "proj_dim": 512, "input_dim": 64,
         "state_seed": 4321, "state_manifest": manifest},
    )


FAMILIES = {
    "vits": gen_vits,
    "glow_tts": gen_glow_tts,
    "fastpitch": gen_fastpitch,
    "tacotron2": gen_tacotron2,
    "hifigan": gen_hifigan,
    "multiband_melgan": gen_melgan,
    "parallel_wavegan": gen_parallel_wavegan,
    "univnet": gen_univnet,
    "wavegrad": gen_wavegrad,
    "wavernn": gen_wavernn,
    "xtts_hifi_decoder": gen_xtts_hifi_decoder,
    "encodec_decoder": gen_encodec_decoder,
    "speaker_encoder_resnet": gen_speaker_encoder,
}


if __name__ == "__main__":
    only = sys.argv[1:]
    failures = []
    for name, fn in FAMILIES.items():
        if only and name not in only:
            continue
        try:
            fn()
        except Exception as e:  # keep going; report at the end
            import traceback

            traceback.print_exc()
            failures.append((name, str(e)))
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("corpus complete")
