"""DelightfulTTS reference-depth parity: every acoustic sublayer vs the
reference torch modules at reduced dims
(``TTS/tts/layers/delightful_tts/*``)."""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from ref_stubs import import_reference, install_reference_stubs

install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

D, H, T, B = 24, 2, 11, 2


def _np(t):
    return t.detach().numpy()


def _state(mod):
    return {k: _np(v) for k, v in mod.state_dict().items()}


def test_positional_encoding_parity():
    nets = import_reference("TTS.tts.layers.delightful_tts.networks")
    from tts_tpu.models.delightful_tts.acoustic import positional_encoding

    want = nets.positional_encoding(D, 17, device=torch.device("cpu")).numpy()
    got = np.asarray(positional_encoding(D, 17))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_conformer_parity():
    conf = import_reference("TTS.tts.layers.delightful_tts.conformer")
    nets = import_reference("TTS.tts.layers.delightful_tts.networks")
    from tts_tpu.models.delightful_tts.acoustic import Conformer
    from tts_tpu.utils.convert import convert_delightful_conformer

    torch.manual_seed(0)
    ref = conf.Conformer(
        dim=D, n_layers=2, n_heads=H, speaker_embedding_dim=8,
        p_dropout=0.0, kernel_size_conv_mod=7, lrelu_slope=0.3,
    ).eval()
    state = _state(ref)
    params = {"params": convert_delightful_conformer(state, "", 2)}

    rng = np.random.RandomState(1)
    x = rng.randn(B, T, D).astype(np.float32)
    spk = rng.randn(B, 8).astype(np.float32)
    lens = np.asarray([T, T - 3])
    mask = np.arange(T)[None] >= lens[:, None]
    enc = nets.positional_encoding(D, T, device=torch.device("cpu"))

    with torch.no_grad():
        want = ref(
            torch.from_numpy(x), torch.from_numpy(mask),
            speaker_embedding=torch.from_numpy(spk), encoding=enc,
        ).numpy()

    model = Conformer(dim=D, n_layers=2, n_heads=H, speaker_embedding_dim=8,
                      p_dropout=0.0, kernel_size_conv_mod=7, lrelu_slope=0.3)
    got = model.apply(params, jnp.asarray(x), jnp.asarray(mask),
                      jnp.asarray(spk), jnp.asarray(enc.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


REF_ENC_KW = dict(num_mels=20, ref_enc_filters=[8, 8, 16, 16, 24, 24],
                  ref_enc_size=3, ref_enc_strides=[1, 2, 1, 2, 1],
                  ref_enc_gru_size=16)


def test_reference_encoder_parity():
    encs = import_reference("TTS.tts.layers.delightful_tts.encoders")
    from tts_tpu.models.delightful_tts.acoustic import ReferenceEncoder
    from tts_tpu.utils.convert import convert_delightful_reference_encoder

    torch.manual_seed(1)
    ref = encs.ReferenceEncoder(**REF_ENC_KW).eval()
    state = _state(ref)
    params = {"params": convert_delightful_reference_encoder(state, "", 6)}

    rng = np.random.RandomState(2)
    T_mel = 16
    mels = rng.randn(B, 20, T_mel).astype(np.float32)  # torch [B, M, T]
    lens = torch.tensor([T_mel, T_mel - 5])

    with torch.no_grad():
        out, memory, mel_masks = ref(torch.from_numpy(mels), lens)

    model = ReferenceEncoder(**REF_ENC_KW)
    got_out, got_mem, got_mask = model.apply(
        params, jnp.asarray(np.swapaxes(mels, 1, 2)), jnp.asarray(lens.numpy())
    )
    np.testing.assert_array_equal(np.asarray(got_mask), mel_masks.numpy())
    # final hidden = last valid state (torch packs)
    np.testing.assert_allclose(np.asarray(got_mem), memory[0].numpy(), atol=3e-5, rtol=1e-4)
    # outputs at valid positions
    valid = ~mel_masks.numpy()
    np.testing.assert_allclose(
        np.asarray(got_out)[valid], out.numpy()[valid], atol=3e-5, rtol=1e-4
    )


def test_utterance_prosody_encoder_parity():
    encs = import_reference("TTS.tts.layers.delightful_tts.encoders")
    from tts_tpu.models.delightful_tts.acoustic import UtteranceLevelProsodyEncoder
    from tts_tpu.utils.convert import convert_delightful_utt_prosody

    torch.manual_seed(2)
    ref = encs.UtteranceLevelProsodyEncoder(
        **REF_ENC_KW, dropout=0.0, n_hidden=D, bottleneck_size_u=12, token_num=5,
    ).eval()
    state = {f"u.{k}": v for k, v in _state(ref).items()}
    params = {"params": convert_delightful_utt_prosody(state, "u.", 6)}

    rng = np.random.RandomState(3)
    T_mel = 16
    mels = rng.randn(B, 20, T_mel).astype(np.float32)
    lens = torch.tensor([T_mel, T_mel - 4])
    with torch.no_grad():
        want = ref(torch.from_numpy(mels), lens).numpy()

    model = UtteranceLevelProsodyEncoder(
        **REF_ENC_KW, dropout=0.0, n_hidden=D, bottleneck_size_u=12, token_num=5,
    )
    got = model.apply(params, jnp.asarray(np.swapaxes(mels, 1, 2)),
                      jnp.asarray(lens.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_phoneme_prosody_encoder_parity():
    encs = import_reference("TTS.tts.layers.delightful_tts.encoders")
    nets = import_reference("TTS.tts.layers.delightful_tts.networks")
    from tts_tpu.models.delightful_tts.acoustic import PhonemeLevelProsodyEncoder
    from tts_tpu.utils.convert import convert_delightful_phon_prosody

    torch.manual_seed(3)
    ref = encs.PhonemeLevelProsodyEncoder(
        **REF_ENC_KW, dropout=0.0, n_hidden=D, n_heads=H, bottleneck_size_p=6,
    ).eval()
    state = {f"p.{k}": v for k, v in _state(ref).items()}
    params = {"params": convert_delightful_phon_prosody(state, "p.", 6)}

    rng = np.random.RandomState(4)
    T_mel = 16
    x = rng.randn(B, T, D).astype(np.float32)
    mels = rng.randn(B, 20, T_mel).astype(np.float32)
    lens = torch.tensor([T_mel, T_mel - 4])
    src_lens = np.asarray([T, T - 2])
    src_mask = np.arange(T)[None] >= src_lens[:, None]
    enc = nets.positional_encoding(D, max(T, T_mel), device=torch.device("cpu"))

    with torch.no_grad():
        want = ref(
            x=torch.from_numpy(x), src_mask=torch.from_numpy(src_mask),
            mels=torch.from_numpy(mels), mel_lens=lens, encoding=enc,
        ).numpy()

    model = PhonemeLevelProsodyEncoder(
        **REF_ENC_KW, dropout=0.0, n_hidden=D, n_heads=H, bottleneck_size_p=6,
    )
    got = model.apply(
        params, jnp.asarray(x), jnp.asarray(src_mask),
        jnp.asarray(np.swapaxes(mels, 1, 2)), jnp.asarray(lens.numpy()),
        jnp.asarray(enc.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_variance_predictor_and_adaptor_parity():
    va = import_reference("TTS.tts.layers.delightful_tts.pitch_adaptor")
    from tts_tpu.models.delightful_tts.acoustic import VarianceAdaptor
    from tts_tpu.utils.convert import convert_delightful_adaptor

    torch.manual_seed(4)
    ref = va.PitchAdaptor(
        n_input=D, n_hidden=16, n_out=1, kernel_size=5, emb_kernel_size=3,
        p_dropout=0.0, lrelu_slope=0.3,
    ).eval()
    state = {f"a.{k}": v for k, v in _state(ref).items()}
    params = {"params": convert_delightful_adaptor(state, "a.", "pitch")}

    rng = np.random.RandomState(5)
    T_mel = 20
    x = rng.randn(B, T, D).astype(np.float32)
    target = rng.randn(B, 1, T_mel).astype(np.float32)  # torch [B, 1, T_mel]
    dr = np.zeros((B, T), np.int64)
    dr[0, : T - 1] = 2
    dr[0, 0] += T_mel - 2 * (T - 1)
    dr[1] = 1
    dr[1, 0] += T_mel - T
    lens = np.asarray([T, T - 2])
    mask = np.arange(T)[None] >= lens[:, None]

    with torch.no_grad():
        pred, avg, emb = ref.get_pitch_embedding_train(
            torch.from_numpy(x), torch.from_numpy(target),
            torch.from_numpy(dr), torch.from_numpy(mask),
        )

    model = VarianceAdaptor(n_input=D, n_hidden=16, kernel_size=5,
                            emb_kernel_size=3, p_dropout=0.0, lrelu_slope=0.3)
    got_pred, got_avg, got_emb = model.apply(
        params, jnp.asarray(x), jnp.asarray(np.swapaxes(target, 1, 2)),
        jnp.asarray(dr), jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(got_pred), pred[:, 0].numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_avg)[:, :, 0], avg[:, 0].numpy(), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_emb), np.swapaxes(emb.numpy(), 1, 2), atol=3e-5, rtol=1e-4
    )


def test_phoneme_prosody_predictor_parity():
    pp = import_reference("TTS.tts.layers.delightful_tts.phoneme_prosody_predictor")
    from tts_tpu.models.delightful_tts.acoustic import PhonemeProsodyPredictor
    from tts_tpu.utils.convert import convert_delightful_prosody_predictor

    torch.manual_seed(5)
    ref = pp.PhonemeProsodyPredictor(
        hidden_size=D, kernel_size=5, dropout=0.0, bottleneck_size=6, lrelu_slope=0.3
    ).eval()
    state = {f"q.{k}": v for k, v in _state(ref).items()}
    params = {"params": convert_delightful_prosody_predictor(state, "q.")}

    rng = np.random.RandomState(6)
    x = rng.randn(B, T, D).astype(np.float32)
    lens = np.asarray([T, T - 2])
    mask = np.arange(T)[None] >= lens[:, None]
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(mask)).numpy()
    got = PhonemeProsodyPredictor(
        hidden_size=D, kernel_size=5, dropout=0.0, bottleneck_size=6, lrelu_slope=0.3
    ).apply(params, jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_acoustic_model_full_parity():
    """Full reference AcousticModel forward + inference vs the flax port
    (reduced dims, d-vector conditioning, ground-truth prosody)."""
    am_mod = import_reference("TTS.tts.layers.delightful_tts.acoustic_model")
    from tts_tpu.models.delightful_tts.acoustic_model import AcousticModel
    from tts_tpu.models.delightful_tts.config import DelightfulTtsArgs
    from tts_tpu.utils.convert import convert_delightful_acoustic

    args = DelightfulTtsArgs(
        num_chars=30,
        n_hidden_conformer_encoder=D, n_layers_conformer_encoder=2,
        n_heads_conformer_encoder=H, dropout_conformer_encoder=0.0,
        kernel_size_conv_mod_conformer_encoder=7,
        n_hidden_conformer_decoder=D, n_layers_conformer_decoder=2,
        n_heads_conformer_decoder=H, dropout_conformer_decoder=0.0,
        kernel_size_conv_mod_conformer_decoder=7,
        bottleneck_size_p_reference_encoder=4,
        bottleneck_size_u_reference_encoder=12,
        ref_enc_filters_reference_encoder=[8, 8, 16, 16, 24, 24],
        ref_enc_size_reference_encoder=3,
        ref_enc_strides_reference_encoder=[1, 2, 1, 2, 1],
        ref_enc_gru_size_reference_encoder=16,
        token_num_reference_encoder=5,
        predictor_kernel_size_reference_encoder=5,
        n_hidden_variance_adaptor=D, kernel_size_variance_adaptor=5,
        dropout_variance_adaptor=0.0, emb_kernel_size_variance_adaptor=3,
        use_d_vector_file=True, d_vector_dim=8,
    )
    M = 20

    class _RefArgs:  # reference args duck-type (Coqpit attrs)
        pass

    ra = _RefArgs()
    for k, v in vars(args).items():
        setattr(ra, k, v)
    ra.kernel_size_depthwise_conformer_encoder = 7
    ra.kernel_size_depthwise_conformer_decoder = 7
    ra.ref_enc_pad_reference_encoder = [1, 1]
    ra.ref_attention_dropout_reference_encoder = 0.0
    ra.n_bins_variance_adaptor = 256
    ra.out_channels = M
    ra.num_mels = M
    ra.speakers_file = None
    ra.d_vector_file = None

    class _Chars:
        pad_id = 0

    class _Tok:
        characters = _Chars()

    torch.manual_seed(6)
    ref = am_mod.AcousticModel(args=ra, tokenizer=_Tok(), speaker_manager=None).eval()
    state = _state(ref)
    params = convert_delightful_acoustic(state, 2, 2, n_ref_convs=6)

    model = AcousticModel(args=args, num_mels=M)

    rng = np.random.RandomState(7)
    T_src, T_mel = 9, 24
    tokens = rng.randint(1, 30, (B, T_src))
    src_lens = np.asarray([T_src, T_src - 2])
    mels = rng.randn(B, M, T_mel).astype(np.float32)
    mel_lens = np.asarray([T_mel, T_mel - 5])
    pitches = rng.randn(B, 1, T_mel).astype(np.float32)
    energies = rng.randn(B, 1, T_mel).astype(np.float32)
    dvec = rng.randn(B, 8).astype(np.float32)

    with torch.no_grad():
        want = ref(
            tokens=torch.from_numpy(tokens), src_lens=torch.from_numpy(src_lens),
            mels=torch.from_numpy(mels), mel_lens=torch.from_numpy(mel_lens),
            pitches=torch.from_numpy(pitches), energies=torch.from_numpy(energies),
            attn_priors=None, use_ground_truth=True,
            d_vectors=torch.from_numpy(dvec),
        )

    got = model.apply(
        {"params": params["params"]},
        jnp.asarray(tokens), jnp.asarray(src_lens),
        jnp.asarray(np.swapaxes(mels, 1, 2)), jnp.asarray(mel_lens),
        jnp.asarray(np.transpose(pitches, (0, 2, 1))),
        jnp.asarray(np.transpose(energies, (0, 2, 1))),
        d_vectors=jnp.asarray(dvec),
    )

    np.testing.assert_array_equal(
        np.asarray(got["aligner_durations"]), want["aligner_durations"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(got["u_prosody_ref"]), want["u_prosody_ref"].numpy(),
        atol=5e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["p_prosody_ref"]), want["p_prosody_ref"].numpy(),
        atol=5e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["pitch_pred"]), want["pitch_pred"][:, 0].numpy(),
        atol=5e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["dr_log_pred"]), want["dr_log_pred"].numpy(),
        atol=5e-5, rtol=1e-4,
    )
    # the headline: predicted mel
    np.testing.assert_allclose(
        np.asarray(got["model_outputs"]), want["model_outputs"].numpy(),
        atol=2e-4, rtol=1e-3,
    )

    # inference path runs and produces sane shapes
    inf = model.apply(
        {"params": params["params"]},
        jnp.asarray(tokens[:1]), jnp.asarray(src_lens[:1]),
        d_vectors=jnp.asarray(dvec[:1]), max_frames=64,
        method=model.inference,
    )
    assert inf["model_outputs"].shape[2] == M
    assert np.isfinite(np.asarray(inf["model_outputs"])).all()
