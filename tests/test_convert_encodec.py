"""EnCodec decoder parity: HF transformers ``EncodecModel`` (random-init,
reduced dims — the same architecture/weight layout as the ``facebook/
encodec_24khz`` checkpoint Bark uses) vs the flax decoder + converter.
Reference usage: TTS/tts/layers/bark/inference_funcs.py:599 codec_decode."""

import numpy as np
import pytest
import torch

torch.manual_seed(0)

tfe = pytest.importorskip("transformers.models.encodec.modeling_encodec")


def _small_config():
    return tfe.EncodecConfig(
        target_bandwidths=[16.0],  # → 8 quantizers at frame_rate 200
        sampling_rate=1600,
        audio_channels=1,
        num_filters=4,
        hidden_size=16,
        upsampling_ratios=[4, 2],
        codebook_size=32,
        codebook_dim=16,
        kernel_size=5,
        last_kernel_size=5,
        residual_kernel_size=3,
        num_lstm_layers=2,
        num_residual_layers=1,
    )


def _flax_decoder():
    from tts_tpu.models.bark.encodec import EncodecDecoder

    return EncodecDecoder(
        hidden_size=16, num_filters=4, upsampling_ratios=(4, 2),
        kernel_size=5, last_kernel_size=5, residual_kernel_size=3,
        num_lstm_layers=2, num_residual_layers=1,
    )


def test_encodec_decoder_parity():
    import jax.numpy as jnp

    from tts_tpu.utils.convert import convert_encodec_decoder

    ref = tfe.EncodecModel(_small_config()).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, codebooks = convert_encodec_decoder(
        state, upsampling_ratios=(4, 2))
    assert codebooks is not None and codebooks.shape[1:] == (32, 16)

    rng = np.random.RandomState(1)
    lat = rng.randn(2, 16, 12).astype(np.float32)  # torch layout [B, D, T]
    with torch.no_grad():
        want = ref.decoder(torch.from_numpy(lat)).numpy()  # [B, 1, T*8]
    got = _flax_decoder().apply(params, jnp.asarray(np.swapaxes(lat, 1, 2)))
    assert got.shape == (2, 12 * 8, 1)
    np.testing.assert_allclose(
        np.asarray(got)[:, :, 0], want[:, 0, :], atol=2e-5, rtol=1e-4
    )


def test_encodec_rvq_and_full_decode_parity():
    """codes → quantizer.decode → decoder, the exact reference codec_decode
    chain (inference_funcs.py:599-606)."""
    import jax.numpy as jnp

    from tts_tpu.models.bark.encodec import EncodecVocoder, rvq_decode
    from tts_tpu.utils.convert import convert_encodec_decoder

    ref = tfe.EncodecModel(_small_config()).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, codebooks = convert_encodec_decoder(state, upsampling_ratios=(4, 2))

    n_q = min(2, codebooks.shape[0])
    rng = np.random.RandomState(2)
    codes = rng.randint(0, 32, (n_q, 9)).astype(np.int64)

    with torch.no_grad():
        emb = ref.quantizer.decode(torch.from_numpy(codes)[:, None])  # [1, D, T]
        want = ref.decoder(emb).numpy()[0, 0]

    lat = rvq_decode(codes, jnp.asarray(codebooks))
    np.testing.assert_allclose(
        np.asarray(lat)[0], emb[0].numpy().T, atol=1e-5, rtol=1e-5
    )
    voc = EncodecVocoder(params, codebooks, _flax_decoder())
    got = voc.decode(codes)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_encodec_short_input_reflect_guard():
    """Inputs shorter than the conv padding exercise the zero-extend path
    of the reflect pad (HF ``_pad1d``)."""
    import jax.numpy as jnp

    from tts_tpu.utils.convert import convert_encodec_decoder

    ref = tfe.EncodecModel(_small_config()).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, _ = convert_encodec_decoder(state, upsampling_ratios=(4, 2))

    lat = np.random.RandomState(3).randn(1, 16, 2).astype(np.float32)
    with torch.no_grad():
        want = ref.decoder(torch.from_numpy(lat)).numpy()
    got = _flax_decoder().apply(params, jnp.asarray(np.swapaxes(lat, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(got)[:, :, 0], want[:, 0, :], atol=2e-5, rtol=1e-4
    )


def test_encodec_encoder_parity():
    """Encoder half: wav → latents, vs HF EncodecEncoder (used for Bark
    voice-cloning code prompts)."""
    import jax.numpy as jnp

    from tts_tpu.models.bark.encodec import EncodecEncoder
    from tts_tpu.utils.convert import convert_encodec_encoder

    ref = tfe.EncodecModel(_small_config()).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_encodec_encoder(state, upsampling_ratios=(4, 2))

    enc = EncodecEncoder(
        hidden_size=16, num_filters=4, upsampling_ratios=(4, 2),
        kernel_size=5, last_kernel_size=5, residual_kernel_size=3,
        num_lstm_layers=2, num_residual_layers=1,
    )
    rng = np.random.RandomState(4)
    wav = rng.randn(1, 1, 64).astype(np.float32) * 0.3
    with torch.no_grad():
        want = ref.encoder(torch.from_numpy(wav)).numpy()  # [1, D, T]
    got = enc.apply(params, jnp.asarray(np.transpose(wav, (0, 2, 1))))
    assert got.shape == (1, want.shape[2], 16)
    np.testing.assert_allclose(
        np.asarray(got)[0].T, want[0], atol=3e-5, rtol=1e-4
    )


def test_encodec_rvq_encode_parity_and_roundtrip():
    import jax.numpy as jnp

    from tts_tpu.models.bark.encodec import rvq_decode, rvq_encode
    from tts_tpu.utils.convert import convert_encodec_decoder

    ref = tfe.EncodecModel(_small_config()).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    _, codebooks = convert_encodec_decoder(state, upsampling_ratios=(4, 2))

    rng = np.random.RandomState(5)
    lat = rng.randn(1, 10, 16).astype(np.float32)
    n_q = min(3, codebooks.shape[0])

    bw = ref.config.target_bandwidths[0]
    with torch.no_grad():
        want = ref.quantizer.encode(
            torch.from_numpy(np.transpose(lat, (0, 2, 1))), bandwidth=None
        ).numpy()[:, 0]  # [n_q_default, T]
    got = np.asarray(rvq_encode(jnp.asarray(lat), jnp.asarray(codebooks), n_q))
    assert (got == want[:n_q]).all()

    # decode(encode(x)) approximates x progressively better with more stages
    e1 = np.abs(np.asarray(rvq_decode(got[:1], jnp.asarray(codebooks))) - lat).mean()
    e3 = np.abs(np.asarray(rvq_decode(got, jnp.asarray(codebooks))) - lat).mean()
    assert e3 <= e1
