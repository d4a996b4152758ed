"""iSTFT synthesis head (MB-iSTFT-VITS, arXiv:2210.15975): OLA-iSTFT
numerics, generator shapes, and the VITS decoder_type="istft" wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from helpers import fast_params


def test_istft_overlap_add_roundtrip():
    """forward windowed rfft → istft_overlap_add reconstructs the interior
    of the signal exactly (COLA, Hann window, hop = n_fft/4)."""
    from tts_tpu.vocoder.models.istft_hifigan import istft_overlap_add

    n_fft, hop, T = 16, 4, 64
    rng = np.random.RandomState(0)
    wav = rng.randn(2, (T - 1) * hop + n_fft).astype(np.float32)
    win = np.hanning(n_fft + 1)[:n_fft]
    frames = np.stack(
        [wav[:, t * hop : t * hop + n_fft] * win for t in range(T)], axis=1
    )  # [B, T, n_fft]
    spec = np.fft.rfft(frames, axis=-1)
    out = np.asarray(
        istft_overlap_add(jnp.asarray(np.abs(spec)), jnp.asarray(np.angle(spec)), n_fft, hop)
    )
    assert out.shape == (2, T * hop)
    # interior samples (outside the first/last partial-overlap region):
    # out[s] corresponds to wav[s + (n_fft - hop)//2]
    lead = (n_fft - hop) // 2
    ref = wav[:, lead : lead + T * hop]
    np.testing.assert_allclose(out[:, n_fft:-n_fft], ref[:, n_fft:-n_fft], atol=1e-4)


@pytest.mark.parametrize("subbands", [1, 4])
def test_istft_generator_shapes(subbands):
    from tts_tpu.vocoder.models import setup_generator

    cls = setup_generator("istft_hifigan_generator")
    gen = cls(
        in_channels=20,
        upsample_factors=(4, 4) if subbands == 1 else (2, 2),
        upsample_kernel_sizes=(8, 8) if subbands == 1 else (4, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        istft_n_fft=16,
        istft_hop=4,
        subbands=subbands,
    )
    T = 24
    x = jnp.asarray(np.random.RandomState(0).randn(2, T, 20), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), x)
    wav = gen.apply(params, x)
    trunk_up = 16 if subbands == 1 else 4
    assert wav.shape == (2, T * trunk_up * 4 * subbands, 1)
    assert np.isfinite(np.asarray(wav)).all()


# slow tier: compiles the full VITS+iSTFT inference graph (~11s 1-core);
# the generator's own shape/overlap-add contracts above stay fast
@pytest.mark.slow
def test_vits_istft_decoder_forward_and_inference():
    """decoder_type="istft": same 256x total upsampling from [8, 8] trunk ×
    hop 4, through both the training segment path and inference."""
    from tts_tpu.models.vits import Vits, VitsConfig

    cfg = VitsConfig()
    a = cfg.model_args
    a.num_chars = 50
    a.hidden_channels = 32
    a.hidden_channels_ffn_text_encoder = 32
    a.num_layers_text_encoder = 1
    a.num_heads_text_encoder = 2
    a.num_layers_posterior_encoder = 2
    a.num_layers_flow = 1
    a.upsample_initial_channel_decoder = 32
    a.resblock_kernel_sizes_decoder = [3]
    a.resblock_dilation_sizes_decoder = [[1, 3]]
    a.decoder_type = "istft"
    a.upsample_rates_decoder = [8, 8]
    a.upsample_kernel_sizes_decoder = [16, 16]
    a.spec_segment_size = 8

    model = Vits(cfg)
    params, _ = fast_params(model.init_params, jax.random.PRNGKey(0))

    x = jnp.asarray(np.random.RandomState(0).randint(0, 50, (2, 16)))
    xl = jnp.asarray([16, 12])
    out = model.inference(params, x, xl, max_frames=64)
    wav = np.asarray(out["model_outputs"])
    assert wav.shape == (2, 64 * 256, 1)  # hop_length-equivalent 256
    assert np.isfinite(wav).all()


@pytest.mark.slow
def test_vits_istft_gan_train_step():
    """One fused GAN step trains with the istft decoder (gradients flow
    through irfft + overlap-add + PQMF-free mono head)."""
    from tts_tpu.models.vits import Vits, VitsConfig
    from tts_tpu.models.vits.train import create_train_state, make_train_step

    cfg = VitsConfig()
    a = cfg.model_args
    a.num_chars = 50
    a.hidden_channels = 32
    a.hidden_channels_ffn_text_encoder = 32
    a.num_layers_text_encoder = 1
    a.num_heads_text_encoder = 2
    a.num_layers_posterior_encoder = 2
    a.num_layers_flow = 1
    a.upsample_initial_channel_decoder = 32
    a.resblock_kernel_sizes_decoder = [3]
    a.resblock_dilation_sizes_decoder = [[1, 3]]
    a.decoder_type = "istft"
    a.upsample_rates_decoder = [8, 8]
    a.upsample_kernel_sizes_decoder = [16, 16]
    a.spec_segment_size = 8
    a.discriminator_width_mult = 0.25

    model = Vits(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step, _, _ = make_train_step(model, cfg)

    B, T_text, T_spec = 2, 12, 24
    hop = cfg.audio.hop_length
    rng = np.random.RandomState(0)
    batch = {
        "text_input": rng.randint(0, 50, (B, T_text)).astype(np.int32),
        "text_lengths": np.full((B,), T_text, np.int32),
        "spec": np.abs(rng.randn(B, T_spec, cfg.audio.fft_size // 2 + 1)).astype(np.float32),
        "spec_lengths": np.full((B,), T_spec, np.int32),
        "waveform": (0.1 * rng.randn(B, T_spec * hop, 1)).astype(np.float32),
    }
    state2, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # the istft decoder subtree actually moved (gradients flow through
    # irfft + overlap-add)
    def subtree(params):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        return [l for p, l in flat if "waveform_decoder" in str(p)]

    before, after = subtree(state.params["gen"]), subtree(state2.params["gen"])
    assert before, "no waveform_decoder params found"
    delta = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(after, before))
    assert delta > 0.0
