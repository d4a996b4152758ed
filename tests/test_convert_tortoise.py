"""Tortoise weight-compat parity: reference torch DiffusionTts / CLVP
(random-init, reduced dims) vs the flax ports + converters.
Reference: TTS/tts/layers/tortoise/{diffusion_decoder,clvp}.py."""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/repo")

from ref_stubs import import_reference, install_reference_stubs

install_reference_stubs()


def test_diffusion_decoder_parity():
    RefDiff = import_reference('TTS.tts.layers.tortoise.diffusion_decoder').DiffusionTts

    from tts_tpu.models.tortoise.layers import DiffusionTts
    from tts_tpu.utils.convert import convert_diffusion_decoder

    MC, L, H = 64, 2, 4
    torch.manual_seed(0)
    ref = RefDiff(
        model_channels=MC, num_layers=L, in_channels=10, in_latent_channels=32,
        in_tokens=40, out_channels=20, num_heads=H, dropout=0, layer_drop=0,
        unconditioned_percentage=0,
    ).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = DiffusionTts(
        model_channels=MC, num_layers=L, in_channels=10, in_latent_channels=32,
        in_tokens=40, out_channels=20, num_heads=H,
    )
    params = convert_diffusion_decoder(state, num_layers=L)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 10, 48).astype(np.float32)  # torch: [B, C, T]
    lat = rng.randn(2, 12, 32).astype(np.float32)  # [B, S, C_lat]
    cond = rng.randn(2, 10, 50).astype(np.float32)  # [B, C, T_cond]
    ts = torch.LongTensor([13, 77])

    with torch.no_grad():
        cl = ref.get_conditioning(torch.from_numpy(cond))
        emb = ref.timestep_independent(
            torch.from_numpy(lat), cl, x.shape[-1], return_code_pred=False
        )
        want = ref(torch.from_numpy(x), ts, precomputed_aligned_embeddings=emb).numpy()

    cl_j = model.apply(params, np.swapaxes(cond, 1, 2), method=DiffusionTts.get_conditioning)
    np.testing.assert_allclose(np.asarray(cl_j), cl.numpy(), atol=2e-4)

    emb_j = model.apply(
        params, lat, np.asarray(cl_j), x.shape[-1],
        method=DiffusionTts.timestep_independent,
    )
    np.testing.assert_allclose(np.asarray(emb_j), np.swapaxes(emb.numpy(), 1, 2), atol=2e-4)

    got = model.apply(
        params, np.swapaxes(x, 1, 2), np.asarray([13, 77]),
        precomputed_embeddings=np.asarray(emb_j),
    )
    diff = np.abs(np.swapaxes(np.asarray(got), 1, 2) - want).max()
    assert diff < 5e-4, f"diffusion decoder parity {diff}"

    # conditioning-free branch (classifier-free guidance side)
    with torch.no_grad():
        want_free = ref(
            torch.from_numpy(x), ts, precomputed_aligned_embeddings=emb, conditioning_free=True
        ).numpy()
    got_free = model.apply(
        params, np.swapaxes(x, 1, 2), np.asarray([13, 77]), conditioning_free=True
    )
    assert np.abs(np.swapaxes(np.asarray(got_free), 1, 2) - want_free).max() < 5e-4


def test_clvp_parity():
    RefCLVP = import_reference('TTS.tts.layers.tortoise.clvp').CLVP

    from tts_tpu.models.tortoise.layers import CLVP
    from tts_tpu.utils.convert import convert_clvp

    torch.manual_seed(0)
    ref = RefCLVP(
        dim_text=64, dim_speech=64, dim_latent=64, num_text_tokens=50,
        text_enc_depth=2, text_heads=2, num_speech_tokens=60,
        speech_enc_depth=2, speech_heads=2, use_xformers=True,
    ).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = CLVP(
        dim_text=64, dim_speech=64, dim_latent=64, num_text_tokens=50,
        text_enc_depth=2, text_heads=2, num_speech_tokens=60,
        speech_enc_depth=2, speech_heads=2,
    )
    params = convert_clvp(state, depth=2)

    rng = np.random.RandomState(0)
    text = rng.randint(0, 50, (3, 17))
    speech = rng.randint(0, 60, (3, 29))
    with torch.no_grad():
        want = ref(torch.from_numpy(text), torch.from_numpy(speech), return_loss=False).numpy()
    got = np.asarray(model.apply(params, text, speech))
    diff = np.abs(got - want).max()
    assert diff < 5e-4, f"CLVP parity {diff}"


def test_unified_voice_parity():
    """Teacher-forced logits/latents parity vs the reference UnifiedVoice
    (reduced dims, reference autoregressive.py:262)."""
    RefUV = import_reference('TTS.tts.layers.tortoise.autoregressive').UnifiedVoice

    from tts_tpu.models.tortoise.model import UnifiedVoice
    from tts_tpu.utils.convert import convert_unified_voice

    torch.manual_seed(0)
    L, D, H = 2, 64, 4
    ref = RefUV(
        layers=L, model_dim=D, heads=H, max_text_tokens=24, max_mel_tokens=32,
        number_text_tokens=30, start_text_token=29, number_mel_codes=20,
        start_mel_token=18, stop_mel_token=19, checkpointing=False,
    ).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = UnifiedVoice(
        layers=L, model_dim=D, heads=H, number_text_tokens=30,
        number_mel_codes=20, start_mel_token=18, stop_mel_token=19,
        start_text_token=29, stop_text_token=0, max_text_tokens=24, max_mel_tokens=32,
    )
    params = {"params": convert_unified_voice(state, layers=L)["params"]}

    rng = np.random.RandomState(0)
    cond = rng.randn(2, 80, 40).astype(np.float32)  # torch [B, 80, T]
    text = rng.randint(1, 29, (2, 8))
    mel = rng.randint(0, 18, (2, 12))

    with torch.no_grad():
        cl = ref.get_conditioning(torch.from_numpy(cond))
        # replicate the reference forward's input alignment
        ti = torch.nn.functional.pad(torch.from_numpy(text), (0, 1), value=0)
        mi = torch.nn.functional.pad(torch.from_numpy(mel), (0, 1), value=19)
        ti, _ = ref.build_aligned_inputs_and_targets(ti, 29, 0)
        mi, _ = ref.build_aligned_inputs_and_targets(mi, 18, 19)
        te = ref.text_embedding(ti) + ref.text_pos_embedding(ti)
        me = ref.mel_embedding(mi) + ref.mel_pos_embedding(mi)
        tl, ml = ref.get_logits(cl.unsqueeze(1), te, ref.text_head, me, ref.mel_head)

    cl_j = model.apply(params, np.swapaxes(cond, 1, 2), method=UnifiedVoice.get_conditioning)
    np.testing.assert_allclose(np.asarray(cl_j)[:, 0], cl.numpy(), atol=2e-4)

    # ref sequence = [start] + text + [stop]; ours wraps identically when fed
    # the raw tokens, so logits align position-for-position
    tlog, mlog, mlat = model.apply(params, np.asarray(cl_j), text, mel)
    np.testing.assert_allclose(
        np.asarray(tlog), tl.permute(0, 2, 1).numpy(), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(mlog), ml.permute(0, 2, 1).numpy(), atol=5e-4
    )


def test_tortoise_univnet_vocoder_parity():
    """Tortoise-bundled UnivNet (reference tortoise/vocoder.py:277) vs our
    UnivnetGenerator in tortoise mode + convert_tortoise_univnet."""
    RefVoc = import_reference("TTS.tts.layers.tortoise.vocoder").UnivNetGenerator

    import jax.numpy as jnp

    from tts_tpu.utils.convert import convert_tortoise_univnet
    from tts_tpu.vocoder.models.univnet_generator import UnivnetGenerator

    torch.manual_seed(0)
    ref = RefVoc(
        noise_dim=8, channel_size=12, dilations=[1, 3, 9, 27], strides=[4, 4, 2],
        lReLU_slope=0.2, kpnet_conv_size=3, hop_length=32, n_mel_channels=100,
    )
    ref.eval()  # the reference overrides eval() and returns None
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = UnivnetGenerator(
        in_channels=8, hidden_channels=12, cond_channels=100,
        upsample_factors=(4, 4, 2), lvc_layers_each_block=4,
        kpnet_hidden_channels=64, pad_mode="reflect",
        kpnet_lrelu_slope=0.2, final_lrelu_slope=0.2,
        kpnet_residual_style="per_block",
    )
    params = convert_tortoise_univnet(state)

    rng = np.random.RandomState(1)
    c = rng.randn(2, 100, 6).astype(np.float32)  # torch layout [B, M, L]
    z = rng.randn(2, 8, 6).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(c), torch.from_numpy(z)).numpy()  # [B, 1, T]
    got = model.apply(
        params, jnp.asarray(np.swapaxes(c, 1, 2)), jnp.asarray(np.swapaxes(z, 1, 2))
    )  # [B, T, 1]
    np.testing.assert_allclose(
        np.asarray(got)[:, :, 0], want[:, 0, :], atol=2e-5, rtol=1e-4
    )


def test_unified_voice_greedy_generate_parity():
    """Full AR inference parity: the reference KV-cached HF-generate stack
    (post_init_gpt2_config → GPT2InferenceModel.generate, greedy) vs our
    lax.scan generate with top_k=1, token for token (VERDICT r2 task 1:
    AR-token parity through the whole pipeline, not just submodules)."""
    import jax
    import jax.numpy as jnp

    ar_mod = import_reference("TTS.tts.layers.tortoise.autoregressive")

    from tts_tpu.models.tortoise.model import UnifiedVoice
    from tts_tpu.utils.convert import convert_unified_voice

    # Two shims so the reference runs on MODERN transformers the way it ran
    # on the transformers it shipped with (the behavior the zoo checkpoints
    # were deployed with): (a) GenerationMixin is no longer mixed into
    # PreTrainedModel (≥4.50); (b) generate() now passes an empty-but-truthy
    # DynamicCache on the FIRST call, which makes the reference's
    # `if past_key_values:` trim the whole prompt to one token — i.e. the
    # unmodified reference silently ignores text+conditioning on modern HF.
    from transformers.generation import GenerationMixin

    base = ar_mod.GPT2InferenceModel

    class _RefGen(base, GenerationMixin):
        def prepare_inputs_for_generation(self, input_ids, past_key_values=None, **kw2):
            if past_key_values is not None and hasattr(past_key_values, "get_seq_length") \
                    and past_key_values.get_seq_length() == 0:
                past_key_values = None
            return super().prepare_inputs_for_generation(
                input_ids, past_key_values=past_key_values, **kw2
            )

    ar_mod.GPT2InferenceModel = _RefGen

    torch.manual_seed(7)
    kw = dict(layers=2, model_dim=32, heads=2, number_text_tokens=40,
              number_mel_codes=30, start_mel_token=28, stop_mel_token=29,
              max_text_tokens=24, max_mel_tokens=48, max_conditioning_inputs=1)
    ref = ar_mod.UnifiedVoice(**kw)
    ref.eval()
    ref.post_init_gpt2_config(kv_cache=True)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    ours = UnifiedVoice(
        layers=2, model_dim=32, heads=2, number_text_tokens=40,
        number_mel_codes=30, start_mel_token=28, stop_mel_token=29,
        start_text_token=40, stop_text_token=0,
        max_text_tokens=24, max_mel_tokens=48,
    )
    params = convert_unified_voice(state, layers=2)

    rng = np.random.RandomState(8)
    text = rng.randint(1, 39, (1, 9)).astype(np.int64)
    cond = rng.randn(1, 80, 20).astype(np.float32)  # torch [B, 80, T]

    with torch.no_grad():
        ref_lat = ref.get_conditioning(torch.from_numpy(cond))
        want = ref.inference_speech(
            ref_lat, torch.from_numpy(text), do_sample=False,
            num_return_sequences=1, max_generate_length=16,
        )[0].numpy()

    lat = ours.apply(params, jnp.asarray(np.swapaxes(cond, 1, 2)), method=ours.get_conditioning)
    # inference_speech pads one stop internally; our generate wraps the raw
    # tokens the same way, so pass them unpadded (the full pipeline's extra
    # tortoise.py:677 pad is applied by synthesize(), not here)
    # temperature → 0 makes top-p sampling greedy, matching HF do_sample=False
    gen = ours.apply(
        params, lat, jnp.asarray(text), jax.random.PRNGKey(0),
        max_new_tokens=16, temperature=1e-4, top_p=1.0, repetition_penalty=1.0,
        method=ours.generate,
    )
    got = np.asarray(gen["codes"][0])

    # compare up to and including the first stop token of the HF output
    # (our scan pads with stop after termination)
    n = len(want)
    assert (got[:n] == want).all(), (got[:n], want)
