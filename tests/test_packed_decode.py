"""Sequence-packed VITS decode: planner + bit-exactness vs unpacked.

The packed path (utils/packing.py + VitsModule.inference_packed) replaces
the torch reference's per-utterance dynamic-shape decode (vits.py:1161) with
one dense multi-row dispatch.  These tests pin the contract: a segment in a
packed row decodes identically to its own zero-padded decode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.vits import Vits, VitsArgs, VitsConfig
from tts_tpu.utils.packing import plan_pack_layout, unpack_outputs
from helpers import fast_params


def _small_args(**kw):
    return VitsArgs(
        num_chars=32,
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
        discriminator_width_mult=0.125,
        **kw,
    )


HOP = 16  # upsample 4*4


def _model(**kw):
    cfg = VitsConfig(model_args=_small_args(**kw))
    model = Vits(cfg)
    gen_params, _ = fast_params(model.init_params, jax.random.PRNGKey(0))
    return model, gen_params


def _texts(B=3, T=12, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randint(1, 32, (B, T)))
    xl = jnp.asarray([T, T - 3, T - 6][:B], jnp.int32)
    return x, xl


# ---------------------------------------------------------------------------
# planner
# ---------------------------------------------------------------------------


def test_plan_pack_layout_slices_consistent():
    lens = [300, 120, 77, 260, 1, 501]
    plan = plan_pack_layout(lens, gap=16, len_multiple=128)
    assert plan.seg_sample.shape == (plan.n_rows, plan.row_len)
    claimed = np.zeros(plan.seg_sample.shape, bool)
    for i, (r, start, ln) in enumerate(plan.slices):
        assert ln == lens[i]
        span = plan.seg_sample[r, start : start + ln]
        assert (span == i).all()
        assert (plan.seg_pos[r, start : start + ln] == np.arange(ln)).all()
        assert not claimed[r, start : start + ln].any(), "overlapping segments"
        claimed[r, start : start + ln] = True
    # every non-gap slot belongs to exactly one slice
    assert (claimed == (plan.seg_sample >= 0)).all()


def test_plan_pack_layout_gap_between_segments():
    plan = plan_pack_layout([100, 100, 100, 100], gap=16, row_len=256)
    for r in range(plan.n_rows):
        row = plan.seg_sample[r]
        # between two different segments in a row there are >= gap -1 slots
        changes = np.nonzero(np.diff(row) != 0)[0]
        prev_end = None
        for i, (rr, start, ln) in enumerate(plan.slices):
            if rr != r:
                continue
            if prev_end is not None and start > 0:
                assert start - prev_end >= plan.gap
            prev_end = start + ln
    del changes


def test_plan_pack_layout_beats_padding():
    """Heterogeneous batch: packed area well under pad-to-max area."""
    rng = np.random.RandomState(1)
    lens = rng.randint(80, 512, 16)
    plan = plan_pack_layout(lens, gap=16)
    pad_area = 16 * int(((lens.max() + 31) // 32) * 32)
    assert plan.n_rows * plan.row_len < 0.75 * pad_area
    assert plan.utilization > 0.75


def test_plan_pack_layout_oversize_raises():
    with pytest.raises(ValueError):
        plan_pack_layout([10, 9000], gap=16, max_row_len=4096)


def test_unpack_outputs_upsample():
    plan = plan_pack_layout([4, 2], gap=2, row_len=8)
    packed = np.arange(plan.n_rows * plan.row_len * 3).reshape(plan.n_rows, plan.row_len * 3, 1)
    outs = unpack_outputs(packed, plan, upsample=3)
    assert [o.shape[0] for o in outs] == [12, 6]


# ---------------------------------------------------------------------------
# packed inference vs unpacked
# ---------------------------------------------------------------------------


def test_packed_matches_per_sample_exact_decode():
    """Deterministic settings (no SDP, zero noise): each packed segment must
    equal its own exact-length decode bit-for-bit (fp tolerance only)."""
    model, params = _model(use_sdp=False, inference_noise_scale=0.0)
    x, xl = _texts()
    rng = jax.random.PRNGKey(7)

    y_lens = np.asarray(model.infer_durations(params, x, xl, rng=rng))
    plan = plan_pack_layout(y_lens, gap=16, len_multiple=32)
    out = model.inference_packed(
        params, x, xl, plan.seg_sample, plan.seg_pos, noise_frames=64, rng=rng
    )
    assert np.isfinite(np.asarray(out["model_outputs"])).all()
    assert (np.asarray(out["y_lengths"]) == y_lens).all()
    wavs = unpack_outputs(out["model_outputs"], plan, upsample=HOP)

    # longest + shortest sample suffice (each exact-length ref decode
    # compiles its own graph on the 1-core CI box); the middle sample's
    # slot mapping is pinned by the planner tests above
    for i in (0, x.shape[0] - 1):
        ref = model.inference(
            params, x[i : i + 1], xl[i : i + 1], max_frames=int(y_lens[i]), rng=rng
        )
        ref_wav = np.asarray(ref["model_outputs"][0])
        np.testing.assert_allclose(wavs[i], ref_wav, atol=2e-5, rtol=1e-4)


def test_packed_noise_matches_batch_decode_interior():
    """With stochastic z_p, the packed noise gather reproduces the batch
    decode's noise frame-for-frame, so interiors match; only the last few
    frames differ (the padded batch decode reads pad garbage at the tail,
    the packed decode sees a true zero boundary)."""
    model, params = _model(use_sdp=False)  # inference_noise_scale default 0.667
    x, xl = _texts()
    rng = jax.random.PRNGKey(3)
    NF = 64

    y_lens = np.asarray(model.infer_durations(params, x, xl, rng=rng))
    assert (y_lens < NF).all(), "test assumes lengths fit the noise buffer"
    plan = plan_pack_layout(y_lens, gap=16, len_multiple=32)
    out = model.inference_packed(
        params, x, xl, plan.seg_sample, plan.seg_pos, noise_frames=NF, rng=rng
    )
    wavs = unpack_outputs(out["model_outputs"], plan, upsample=HOP)

    batch = model.inference(params, x, xl, max_frames=NF, rng=rng)
    bwav = np.asarray(batch["model_outputs"])
    tail = 8  # decoder receptive field in frames for the small config
    compared = 0
    for i in range(x.shape[0]):
        n = max(int(y_lens[i]) - tail, 0) * HOP
        if n:
            np.testing.assert_allclose(wavs[i][:n], bwav[i, :n], atol=2e-5, rtol=1e-4)
            compared += 1
    assert compared >= 2, "test texts too short to exercise the interior"


def test_packed_multispeaker_conditioning():
    """Per-slot speaker gather: two samples with different speaker ids decode
    in one packed grid exactly as their own conditioned decodes."""
    model, params = _model(
        use_sdp=False,
        inference_noise_scale=0.0,
        use_speaker_embedding=True,
        num_speakers=4,
        speaker_embedding_channels=16,
    )
    x, xl = _texts(B=2)
    rng = jax.random.PRNGKey(11)
    sid = jnp.asarray([1, 3], jnp.int32)
    aux = {"speaker_ids": sid}

    y_lens = np.asarray(model.infer_durations(params, x, xl, aux_input=aux, rng=rng))
    plan = plan_pack_layout(y_lens, gap=16, len_multiple=32)
    out = model.inference_packed(
        params, x, xl, plan.seg_sample, plan.seg_pos, aux_input=aux, noise_frames=64, rng=rng
    )
    wavs = unpack_outputs(out["model_outputs"], plan, upsample=HOP)
    for i in range(2):
        ref = model.inference(
            params,
            x[i : i + 1],
            xl[i : i + 1],
            aux_input={"speaker_ids": sid[i : i + 1]},
            max_frames=int(y_lens[i]),
            rng=rng,
        )
        np.testing.assert_allclose(
            wavs[i], np.asarray(ref["model_outputs"][0]), atol=2e-5, rtol=1e-4
        )


def test_packed_decode_jits_with_static_shapes():
    """The packed path must trace under jit with the plan arrays as runtime
    inputs (static shapes, dynamic values) — the serving contract."""
    model, params = _model(use_sdp=False, inference_noise_scale=0.0)
    x, xl = _texts()
    rng = jax.random.PRNGKey(5)
    y_lens = np.asarray(model.infer_durations(params, x, xl, rng=rng))
    plan = plan_pack_layout(y_lens, gap=16, len_multiple=32)

    fn = jax.jit(
        lambda p, x, xl, ss, sp, r: model.inference_packed(
            p, x, xl, ss, sp, noise_frames=64, rng=r
        )
    )
    out = fn(params, x, xl, jnp.asarray(plan.seg_sample), jnp.asarray(plan.seg_pos), rng)
    eager = model.inference_packed(
        params, x, xl, plan.seg_sample, plan.seg_pos, noise_frames=64, rng=rng
    )
    np.testing.assert_allclose(
        np.asarray(out["model_outputs"]),
        np.asarray(eager["model_outputs"]),
        atol=2e-5,
        rtol=1e-4,
    )


def test_plan_pack_layout_respects_sublane_billing():
    """TPU conv tiling pads batch to 8 sublanes: for a 16-utterance batch
    the planner must NOT collapse to a huge single row (measured 8.7x
    slower per frame on v5e) — it should land on ~8 rows."""
    rng = np.random.RandomState(2)
    lens = rng.randint(200, 340, 16)
    plan = plan_pack_layout(lens, gap=16)
    assert plan.n_rows >= 8, (plan.n_rows, plan.row_len)
    # and still beat pad-to-max on billed area
    pad_area = 16 * int(((lens.max() + 31) // 32) * 32)
    assert plan.n_rows * plan.row_len < pad_area
    # single-row plans remain available on request
    forced = plan_pack_layout(lens, gap=16, row_len=8192)
    assert forced.n_rows == 1


def test_istft_variant_gated_off_packed_path():
    """The iSTFT decoder has no per-conv masks: the model must refuse the
    packed path (server then falls back to grouped buckets)."""
    model, params = _model(
        use_sdp=False, inference_noise_scale=0.0, decoder_type="istft"
    )
    assert not model.supports_packed_decode
    x, xl = _texts()
    y_lens = np.asarray(model.infer_durations(params, x, xl, rng=jax.random.PRNGKey(0)))
    plan = plan_pack_layout(y_lens, len_multiple=32)
    with pytest.raises(ValueError, match="istft"):
        model.inference_packed(params, x, xl, plan.seg_sample, plan.seg_pos)


# ---------------------------------------------------------------------------
# packed multi-sentence decode (round 5): one grid per request
# ---------------------------------------------------------------------------


def test_multi_sentence_packed_matches_serial(tmp_path):
    """A two-sentence request decodes as ONE packed grid; with deterministic
    settings the audio matches the serial per-sentence loop except within
    the decoder's receptive field of each sentence tail (where the serial
    path's padded decode reads bucket-padding garbage)."""
    import json

    from tts_tpu.models.vits import Vits, VitsArgs, VitsConfig
    from tts_tpu.utils.io import save_checkpoint
    from tts_tpu.utils.synthesizer import Synthesizer
    from helpers import fast_params

    args = VitsArgs(
        num_chars=200,
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
        use_sdp=False,
        inference_noise_scale=0.0,
    )
    cfg = VitsConfig(model_args=args)
    cfg.audio.fft_size = 128
    cfg.audio.win_length = 128
    cfg.audio.hop_length = 16
    cfg.audio.num_mels = 20
    cfg.audio.do_trim_silence = False

    model = Vits(cfg)
    gen_params, _ = fast_params(model.init_params, jax.random.PRNGKey(0))
    ckpt = tmp_path / "model.msgpack"
    save_checkpoint(str(ckpt), {"model": gen_params}, config=cfg)

    synth = Synthesizer(tts_checkpoint=str(ckpt))
    assert synth.tts_model.supports_packed_decode

    text = "One short sentence here. And then a somewhat longer second one follows!"
    packed_calls = []
    orig_packed = synth.tts_model.inference_packed

    def spy(*a, **kw):
        packed_calls.append(1)
        return orig_packed(*a, **kw)

    synth.tts_model.inference_packed = spy
    wav_packed = np.asarray(synth.tts(text), np.float32)
    assert packed_calls, "packed path was not taken"

    # force the serial loop for the reference output
    synth.tts_model.inference_packed = None
    del synth.tts_model.inference_packed  # instance attr gone -> class attr
    synth.tts_model.__class__ = type(
        "VitsNoPacked", (type(synth.tts_model),), {"supports_packed_decode": False}
    )
    wav_serial = np.asarray(synth.tts(text), np.float32)

    assert wav_packed.shape == wav_serial.shape
    assert np.isfinite(wav_packed).all()
    # identical except each sentence's last ~8 frames (128 samples at hop
    # 16); comparing the first 60% of the signal avoids both tails
    n = int(len(wav_packed) * 0.6)
    np.testing.assert_allclose(wav_packed[:n], wav_serial[:n], atol=2e-4)
