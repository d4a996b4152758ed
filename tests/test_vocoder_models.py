"""Extended vocoder model tests: PWGAN, WaveGrad, WaveRNN, UnivNet
(reference model: tests/vocoder_tests/)."""

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.vocoder.models.parallel_wavegan_generator import (
    ParallelWaveganDiscriminator,
    ParallelWaveganGenerator,
)
from tts_tpu.vocoder.models.univnet_generator import UnivnetGenerator, location_variable_convolution
from tts_tpu.vocoder.models.wavegrad import (
    Wavegrad,
    compute_noise_schedule,
    wavegrad_inference,
    wavegrad_train_loss,
)
from tts_tpu.vocoder.models.wavernn import Wavernn, mixture_of_logistics_loss
from helpers import fast_params


def test_parallel_wavegan():
    gen = ParallelWaveganGenerator(num_res_blocks=6, stacks=2, res_channels=16,
                                   gate_channels=32, skip_channels=16, aux_channels=20,
                                   upsample_factors=(4, 4))
    c = jnp.asarray(np.random.RandomState(0).randn(2, 10, 20).astype(np.float32))
    params = gen.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, c)
    y = gen.apply(params, c, rngs={"noise": jax.random.PRNGKey(2)})
    assert y.shape == (2, 160, 1)
    disc = ParallelWaveganDiscriminator(num_layers=4, conv_channels=8)
    dp = disc.init(jax.random.PRNGKey(0), y)
    score, feats = disc.apply(dp, y)
    assert score.shape == (2, 160, 1)
    assert len(feats) == 4


def test_wavegrad_train_and_infer():
    model = Wavegrad(
        in_channels=20, y_conv_channels=8, x_conv_channels=16,
        dblock_out_channels=(8, 8, 16, 16), ublock_out_channels=(16, 16, 8, 8, 8),
        upsample_factors=(2, 2, 2, 2, 2),
        upsample_dilations=((1, 2, 1, 2),) * 5,
    )
    T_mel, up = 8, 32
    mel = jnp.asarray(np.random.RandomState(0).randn(1, T_mel, 20).astype(np.float32))
    wav = jnp.asarray(np.random.RandomState(1).randn(1, T_mel * up, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), wav, mel, jnp.ones((1,)))
    sched = compute_noise_schedule(10)
    loss = wavegrad_train_loss(model, params, {"waveform": wav, "mel": mel}, jax.random.PRNGKey(2), sched)
    assert np.isfinite(float(loss))
    y = wavegrad_inference(model, params, mel, jax.random.PRNGKey(3), sched)
    assert y.shape == (1, T_mel * up, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_wavernn_forward_and_generate():
    model = Wavernn(rnn_dims=32, fc_dims=32, compute_dims=16, res_out_dims=16,
                    num_res_blocks=2, feat_dims=20, pad=2, mode="mold",
                    upsample_factors=(2, 2, 2))
    T_mel = 10
    mels = jnp.asarray(np.random.RandomState(0).randn(2, T_mel, 20).astype(np.float32))
    T_wav = (T_mel - 2 * 2) * 8  # pad trimmed
    x = jnp.asarray(np.random.RandomState(1).randn(2, T_wav).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, mels)
    logits = model.apply(params, x, mels)
    assert logits.shape == (2, T_wav, 30)
    loss = mixture_of_logistics_loss(logits, x)
    assert np.isfinite(float(loss))
    wav = model.apply(params, mels, jax.random.PRNGKey(2), method=model.generate)
    assert wav.shape == (2, T_wav)
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_lvc_matches_direct_conv():
    """With identical kernels per frame, LVC equals a plain conv."""
    rng = np.random.RandomState(0)
    B, L, hop, C_in, C_out, K = 1, 4, 8, 3, 5, 3
    x = jnp.asarray(rng.randn(B, L * hop, C_in).astype(np.float32))
    k_single = rng.randn(C_in, C_out, K).astype(np.float32)
    kernel = jnp.asarray(np.tile(k_single[None, None], (B, L, 1, 1, 1)))
    bias = jnp.zeros((B, L, C_out))
    y = location_variable_convolution(x, kernel, bias, hop)
    # direct conv: cross-correlation with kernel [K, C_in, C_out]
    y_ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(k_single.transpose(2, 0, 1)), (1,), [(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


def test_univnet_generator():
    gen = UnivnetGenerator(in_channels=8, hidden_channels=8, cond_channels=20,
                           upsample_factors=(2, 2), lvc_layers_each_block=2,
                           kpnet_hidden_channels=16)
    c = jnp.asarray(np.random.RandomState(0).randn(1, 12, 20).astype(np.float32))
    params = gen.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, c)
    y = gen.apply(params, c, rngs={"noise": jax.random.PRNGKey(2)})
    assert y.shape == (1, 48, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_random_window_discriminator_shapes():
    """RWD (reference random_window_discriminator.py:203): 5 unconditional
    + 5 conditional scores on random windows."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tts_tpu.vocoder.models import setup_discriminator

    cls = setup_discriminator("random_window_discriminator")
    hop = 256
    # default cond factor/channel tables cover 5 windows; slice to 3 and
    # shrink channel widths — this is a shape/API-contract test, so the CI
    # graph stays tiny (full widths belong to real training configs)
    disc = cls(
        cond_channels=20, hop_length=hop, window_sizes=(512, 1024, 2048),
        uncond_disc_out_channels=(16, 32),
        cond_disc_downsample_factors=((8, 4, 2, 2, 2), (8, 4, 2, 2), (8, 4, 2)),
        cond_disc_out_channels=((16, 16, 32, 32), (16, 32, 32), (16, 32)),
    )
    T = 4096
    x = jnp.asarray(np.random.RandomState(0).randn(2, T, 1), jnp.float32)
    c = jnp.asarray(np.random.RandomState(1).randn(2, T // hop, 20), jnp.float32)
    params = disc.init({"params": jax.random.PRNGKey(0), "windows": jax.random.PRNGKey(1)}, x, c)
    scores, feats = disc.apply(params, x, c, rngs={"windows": jax.random.PRNGKey(2)})
    assert len(scores) == 6
    for s in scores:
        assert s.shape[0] == 2 and np.isfinite(np.asarray(s)).all()


def test_differential_spectral_loss():
    import jax.numpy as jnp
    import numpy as np

    from tts_tpu.layers.losses import differential_spectral_loss

    y = jnp.asarray(np.random.RandomState(0).randn(2, 16, 8), jnp.float32)
    l_same = differential_spectral_loss(y, y, jnp.asarray([16, 12]))
    assert float(l_same) == 0.0
    l_diff = differential_spectral_loss(y + 0.5, y, jnp.asarray([16, 12]))
    # constant offsets cancel in the difference domain
    assert float(l_diff) < 1e-10
    l_real = differential_spectral_loss(y * 2.0, y, jnp.asarray([16, 12]))
    assert float(l_real) > 0.0


def _tiny_wavegrad_config():
    from tts_tpu.vocoder.configs import WavegradConfig

    return WavegradConfig(
        seq_len=256,
        model_params={
            "y_conv_channels": 8, "x_conv_channels": 16,
            "dblock_out_channels": (8, 8, 16, 16),
            "ublock_out_channels": (16, 16, 8, 8, 8),
            "upsample_factors": (2, 2, 2, 2, 2),
            "upsample_dilations": ((1, 2, 1, 2),) * 5,
            "use_weight_norm": True,  # reference-config key; filtered out
        },
        train_noise_schedule={"min_val": 1e-6, "max_val": 1e-2, "num_steps": 10},
        test_noise_schedule={"min_val": 1e-6, "max_val": 1e-2, "num_steps": 4},
    )


def test_wavegrad_trainer_contract():
    """setup_model dispatch + Trainer-contract train/eval step (reference
    vocoder/models/__init__.py:12 setup_model, wavegrad.py train_step)."""
    from tts_tpu.vocoder.models import setup_model
    from tts_tpu.vocoder.models.wavegrad import WavegradVocoder

    cfg = _tiny_wavegrad_config()
    model = setup_model(cfg)
    assert isinstance(model, WavegradVocoder)
    params = fast_params(model.init_params, jax.random.PRNGKey(0))
    hop = 32
    mel = jnp.asarray(np.random.RandomState(0).randn(2, cfg.seq_len // hop, 80).astype(np.float32))
    wav = jnp.asarray(np.random.RandomState(1).randn(2, cfg.seq_len, 1).astype(np.float32))
    loss, aux = model.train_step(params, {"waveform": wav, "mel": mel}, {"noise": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss))
    # eval path: deterministic
    l1, _ = model.train_step(params, {"waveform": wav, "mel": mel}, {}, train=False)
    l2, _ = model.train_step(params, {"waveform": wav, "mel": mel}, {}, train=False)
    assert float(l1) == float(l2)


def test_wavernn_trainer_contract():
    """WaveRNN through setup_model: MoL + 9-bit CE losses both finite."""
    from tts_tpu.vocoder.configs import WavernnConfig
    from tts_tpu.vocoder.models import setup_model
    from tts_tpu.vocoder.models.wavernn import WavernnVocoder

    margs = {
        "rnn_dims": 16, "fc_dims": 16, "compute_dims": 8, "res_out_dims": 8,
        "num_res_blocks": 1, "pad": 2, "upsample_factors": (2, 2, 2),
        "use_upsample_net": True,  # reference-config key; filtered out
    }
    for mode in ("mold", 9):
        cfg = WavernnConfig(seq_len=128, mode=mode, model_args=dict(margs))
        model = setup_model(cfg)
        assert isinstance(model, WavernnVocoder)
        params = fast_params(model.init_params, jax.random.PRNGKey(0))
        mel = jnp.asarray(np.random.RandomState(0).randn(1, 128 // 8, 80).astype(np.float32))
        wav = jnp.asarray(np.random.RandomState(1).rand(1, 128, 1).astype(np.float32) * 2 - 1)
        loss, aux = model.train_step(params, {"waveform": wav, "mel": mel}, {})
        assert np.isfinite(float(loss)), mode
