"""FastPitch (ForwardTTS) torch→flax conversion parity: reference inference
vs converted flax inference on identical inputs (reference anchor
``TTS/tts/models/forward_tts.py:172``)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_stubs import install_reference_stubs, np_state  # noqa: E402


@pytest.fixture(scope="module")
def ref_forward_tts():
    install_reference_stubs()
    from TTS.tts.models.forward_tts import ForwardTTS as RefForwardTTS
    from TTS.tts.models.forward_tts import ForwardTTSArgs as RefArgs

    torch.manual_seed(0)
    args = RefArgs(
        num_chars=40, out_channels=20, hidden_channels=32,
        use_pitch=True, use_energy=False, use_aligner=True,
        duration_predictor_hidden_channels=48,
        pitch_predictor_hidden_channels=48,
        encoder_params={
            "hidden_channels_ffn": 64, "num_heads": 2, "num_layers": 2,
            "dropout_p": 0.0,
        },
        decoder_params={
            "hidden_channels_ffn": 64, "num_heads": 2, "num_layers": 2,
            "dropout_p": 0.0,
        },
    )
    m = RefForwardTTS(args)
    m.eval()
    return m, args


def test_fastpitch_inference_parity(ref_forward_tts):
    from tts_tpu.models.forward_tts.config import FastPitchConfig
    from tts_tpu.models.forward_tts.model import ForwardTTS
    from tts_tpu.utils.convert import convert_forward_tts

    tm, rargs = ref_forward_tts
    x = np.array([[3, 7, 11, 2, 9, 14, 5]], dtype=np.int64)
    xl = np.array([7])
    with torch.no_grad():
        out_t = tm.inference(torch.from_numpy(x), aux_input={"x_lengths": torch.from_numpy(xl)})
    y_t = out_t["model_outputs"].numpy()[0]  # [T, C]
    dr_t = out_t["durations_log"].numpy()[0] if "durations_log" in out_t else None

    cfg = FastPitchConfig()
    a = cfg.model_args
    a.num_chars = 40
    a.out_channels = 20
    a.hidden_channels = 32
    a.use_pitch, a.use_energy, a.use_aligner = True, False, True
    a.duration_predictor_hidden_channels = 48
    a.pitch_predictor_hidden_channels = 48
    a.encoder_params = {"hidden_channels_ffn": 64, "num_heads": 2, "num_layers": 2, "dropout_p": 0.0}
    a.decoder_params = {"hidden_channels_ffn": 64, "num_heads": 2, "num_layers": 2, "dropout_p": 0.0}

    params = convert_forward_tts(np_state(tm), a)
    jm = ForwardTTS(cfg)
    out_j = jm.module.apply(
        params, jnp.asarray(x, jnp.int32), jnp.asarray(xl, jnp.int32),
        max_frames=64, method=jm.module.inference,
    )
    T = int(np.asarray(out_j["y_lengths"])[0])
    assert T == y_t.shape[0], (T, y_t.shape)
    y_j = np.asarray(out_j["model_outputs"])[0, :T]
    np.testing.assert_allclose(y_j, y_t, atol=2e-3)
