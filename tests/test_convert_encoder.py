"""Speaker encoder torch→flax parity — the LSTM d-vector net
(reference ``TTS/encoder/models/lstm.py``; the ResNet variant is covered by
the XTTS converter tests which share ``convert_resnet_speaker_encoder``)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_stubs import install_reference_stubs, np_state  # noqa: E402


def test_lstm_speaker_encoder_parity():
    install_reference_stubs()
    from TTS.encoder.models.lstm import LSTMSpeakerEncoder as RefLSTM

    from tts_tpu.encoder.model import LSTMSpeakerEncoder
    from tts_tpu.utils.convert import convert_lstm_speaker_encoder

    torch.manual_seed(0)
    tm = RefLSTM(input_dim=20, proj_dim=16, lstm_dim=24, num_lstm_layers=2)
    tm.eval()
    x = np.random.RandomState(0).randn(2, 11, 20).astype(np.float32)
    with torch.no_grad():
        # reference takes [B, D, T]
        d_t = tm(torch.from_numpy(x.transpose(0, 2, 1)), l2_norm=True).numpy()

    params = convert_lstm_speaker_encoder(np_state(tm), num_layers=2)
    jm = LSTMSpeakerEncoder(input_dim=20, proj_dim=16, lstm_dim=24, num_lstm_layers=2)
    d_j = np.asarray(jm.apply(params, jnp.asarray(x), l2_norm=True))
    np.testing.assert_allclose(d_j, d_t, atol=2e-5)
