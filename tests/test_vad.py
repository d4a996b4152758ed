"""VAD tests (reference wraps Silero-VAD; ours is the statistical VAD in
``tts_tpu/utils/vad.py`` with the same segment/removal API)."""

import numpy as np

from tts_tpu.utils.vad import get_speech_timestamps, remove_silence

SR = 16000


def _speech_like(dur, seed=0):
    """Modulated multi-harmonic burst ≈ voiced speech."""
    t = np.arange(int(dur * SR)) / SR
    rng = np.random.RandomState(seed)
    f0 = 120 + 30 * np.sin(2 * np.pi * 3 * t)
    sig = sum(np.sin(2 * np.pi * k * f0 * t + rng.rand()) / k for k in range(1, 6))
    env = 0.5 * (1 + np.sin(2 * np.pi * 4 * t - np.pi / 2))  # syllabic rhythm
    return (0.3 * sig * (0.3 + 0.7 * env)).astype(np.float32)


def _silence(dur, noise=1e-4, seed=1):
    return (noise * np.random.RandomState(seed).randn(int(dur * SR))).astype(np.float32)


def test_segments_found():
    wav = np.concatenate([_silence(0.5), _speech_like(1.0), _silence(0.5),
                          _speech_like(0.8, seed=2), _silence(0.4)])
    segs = get_speech_timestamps(wav, SR)
    assert len(segs) == 2
    # first segment starts near 0.5 s and ends near 1.5 s (±80 ms)
    assert abs(segs[0]["start"] / SR - 0.5) < 0.08
    assert abs(segs[0]["end"] / SR - 1.5) < 0.12
    assert abs(segs[1]["start"] / SR - 2.0) < 0.08


def test_remove_silence_edges_only():
    wav = np.concatenate([_silence(0.6), _speech_like(0.5), _silence(0.3),
                          _speech_like(0.5, seed=3), _silence(0.7)])
    out, found = remove_silence(wav, SR, trim_just_beginning_and_end=True)
    assert found
    # leading/trailing silence gone, internal pause kept
    assert len(out) < len(wav) - int(0.9 * SR)
    assert len(out) > int(1.2 * SR)


def test_remove_silence_all_segments():
    wav = np.concatenate([_silence(0.5), _speech_like(0.5), _silence(1.0),
                          _speech_like(0.5, seed=4), _silence(0.5)])
    out, found = remove_silence(wav, SR, trim_just_beginning_and_end=False)
    assert found
    assert len(out) < int(1.5 * SR)  # long internal pause cut too


def test_no_speech():
    wav = _silence(1.0)
    out, found = remove_silence(wav, SR)
    assert not found and len(out) == len(wav)


# ---- learned (Silero-v5-layout) backend ------------------------------------


def _torch_silero_mirror():
    """Locally built torch module with the Silero v5 state_dict layout and
    the chunk pipeline documented in ``vad_silero.py`` — the conversion
    oracle (the pretrained .jit itself is unreachable in a zero-egress
    build, but the key/shape mapping is what the converter must get right)."""
    import torch
    from torch import nn

    class Stft(nn.Module):
        def __init__(self):
            super().__init__()
            self.register_buffer("forward_basis_buffer", torch.randn(258, 1, 256) * 0.2)

        def forward(self, x):  # (B, T) -> (B, 129, F)
            spec = torch.nn.functional.conv1d(x[:, None], self.forward_basis_buffer, stride=128)
            real, imag = spec[:, :129], spec[:, 129:]
            return torch.sqrt(real**2 + imag**2 + 1e-12)

    class EncBlock(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.reparam_conv = nn.Conv1d(cin, cout, 3, padding=1)

        def forward(self, x):
            return torch.relu(self.reparam_conv(x))

    class Decoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.rnn = nn.LSTMCell(128, 128)
            self.decoder = nn.Sequential(
                nn.Dropout(0.0), nn.ReLU(), nn.Conv1d(128, 1, 1), nn.Sigmoid()
            )

    class Inner(nn.Module):
        def __init__(self):
            super().__init__()
            self.stft = Stft()
            self.encoder = nn.Sequential(
                EncBlock(129, 128), EncBlock(128, 64), EncBlock(64, 64), EncBlock(64, 128)
            )
            self.decoder = Decoder()

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self._model = Inner()

        @torch.no_grad()
        def run(self, wav):  # (N*512,) float32 @16k -> (N,) probs
            m = self._model
            ctx = torch.zeros(64)
            h = torch.zeros(1, 128)
            c = torch.zeros(1, 128)
            probs = []
            for chunk in wav.reshape(-1, 512):
                x = torch.cat([ctx, chunk])
                x = torch.nn.functional.pad(x[None, None], (0, 64), mode="reflect")[0, 0]
                feat = m.encoder(m.stft(x[None])).mean(-1)
                h, c = m.decoder.rnn(feat, (h, c))
                probs.append(m.decoder.decoder(h[:, :, None])[0, 0, 0].item())
                ctx = chunk[-64:]
            return torch.tensor(probs)

    return Model().eval()


def test_silero_converter_parity():
    import torch

    from tts_tpu.utils.vad_silero import convert_silero_state_dict, silero_probabilities

    torch.manual_seed(0)
    mirror = _torch_silero_mirror()
    params = convert_silero_state_dict(mirror.state_dict())

    wav = np.concatenate([_silence(0.3), _speech_like(0.5), _silence(0.2)])
    wav = wav[: (len(wav) // 512) * 512]
    ref = mirror.run(torch.from_numpy(wav)).numpy()
    got = silero_probabilities(params, wav, SR)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 2e-5


def test_silero_segments_api():
    """The learned backend plugs into the shared segment API (including
    input at a non-16k rate, which resamples internally)."""
    from tts_tpu.utils.vad_silero import random_params

    wav = np.concatenate([_silence(0.4), _speech_like(0.6), _silence(0.4)])
    segs = get_speech_timestamps(wav, SR, model_params=random_params())
    assert isinstance(segs, list)
    wav22 = np.interp(
        np.arange(0, len(wav), SR / 22050.0), np.arange(len(wav)), wav
    ).astype(np.float32)
    segs22 = get_speech_timestamps(wav22, 22050, model_params=random_params())
    assert isinstance(segs22, list)
