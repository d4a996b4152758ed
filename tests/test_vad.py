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
