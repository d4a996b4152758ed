import numpy as np
import pytest

from tts_tpu.audio import AudioProcessor, numpy_transforms as nt
from tts_tpu.audio.mel import mel_filterbank


def _sine(sr=22050, f=440.0, dur=1.0):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_mel_filterbank_shape_and_slaney_norm():
    fb = mel_filterbank(22050, 1024, 80, fmin=0, fmax=8000)
    assert fb.shape == (80, 513)
    # every filter integrates to ~2/(width) * area -> nonzero, and rows cover band
    assert (fb.sum(axis=1) > 0).all()
    # slaney: peak value of each triangle equals its enorm; check monotone decrease of peaks
    peaks = fb.max(axis=1)
    assert peaks[0] > peaks[-1]


def test_stft_istft_roundtrip():
    y = _sine()
    D = nt.stft(y=y, fft_size=1024, hop_length=256, win_length=1024)
    assert D.shape[0] == 513
    assert D.dtype == np.complex128 or np.iscomplexobj(D)
    y2 = nt.istft(y=D, hop_length=256, win_length=1024)
    n = min(len(y), len(y2))
    # centered STFT round trip should reconstruct almost exactly
    assert np.max(np.abs(y[256:n - 256] - y2[256:n - 256])) < 1e-6


def test_stft_num_frames_matches_librosa_convention():
    y = np.zeros(22050, dtype=np.float32)
    D = nt.stft(y=y, fft_size=1024, hop_length=256, win_length=1024)
    assert D.shape[1] == 1 + len(y) // 256


def test_amp_db_roundtrip():
    x = np.abs(np.random.RandomState(0).randn(80, 10)) + 0.1
    db = nt.amp_to_db(x=x, gain=20, base=10)
    x2 = nt.db_to_amp(x=db, gain=20, base=10)
    np.testing.assert_allclose(x, x2, rtol=1e-6)


def _make_ap(**kw):
    defaults = dict(
        sample_rate=22050,
        num_mels=80,
        min_level_db=-100,
        frame_shift_ms=None,
        frame_length_ms=None,
        hop_length=256,
        win_length=1024,
        ref_level_db=20,
        fft_size=1024,
        power=1.5,
        preemphasis=0.0,
        signal_norm=True,
        symmetric_norm=True,
        max_norm=4.0,
        mel_fmin=0.0,
        mel_fmax=8000.0,
        pitch_fmin=80.0,
        pitch_fmax=640.0,
        spec_gain=20,
        griffin_lim_iters=8,
        do_trim_silence=False,
        verbose=False,
    )
    defaults.update(kw)
    return AudioProcessor(**defaults)


def test_processor_mel_shapes_and_norm_range():
    ap = _make_ap()
    y = _sine()
    mel = ap.melspectrogram(y)
    assert mel.shape[0] == 80
    assert mel.shape[1] == 1 + len(y) // 256
    assert mel.min() >= -4.0 - 1e-5
    assert mel.max() <= 4.0 + 1e-5
    # denormalize . normalize == identity within clip range
    den = ap.denormalize(mel)
    renorm = ap.normalize(den)
    np.testing.assert_allclose(mel, renorm, atol=1e-4)


def test_processor_linear_spec_and_griffin_lim():
    ap = _make_ap()
    y = _sine(dur=0.5)
    spec = ap.spectrogram(y)
    assert spec.shape[0] == 513
    wav = ap.inv_spectrogram(spec)
    assert np.isfinite(wav).all()
    assert len(wav) > 0


def test_compute_f0_sine():
    ap = _make_ap()
    y = _sine(f=220.0)
    f0 = ap.compute_f0(y)
    voiced = f0[f0 > 0]
    assert len(voiced) > 10
    med = np.median(voiced)
    assert abs(med - 220.0) < 10.0, med
    # unvoiced on silence
    f0_sil = ap.compute_f0(np.zeros(22050, dtype=np.float32))
    assert (f0_sil == 0).mean() > 0.9


def test_trim_silence():
    sr = 22050
    pad = np.zeros(sr // 2, dtype=np.float32)
    y = np.concatenate([pad, _sine(dur=0.5), pad])
    ap = _make_ap(do_trim_silence=True, trim_db=45)
    trimmed = ap.trim_silence(y)
    assert len(trimmed) < len(y) * 0.7


def test_save_load_wav(tmp_path):
    ap = _make_ap()
    y = _sine(dur=0.2)
    p = str(tmp_path / "x.wav")
    ap.save_wav(y, p)
    y2 = ap.load_wav(p)
    assert abs(len(y2) - len(y)) < 4
    # normalized to near full scale by save_wav
    corr = np.corrcoef(y[: len(y2)], y2[: len(y)])[0, 1]
    assert corr > 0.99


def test_mulaw_quantize_roundtrip():
    y = _sine(dur=0.01)
    enc = nt.mulaw_encode(wav=y, mulaw_qc=10)
    assert enc.min() >= 0 and enc.max() <= 1023
    q = nt.quantize(x=y, quantize_bits=10)
    dq = nt.dequantize(x=q, quantize_bits=10)
    np.testing.assert_allclose(y, dq, atol=1e-6)


def test_jax_mel_matches_numpy():
    import jax.numpy as jnp

    from tts_tpu.audio import jax_transforms as jt

    y = _sine(dur=0.3)
    # numpy: centered stft magnitude
    D = np.abs(nt.stft(y=y, fft_size=1024, hop_length=256, win_length=1024))
    mel_np = np.dot(mel_filterbank(22050, 1024, 80, fmax=8000.0), D)
    mag_jax = jt.stft_magnitude(jnp.asarray(y), 1024, 256, 1024, center=True)
    np.testing.assert_allclose(np.asarray(mag_jax), D, atol=2e-3)
    mel_jax = np.exp(
        np.asarray(
            jt.spec_to_mel(jnp.asarray(mag_jax)[None], 1024, 80, 22050, 0.0, 8000.0)[0]
        )
    )
    np.testing.assert_allclose(mel_jax, np.maximum(mel_np, 1e-5), atol=2e-3, rtol=1e-2)


def test_jax_vits_convention_frame_count():
    import jax.numpy as jnp

    from tts_tpu.audio import jax_transforms as jt

    hop = 256
    y = jnp.zeros((2, hop * 40))
    spec = jt.wav_to_spec(y, 1024, hop, 1024, center=False)
    # VITS convention: T_spec == T_wav / hop
    assert spec.shape == (2, 513, 40)
    mel = jt.wav_to_mel(y, 1024, 80, 22050, hop, 1024)
    assert mel.shape == (2, 80, 40)
