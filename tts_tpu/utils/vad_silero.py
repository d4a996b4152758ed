"""Learned voice activity detection with the Silero-VAD v5 weight layout.

The reference wraps the pretrained Silero-VAD through torch.hub
(``TTS/utils/vad.py:37-88``).  In a zero-egress build the pretrained
``.jit`` file cannot be fetched, so this module provides the TPU-native
half of that story: a JAX implementation of the Silero v5 network whose
parameters convert 1:1 from the public Silero state_dict layout

    _model.stft.forward_basis_buffer            (258, 1, 256)
    _model.encoder.{0..3}.reparam_conv.weight   conv1d k=3
    _model.encoder.{0..3}.reparam_conv.bias
    _model.decoder.rnn.{weight_ih,weight_hh,bias_ih,bias_hh}   LSTMCell(128)
    _model.decoder.decoder.2.{weight,bias}      conv1d k=1 -> sigmoid

so a user who has the Silero checkpoint drops it in via
``load_silero_state_dict`` and gets the learned VAD on TPU; CI proves the
conversion with a locally built torch mirror (``tests/test_vad.py``).

Chunk pipeline (documented here because the upstream ships only
TorchScript): audio is consumed in 512-sample chunks at 16 kHz.  Each
step prepends the last 64 samples of the previous chunk as context,
reflect-pads 64 samples on the right, takes a 256-point strided DFT
(hop 128, via the ``forward_basis_buffer`` matmul -> magnitude), runs the
4-block conv encoder over the resulting 4 frames, mean-pools time, and
advances an LSTMCell whose hidden state feeds the sigmoid head.  State
(context, h, c) is carried across chunks with ``lax.scan`` so the whole
utterance is one jitted call.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

SAMPLE_RATE = 16000
CHUNK = 512
CONTEXT = 64
FILTER_LENGTH = 256
HOP = 128
N_BINS = FILTER_LENGTH // 2 + 1  # 129
HIDDEN = 128

# encoder conv channel plan: in -> out per block (kernel 3, pad 1, ReLU)
_ENC_CHANNELS = [(N_BINS, 128), (128, 64), (64, 64), (64, 128)]


def convert_silero_state_dict(sd: Dict[str, "np.ndarray"]) -> Dict[str, np.ndarray]:
    """Map a Silero v5 ``state_dict`` (torch tensors or arrays, keys as in
    the module docstring) to this module's flat param dict."""

    def arr(key):
        v = sd[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    params: Dict[str, np.ndarray] = {
        # (258, 1, 256) -> (256, 258) matmul basis
        "stft_basis": arr("_model.stft.forward_basis_buffer")[:, 0, :].T,
        "rnn_wih": arr("_model.decoder.rnn.weight_ih"),
        "rnn_whh": arr("_model.decoder.rnn.weight_hh"),
        "rnn_bih": arr("_model.decoder.rnn.bias_ih"),
        "rnn_bhh": arr("_model.decoder.rnn.bias_hh"),
        # (1, 128, 1) conv1d k=1 -> (128,) vector
        "head_w": arr("_model.decoder.decoder.2.weight")[0, :, 0],
        "head_b": arr("_model.decoder.decoder.2.bias"),
    }
    for i in range(4):
        params[f"enc{i}_w"] = arr(f"_model.encoder.{i}.reparam_conv.weight")
        params[f"enc{i}_b"] = arr(f"_model.encoder.{i}.reparam_conv.bias")
    return params


def load_silero_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load Silero weights from a ``.jit`` (TorchScript) or plain ``.pth``
    file and convert.  Requires torch only at call time (host-side, one
    shot — the converted arrays then live on TPU)."""
    import torch

    try:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return convert_silero_state_dict(sd)


def random_params(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random-weight param dict with the real shapes (tests, smoke)."""
    rng = np.random.RandomState(seed)

    def r(*shape):
        return (rng.randn(*shape) * 0.2).astype(np.float32)

    params = {
        "stft_basis": r(FILTER_LENGTH, 2 * N_BINS),
        "rnn_wih": r(4 * HIDDEN, HIDDEN),
        "rnn_whh": r(4 * HIDDEN, HIDDEN),
        "rnn_bih": r(4 * HIDDEN),
        "rnn_bhh": r(4 * HIDDEN),
        "head_w": r(HIDDEN),
        "head_b": r(1),
    }
    for i, (cin, cout) in enumerate(_ENC_CHANNELS):
        params[f"enc{i}_w"] = r(cout, cin, 3)
        params[f"enc{i}_b"] = r(cout)
    return params


def _conv1d_same(x, w, b):
    """x: (C_in, T); w: (C_out, C_in, 3) torch conv layout; pad=1."""
    import jax.numpy as jnp

    xp = jnp.pad(x, ((0, 0), (1, 1)))
    # windows: (C_in, 3, T) gathered as stacked shifts
    win = jnp.stack([xp[:, i : i + x.shape[1]] for i in range(3)], axis=1)
    return jnp.einsum("oik,ikt->ot", w, win) + b[:, None]


def _chunk_step(params, carry, chunk):
    import jax
    import jax.numpy as jnp

    context, h, c = carry
    x = jnp.concatenate([context, chunk])  # (576,)
    x = jnp.concatenate([x, x[-2 : -2 - CONTEXT : -1]])  # reflect right pad 64
    n_frames = (x.shape[0] - FILTER_LENGTH) // HOP + 1  # 4
    idx = jnp.arange(FILTER_LENGTH)[None, :] + HOP * jnp.arange(n_frames)[:, None]
    spec = x[idx] @ params["stft_basis"]  # (F, 258)
    mag = jnp.sqrt(spec[:, :N_BINS] ** 2 + spec[:, N_BINS:] ** 2 + 1e-12)
    feat = mag.T  # (129, F)
    for i in range(4):
        feat = jax.nn.relu(_conv1d_same(feat, params[f"enc{i}_w"], params[f"enc{i}_b"]))
    feat = feat.mean(axis=1)  # (128,)

    gates = params["rnn_wih"] @ feat + params["rnn_bih"] + params["rnn_whh"] @ h + params["rnn_bhh"]
    i_g, f_g, g_g, o_g = jnp.split(gates, 4)
    c = jax.nn.sigmoid(f_g) * c + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
    h = jax.nn.sigmoid(o_g) * jnp.tanh(c)

    prob = jax.nn.sigmoid(params["head_w"] @ jax.nn.relu(h) + params["head_b"][0])
    return (chunk[-CONTEXT:], h, c), prob


_RUN = None  # jitted scan, created once — caching across calls/files

# chunk-count bucket (64 chunks ≈ 2 s @16 kHz): batch dataset cleaning sees
# one compile per bucket, not one per distinct file length
_CHUNK_BUCKET = 64


def _jitted_run():
    global _RUN
    if _RUN is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def run(params, chunks):
            carry = (
                jnp.zeros((CONTEXT,), jnp.float32),
                jnp.zeros((HIDDEN,), jnp.float32),
                jnp.zeros((HIDDEN,), jnp.float32),
            )
            _, probs = jax.lax.scan(
                lambda ca, ch: _chunk_step(params, ca, ch), carry, chunks
            )
            return probs

        _RUN = run
    return _RUN


def silero_probabilities(
    params: Dict[str, np.ndarray], wav: np.ndarray, sample_rate: int
) -> np.ndarray:
    """Per-chunk speech probabilities (one per 512 samples / 32 ms @16 kHz).

    Resamples to 16 kHz if needed; whole utterance runs as one jitted
    ``lax.scan`` on the accelerator.  The chunk count is padded to a bucket
    boundary (trailing scores discarded) so file-length variation reuses
    compiled graphs."""
    import jax.numpy as jnp

    if sample_rate != SAMPLE_RATE:
        from tts_tpu.audio.numpy_transforms import resample_wav

        wav = resample_wav(np.asarray(wav, np.float32), sample_rate, SAMPLE_RATE)
    wav = np.asarray(wav, np.float32)
    n = int(np.ceil(len(wav) / CHUNK)) if len(wav) else 1
    n_pad = ((n + _CHUNK_BUCKET - 1) // _CHUNK_BUCKET) * _CHUNK_BUCKET
    wav = np.pad(wav, (0, n_pad * CHUNK - len(wav)))
    chunks = wav.reshape(n_pad, CHUNK)
    probs = np.asarray(_jitted_run()(params, jnp.asarray(chunks)))
    return probs[:n]


def frame_scores(
    params: Dict[str, np.ndarray], wav: np.ndarray, sample_rate: int
) -> tuple:
    """Adapter with the statistical VAD's ``(scores, hop_samples)`` contract
    (``tts_tpu/utils/vad.py speech_probabilities``) so the learned model
    plugs into ``get_speech_timestamps`` unchanged: hop is one chunk in
    *input-rate* samples.  Returned as a float — rounding it once would
    drift boundaries by ~0.4 samples/chunk at 22.05 kHz; the consumer
    rounds per boundary instead."""
    probs = silero_probabilities(params, wav, sample_rate)
    return probs, CHUNK * sample_rate / SAMPLE_RATE


_DEFAULT: Optional[Dict[str, np.ndarray]] = None
_DEFAULT_FAILED = False


def default_params() -> Optional[Dict[str, np.ndarray]]:
    """Silero params from ``TTS_TPU_SILERO_VAD`` (path to the checkpoint),
    cached; None when unset **or when loading fails** (warned once) —
    callers fall back to the statistical VAD either way."""
    global _DEFAULT, _DEFAULT_FAILED
    if _DEFAULT is None and not _DEFAULT_FAILED:
        import os

        path = os.environ.get("TTS_TPU_SILERO_VAD")
        if path:
            try:
                _DEFAULT = load_silero_state_dict(path)
            except Exception as e:
                _DEFAULT_FAILED = True
                import warnings

                warnings.warn(
                    f"TTS_TPU_SILERO_VAD={path!r} could not be loaded ({e}); "
                    "falling back to the statistical VAD"
                )
    return _DEFAULT
