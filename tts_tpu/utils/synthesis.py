"""Generic synthesis path: text → token ids → model.inference → wav/mel
(reference ``TTS/tts/utils/synthesis.py``)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np


def _frame_budget(n_tokens: int, frames_per_token: int = 12, multiple: int = 128, cap: int = 4096) -> int:
    """Static frame budget for jit: generous per-token expansion rounded to a
    bucket boundary so repeated calls reuse compiled graphs."""
    est = max(int(n_tokens * frames_per_token), multiple)
    est = ((est + multiple - 1) // multiple) * multiple
    return min(est, cap)


def plan_decode_groups(y_preds, multiple: int = 32, cap: int = 4096, overhead: int = 2048, max_groups: int = 3):
    """Partition a batch by predicted decode length into at most
    ``max_groups`` groups, each decoded at its own frame bucket.

    One shared max-over-batch budget taxes short utterances in mixed
    batches — everyone pays the longest item's frames.  Sorting by the
    (cheap) duration-predictor output and splitting cuts that padding, but
    every extra group pays a fixed dispatch overhead, so the partition is
    chosen by a small DP over contiguous splits of the sorted lengths with

        cost = sum_g bucket(max y in g) * |g| + overhead * (n_groups - 1)

    where ``overhead`` is the fixed per-dispatch cost expressed in
    frame·batch units.  Measured on one v5e at VITS dims the marginal cost
    is ~12 µs per frame·batch and each dispatch carries a ~25-45 ms floor
    (launch + host round-trip), i.e. ~2000-4000 units — the 512 default
    this shipped with split far too eagerly and LOST throughput on mixed
    batches.  Returns ``[(indices, bucket), ...]`` shortest-group first,
    ``indices`` into the ORIGINAL order.  Never splits when padding waste
    is small — the DP then keeps one group, so well-matched batches keep
    full batching efficiency.  (Sequence packing — ``utils/packing.py`` —
    beats grouping wherever the model supports it; this planner remains the
    fallback for models without a packed decode path.)
    """
    n = len(y_preds)
    order = sorted(range(n), key=lambda i: int(y_preds[i]))
    ys = [max(1, int(y_preds[i])) for i in order]

    def _bucket(v: int) -> int:
        return min(((v + multiple - 1) // multiple) * multiple, cap)

    # best[i][k]: (cost, split points) covering the first i sorted items
    # with k groups; sorted order makes each group's max its last element
    best = [[None] * (max_groups + 1) for _ in range(n + 1)]
    best[0][0] = (0.0, ())
    for i in range(1, n + 1):
        for k in range(1, max_groups + 1):
            cand = None
            for j in range(i):
                prev = best[j][k - 1]
                if prev is None:
                    continue
                c = prev[0] + _bucket(ys[i - 1]) * (i - j) + (overhead if k > 1 else 0)
                if cand is None or c < cand[0]:
                    cand = (c, prev[1] + (j,))
            best[i][k] = cand
    win = min((b for b in best[n][1:] if b is not None), key=lambda t: t[0])
    splits = list(win[1]) + [n]
    groups = []
    for a, b in zip(splits[:-1], splits[1:]):
        idx = order[a:b]
        groups.append((idx, _bucket(ys[b - 1])))
    return groups


def get_jitted_durations(model):
    """Persistent jitted ``model.infer_durations`` (models that expose one),
    used to pick a duration-aware frame bucket before the expensive decode."""
    dur_fn = getattr(model, "_jitted_durations", None)
    if dur_fn is None:
        import jax

        dur_fn = jax.jit(model.infer_durations)
        model._jitted_durations = dur_fn
    return dur_fn


def get_jitted_inference(model):
    """One persistent jitted ``model.inference`` per host wrapper, with the
    frame/step budget as a static arg. Shared by the serial synthesis path
    and the server's DynamicBatcher so both reuse the same compile cache."""
    infer_fn = getattr(model, "_jitted_inference", None)
    if infer_fn is None:
        import inspect

        import jax

        sig_params = inspect.signature(model.inference).parameters
        static = tuple(k for k in ("max_frames", "max_steps") if k in sig_params)
        infer_fn = jax.jit(model.inference, static_argnames=static)
        model._jitted_inference = infer_fn
    return infer_fn


def get_jitted_packed(model):
    """Persistent jitted ``model.inference_packed`` (sequence-packed decode,
    ``utils/packing.py``); the noise-buffer length is static so calls with
    the same (plan shape, budget) reuse one compiled graph."""
    fn = getattr(model, "_jitted_packed", None)
    if fn is None:
        import jax

        fn = jax.jit(
            model.inference_packed, static_argnames=("noise_frames", "noise_layout")
        )
        model._jitted_packed = fn
    return fn


def synthesis(
    model,
    text: str,
    params,
    use_griffin_lim: bool = False,
    ap=None,
    speaker_id: Optional[int] = None,
    d_vector: Optional[np.ndarray] = None,
    language_id: Optional[int] = None,
    style_wav=None,
    style_text=None,
    max_frames: Optional[int] = None,
) -> Dict[str, Any]:
    """Tokenize → run model → collect outputs (reference ``synthesis.py:116``).

    ``model`` is a host wrapper exposing ``tokenizer`` and ``inference``.
    """
    token_ids = model.tokenizer.text_to_ids(text)
    # pad token ids to a bucket boundary (true length goes in x_lengths and
    # models mask on it) so different-length sentences share one compiled
    # graph — same recompile-avoidance as the dataset's bucketed batching,
    # driven by the same config knob
    bucket = int(getattr(getattr(model, "config", None), "pad_to_multiple_text", 16) or 16)
    n_tokens = max(1, len(token_ids))
    padded_len = ((n_tokens + bucket - 1) // bucket) * bucket
    ids = np.zeros((padded_len,), np.int32)
    ids[: len(token_ids)] = token_ids
    x = jnp.asarray(ids[None])
    x_lengths = jnp.asarray([n_tokens], jnp.int32)

    aux_input = {}
    if speaker_id is not None:
        aux_input["speaker_ids"] = jnp.asarray([speaker_id], jnp.int32)
    if d_vector is not None:
        aux_input["d_vectors"] = jnp.asarray(np.asarray(d_vector, np.float32)[None])
    if language_id is not None:
        aux_input["language_ids"] = jnp.asarray([language_id], jnp.int32)
    if style_wav is not None:
        # GST/Capacitron style reference: wav (path or array) → mel
        # (reference synthesis.py compute_style_mel)
        if isinstance(style_wav, str) and ap is not None:
            style_wav = ap.load_wav(style_wav)
        if ap is not None:
            style_mel = ap.melspectrogram(np.asarray(style_wav, np.float32))
            aux_input["style_mel"] = jnp.asarray(style_mel.T[None])  # [1, T, M]
        else:
            raise ValueError(
                "style_wav was given but no AudioProcessor is available to "
                "compute the style mel; pass `ap` or precompute the style."
            )
    if style_text is not None:
        aux_input["style_text"] = style_text

    budget = max_frames or _frame_budget(len(token_ids))
    # AR models budget decoder steps (r frames per step), parallel models
    # budget output frames — adapt to the model's inference signature
    import inspect

    sig_params = inspect.signature(model.inference).parameters
    if "max_frames" in sig_params:
        if max_frames is None and hasattr(model, "infer_durations") and "style_text" not in aux_input:
            # duration-aware bucket: the DP pass is cheap, so decode at the
            # predicted length rounded up to a 32-frame bucket instead of
            # the generous per-token estimate (≈45% of the fixed budget was
            # padding at real utterance lengths; at single-utterance lengths
            # 64-frame rounding alone wasted up to 63 frames per call)
            dur = get_jitted_durations(model)(params, x, x_lengths, aux_input=aux_input or None)
            y_len = int(np.asarray(dur).max())
            budget = min(budget, ((y_len + 31) // 32) * 32)
        budget_kw = {"max_frames": budget}
    else:
        r = int(getattr(getattr(model, "config", None), "r", 1) or 1)
        budget_kw = {"max_steps": max(1, budget // r)}

    # serve through ONE persistent jitted graph per (budget, aux structure):
    # eager apply would dispatch op-by-op, which is ruinous through the TPU
    # tunnel. style_text is a python string (Capacitron) — not traceable, so
    # that rare path stays eager.
    infer_fn = model.inference if "style_text" in aux_input else get_jitted_inference(model)
    outputs = infer_fn(params, x, x_lengths, aux_input=aux_input or None, **budget_kw)

    model_outputs = np.asarray(outputs["model_outputs"][0], np.float32)
    valid_frames = None
    for key in ("y_lengths", "mel_lengths"):  # AR models report mel_lengths
        if key in outputs:
            valid_frames = int(np.asarray(outputs[key])[0])
            break

    wav = None
    if model_outputs.ndim == 2 and model_outputs.shape[-1] == 1:
        # end-to-end model emitted a waveform [T_wav, 1]
        wav = model_outputs[:, 0]
        if valid_frames is not None:
            upsample = wav.shape[0] // budget
            wav = wav[: valid_frames * upsample]
    else:
        if valid_frames is not None:
            model_outputs = model_outputs[:valid_frames]
        if use_griffin_lim and ap is not None:
            wav = ap.inv_melspectrogram(model_outputs.T)

    return {
        "wav": wav,
        "model_outputs": model_outputs,
        "outputs": outputs,
        "text_inputs": x,
    }


def trim_silence(wav: np.ndarray, ap) -> np.ndarray:
    """Trim trailing silence (reference ``synthesis.py:210``)."""
    return wav[: ap.find_endpoint(wav)]
