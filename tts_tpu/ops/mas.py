"""Monotonic Alignment Search (MAS) — Viterbi over alignment lattices.

The reference implements this as a Cython kernel with an OpenMP batch loop
(``TTS/tts/utils/monotonic_align/core.pyx``) and pays a GPU→CPU→GPU round
trip per training step (``TTS/tts/utils/helpers.py:178-194``).  Here the DP
runs **on-device inside the jitted train step** as a ``lax.scan`` over mel
frames: each step is a vectorized ``[B, T_x]`` shift/max/add (VPU work),
so the whole search is O(T_y) sequential steps with no host transfer and
is differentiable-free (stop-gradient semantics like the reference).

Used by GlowTTS, VITS (``vits.py:909 forward_mas``), AlignTTS and the
ForwardTTS aligner.

A numpy host version (:func:`maximum_path_numpy`) is kept for
preprocessing tools and parity tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["maximum_path", "maximum_path_numpy"]

_NEG = -1e9


def maximum_path(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Best monotonic path through ``value`` (higher = better).

    Args:
        value: ``[B, T_x, T_y]`` log-likelihoods (text × mel).
        mask: ``[B, T_x, T_y]`` valid-region mask (outer product of the
            text and mel sequence masks).
    Returns:
        ``[B, T_x, T_y]`` hard 0/1 path, same dtype as ``value``.
    """
    dtype = value.dtype
    value = (value * mask).astype(jnp.float32)
    mask_f = mask.astype(jnp.float32)
    B, T_x, T_y = value.shape
    x_range = jnp.arange(T_x)[None, :]  # [1, T_x]

    # ---- forward DP: scan over mel frames --------------------------------
    # carry: v [B, T_x] best score ending at (x, j); out: direction column
    def fwd_step(v, inp):
        j, val_col = inp  # val_col: [B, T_x]
        v0 = jnp.pad(v, ((0, 0), (1, 0)), constant_values=_NEG)[:, :-1]  # v[x-1]
        stay = v >= v0
        v_max = jnp.where(stay, v, v0)
        in_range = x_range <= j
        v_new = jnp.where(in_range, v_max + val_col, _NEG)
        return v_new, stay

    js = jnp.arange(T_y)
    _, directions = jax.lax.scan(
        fwd_step, jnp.zeros((B, T_x), jnp.float32), (js, jnp.moveaxis(value, 2, 0))
    )  # directions: [T_y, B, T_x] bool, True = "stay on same token"

    # outside the valid region the reference forces direction=1 (stay), so
    # the backtrack index is frozen until j enters the valid region
    # (helpers.py:225: ``direction = np.where(mask, direction, 1)``).
    mask_t = jnp.moveaxis(mask_f, 2, 0) > 0  # [T_y, B, T_x]
    directions = jnp.where(mask_t, directions, True)

    # ---- backtrack: scan over mel frames in reverse ----------------------
    start_index = jnp.sum(mask_f[:, :, 0], axis=1).astype(jnp.int32) - 1  # x_len - 1

    def bwd_step(index, dir_col):
        onehot = jax.nn.one_hot(index, T_x, dtype=jnp.float32)  # [B, T_x]
        d = jnp.take_along_axis(dir_col, index[:, None], axis=1)[:, 0]
        new_index = index + d.astype(jnp.int32) - 1
        return new_index, onehot

    _, path_cols = jax.lax.scan(bwd_step, start_index, directions, reverse=True)
    path = jnp.moveaxis(path_cols, 0, 2)  # [B, T_x, T_y]
    return jax.lax.stop_gradient((path * mask_f).astype(dtype))


def maximum_path_numpy(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Host-side MAS (same contract; fallback for tools + parity oracle).

    A direct numpy transcription of the ``lax.scan`` formulation above:
    one forward sweep over mel frames recording whether the best path
    *stays* on the current token or *advances* from the previous one, then
    a reverse cursor walk emitting the one-hot path.
    """
    valid = np.asarray(mask) > 0
    value = np.asarray(value, np.float32) * valid
    B, T_x, T_y = value.shape
    token_pos = np.arange(T_x)[None, :]

    best = np.zeros((B, T_x), np.float32)
    stay = np.empty((B, T_x, T_y), bool)
    for j in range(T_y):
        from_prev = np.concatenate(
            [np.full((B, 1), _NEG, np.float32), best[:, :-1]], axis=1
        )
        stay[:, :, j] = best >= from_prev
        best = np.where(
            token_pos <= j, np.maximum(best, from_prev) + value[:, :, j], _NEG
        )
    # freeze the cursor outside the valid region (same convention as the
    # on-device version: padding frames keep the cursor in place)
    stay = np.where(valid, stay, True)

    path = np.zeros((B, T_x, T_y), np.float32)
    cursor = valid[:, :, 0].sum(1).astype(np.int64) - 1  # last valid token
    rows = np.arange(B)
    for j in range(T_y - 1, -1, -1):
        path[rows, cursor, j] = 1.0
        cursor = cursor + np.where(stay[rows, cursor, j], 0, -1)
    return path * valid.astype(np.float32)
