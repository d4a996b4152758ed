"""Sequence helpers (masking, segments, duration expansion).

Behavior-equivalent rebuild of reference ``TTS/tts/utils/helpers.py`` as
pure JAX: everything here is shape-static, differentiable where relevant,
and safe under ``jit``/``vmap``/``pjit``.  Host-only utilities
(beta-binomial prior) stay numpy.

Key divergences from the reference (TPU-native):
  * No Python loops over batch: ``segment`` (reference ``helpers.py:60``
    loops over ``B``) becomes a vectorized dynamic-slice gather.
  * ``rand_segments`` takes an explicit PRNG key (functional purity).
  * Values are time-major ``[B, T, C]`` where the reference uses
    ``[B, C, T]``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "sequence_mask",
    "segment",
    "rand_segments",
    "average_over_durations",
    "generate_path",
    "beta_binomial_prior_distribution",
    "compute_attn_prior",
]


def sequence_mask(sequence_lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """Boolean padding mask ``[B, T_max]`` (reference ``helpers.py:43``).

    ``max_len`` must be static under jit (pass the padded dimension).
    """
    seq_range = jnp.arange(max_len)
    return seq_range[None, :] < sequence_lengths[:, None]


def segment(
    x: jnp.ndarray,
    segment_indices: jnp.ndarray,
    segment_size: int,
    pad_short: bool = False,
) -> jnp.ndarray:
    """Slice ``segment_size`` frames starting at per-sample indices.

    Vectorized equivalent of the reference's per-sample loop
    (``helpers.py:60-84``): one ``dynamic_slice`` per sample via vmap →
    XLA gather, no host sync.

    Args:
        x: ``[B, T, C]`` input.
        segment_indices: ``[B]`` int start frames.
    Returns:
        ``[B, segment_size, C]``.
    """
    if pad_short and x.shape[1] < segment_size:
        x = jnp.pad(x, ((0, 0), (0, segment_size - x.shape[1]), (0, 0)))

    def slice_one(xi, idx):
        return jax.lax.dynamic_slice_in_dim(xi, idx, segment_size, axis=0)

    return jax.vmap(slice_one)(x, segment_indices)


def rand_segments(
    rng: jax.Array,
    x: jnp.ndarray,
    x_lengths: Optional[jnp.ndarray] = None,
    segment_size: int = 4,
    let_short_samples: bool = False,
    pad_short: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random fixed-size segments per sample (reference ``helpers.py:87``).

    Args:
        rng: PRNG key (replaces the reference's implicit ``torch.rand``).
        x: ``[B, T, C]``.
        x_lengths: ``[B]`` valid lengths; defaults to full length.
    Returns:
        (segments ``[B, segment_size, C]``, start indices ``[B]``).
    """
    B, T, _ = x.shape
    if pad_short and T < segment_size:
        x = jnp.pad(x, ((0, 0), (0, segment_size - T), (0, 0)))
        T = segment_size
    if x_lengths is None:
        x_lengths = jnp.full((B,), T, dtype=jnp.int32)
    len_diff = x_lengths - segment_size
    if let_short_samples or pad_short:
        len_diff = jnp.maximum(len_diff, 0)
    u = jax.random.uniform(rng, (B,))
    segment_indices = (u * (len_diff + 1)).astype(jnp.int32)
    return segment(x, segment_indices, segment_size, pad_short=pad_short), segment_indices


def average_over_durations(values: jnp.ndarray, durs: jnp.ndarray) -> jnp.ndarray:
    """Average frame-level values over per-token durations
    (reference ``helpers.py:123-145``; used by FastPitch-style pitch/energy
    conditioning).

    Args:
        values: ``[B, T_de, C]`` frame-level values (0 = "unset" frames).
        durs: ``[B, T_en]`` int durations.
    Returns:
        ``[B, T_en, C]`` per-token averages over the *nonzero* frames.
    """
    durs_ends = jnp.cumsum(durs, axis=1)
    durs_starts = jnp.pad(durs_ends[:, :-1], ((0, 0), (1, 0)))
    # prefix sums over frames, with a leading zero: [B, T_de+1, C]
    nonzero = (values != 0.0).astype(values.dtype)
    csum = jnp.pad(jnp.cumsum(values, axis=1), ((0, 0), (1, 0), (0, 0)))
    cnum = jnp.pad(jnp.cumsum(nonzero, axis=1), ((0, 0), (1, 0), (0, 0)))
    ends = jnp.clip(durs_ends, 0, values.shape[1])
    starts = jnp.clip(durs_starts, 0, values.shape[1])
    sums = jnp.take_along_axis(csum, ends[:, :, None], axis=1) - jnp.take_along_axis(
        csum, starts[:, :, None], axis=1
    )
    nelems = jnp.take_along_axis(cnum, ends[:, :, None], axis=1) - jnp.take_along_axis(
        cnum, starts[:, :, None], axis=1
    )
    return jnp.where(nelems == 0.0, 0.0, sums / jnp.maximum(nelems, 1.0))


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Monotonic hard-attention path from durations
    (reference ``helpers.py:155-170``).

    ``path[b, x, y] = 1`` iff frame ``y`` belongs to token ``x``, i.e.
    ``cum[x-1] <= y < cum[x]``.

    Args:
        duration: ``[B, T_en]``.
        mask: ``[B, T_en, T_de]``.
    Returns:
        ``[B, T_en, T_de]`` float path.
    """
    t_y = mask.shape[2]
    cum_duration = jnp.cumsum(duration, axis=1)  # [B, T_en]
    cum_prev = jnp.pad(cum_duration[:, :-1], ((0, 0), (1, 0)))
    y_range = jnp.arange(t_y)[None, None, :]
    path = (y_range < cum_duration[:, :, None]) & (y_range >= cum_prev[:, :, None])
    return path.astype(mask.dtype) * mask


# ---------------------------------------------------------------------------
# host-side priors (numpy; used by dataset attn_prior precompute)
# ---------------------------------------------------------------------------


def beta_binomial_prior_distribution(
    phoneme_count: int, mel_count: int, scaling_factor: float = 1.0
) -> np.ndarray:
    """Beta-binomial alignment prior ``[mel_count, phoneme_count]``
    (reference ``helpers.py:240-250``)."""
    from scipy.stats import betabinom

    P, M = phoneme_count, mel_count
    x = np.arange(0, P)
    rows = []
    for i in range(1, M + 1):
        a, b = scaling_factor * i, scaling_factor * (M + 1 - i)
        rows.append(betabinom(P, a, b).pmf(x))
    return np.array(rows)


def compute_attn_prior(x_len: int, y_len: int, scaling_factor: float = 1.0) -> np.ndarray:
    """[y_len, x_len] attention prior (reference ``helpers.py:253``)."""
    return beta_binomial_prior_distribution(x_len, y_len, scaling_factor)
