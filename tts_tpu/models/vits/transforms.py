"""Piecewise rational-quadratic spline flows (Durkan et al., Neural Spline
Flows) used by the VITS stochastic duration predictor (reference
``TTS/tts/layers/vits/transforms.py:202``).

JAX version is fully vectorized/masked (no boolean indexing): the spline is
evaluated for every element and blended with the identity tails via
``jnp.where`` — branch-free, so it jits cleanly on TPU.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def piecewise_rational_quadratic_transform(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    tails: str = "linear",
    tail_bound: float = 5.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Monotonic RQ spline on ``[-tail_bound, tail_bound]``, identity outside.

    ``inputs``: ``[...]``; ``unnormalized_*``: ``[..., num_bins(|num_bins-1)]``.
    Returns (outputs, logabsdet) elementwise.
    """
    assert tails == "linear", "only linear tails are used by VITS"
    num_bins = unnormalized_widths.shape[-1]

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    # linear tails: pad derivative endpoints with the constant whose
    # softplus is exactly 1 (identity slope at the boundary)
    constant = float(np.log(np.exp(1 - min_derivative) - 1))
    unnormalized_derivatives = jnp.pad(
        unnormalized_derivatives,
        [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)],
        constant_values=constant,
    )

    widths = jnp.exp(unnormalized_widths - jnp.max(unnormalized_widths, -1, keepdims=True))
    widths = widths / jnp.sum(widths, -1, keepdims=True)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, -1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (2 * tail_bound) * cumwidths - tail_bound
    cumwidths = cumwidths.at[..., 0].set(-tail_bound)
    cumwidths = cumwidths.at[..., -1].set(tail_bound)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jnp.logaddexp(unnormalized_derivatives, 0.0)  # softplus

    heights = jnp.exp(unnormalized_heights - jnp.max(unnormalized_heights, -1, keepdims=True))
    heights = heights / jnp.sum(heights, -1, keepdims=True)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, -1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (2 * tail_bound) * cumheights - tail_bound
    cumheights = cumheights.at[..., 0].set(-tail_bound)
    cumheights = cumheights.at[..., -1].set(tail_bound)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    # clamp to the interval so tail elements still index a valid bin
    x = jnp.clip(inputs, -tail_bound, tail_bound)
    bins = cumheights if inverse else cumwidths
    # bin index: number of knots <= x, minus 1 (reference searchsorted)
    idx = jnp.sum((x[..., None] >= bins[..., 1:]).astype(jnp.int32), axis=-1)
    idx = jnp.clip(idx, 0, num_bins - 1)[..., None]

    input_cumwidths = jnp.take_along_axis(cumwidths, idx, -1)[..., 0]
    input_bin_widths = jnp.take_along_axis(widths, idx, -1)[..., 0]
    input_cumheights = jnp.take_along_axis(cumheights, idx, -1)[..., 0]
    input_heights = jnp.take_along_axis(heights, idx, -1)[..., 0]
    delta = input_heights / input_bin_widths
    input_derivatives = jnp.take_along_axis(derivatives, idx, -1)[..., 0]
    input_derivatives_p1 = jnp.take_along_axis(derivatives[..., 1:], idx, -1)[..., 0]

    if inverse:
        y_rel = x - input_cumheights
        term = y_rel * (input_derivatives + input_derivatives_p1 - 2 * delta)
        a = input_heights * (delta - input_derivatives) + term
        b = input_heights * input_derivatives - term
        c = -delta * y_rel
        discriminant = jnp.maximum(b**2 - 4 * a * c, 0.0)
        root = (2 * c) / (-b - jnp.sqrt(discriminant))
        outputs = root * input_bin_widths + input_cumwidths
        theta_one_minus_theta = root * (1 - root)
        denominator = delta + (
            (input_derivatives + input_derivatives_p1 - 2 * delta) * theta_one_minus_theta
        )
        derivative_numerator = delta**2 * (
            input_derivatives_p1 * root**2
            + 2 * delta * theta_one_minus_theta
            + input_derivatives * (1 - root) ** 2
        )
        logabsdet = -(jnp.log(derivative_numerator) - 2 * jnp.log(denominator))
    else:
        theta = (x - input_cumwidths) / input_bin_widths
        theta_one_minus_theta = theta * (1 - theta)
        numerator = input_heights * (delta * theta**2 + input_derivatives * theta_one_minus_theta)
        denominator = delta + (
            (input_derivatives + input_derivatives_p1 - 2 * delta) * theta_one_minus_theta
        )
        outputs = input_cumheights + numerator / denominator
        derivative_numerator = delta**2 * (
            input_derivatives_p1 * theta**2
            + 2 * delta * theta_one_minus_theta
            + input_derivatives * (1 - theta) ** 2
        )
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)

    outputs = jnp.where(inside, outputs, inputs)
    logabsdet = jnp.where(inside, logabsdet, 0.0)
    return outputs, logabsdet
