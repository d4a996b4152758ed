"""Core tensor ops shared across models (pure JAX, shape-static, jittable).

Layout convention for the whole framework: feature tensors are time-major
``[B, T, C]`` (channels on the TPU lane dimension), unlike the reference's
torch ``[B, C, T]``.  Alignment maps are ``[B, T_en, T_de]`` as in the
reference.
"""

from .helpers import (  # noqa: F401
    average_over_durations,
    beta_binomial_prior_distribution,
    compute_attn_prior,
    generate_path,
    rand_segments,
    segment,
    sequence_mask,
)
from .mas import maximum_path, maximum_path_numpy  # noqa: F401
