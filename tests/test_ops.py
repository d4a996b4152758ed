"""Unit tests for tts_tpu.ops (reference test model:
tests/tts_tests/test_helpers.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.ops import (
    average_over_durations,
    generate_path,
    maximum_path,
    maximum_path_numpy,
    rand_segments,
    segment,
    sequence_mask,
)


def test_sequence_mask():
    lengths = jnp.array([1, 3, 2])
    mask = sequence_mask(lengths, 4)
    expected = np.array(
        [[1, 0, 0, 0], [1, 1, 1, 0], [1, 1, 0, 0]], dtype=bool
    )
    np.testing.assert_array_equal(np.asarray(mask), expected)


def test_segment():
    x = jnp.arange(2 * 8 * 3).reshape(2, 8, 3).astype(jnp.float32)
    idx = jnp.array([1, 4])
    seg = segment(x, idx, 3)
    np.testing.assert_array_equal(np.asarray(seg[0]), np.asarray(x[0, 1:4]))
    np.testing.assert_array_equal(np.asarray(seg[1]), np.asarray(x[1, 4:7]))


def test_segment_pad_short():
    x = jnp.ones((2, 2, 3))
    seg = segment(x, jnp.array([0, 0]), 4, pad_short=True)
    assert seg.shape == (2, 4, 3)
    assert float(seg[:, 2:].sum()) == 0.0


def test_rand_segments_within_bounds():
    rng = jax.random.PRNGKey(0)
    x = jnp.arange(4 * 10 * 2).reshape(4, 10, 2).astype(jnp.float32)
    lengths = jnp.array([10, 7, 5, 4])
    seg, idx = rand_segments(rng, x, lengths, segment_size=4)
    idx = np.asarray(idx)
    assert seg.shape == (4, 4, 2)
    assert (idx >= 0).all()
    assert (idx <= np.asarray(lengths) - 4).all()


def test_average_over_durations():
    # values [B=1, T_de=8, C=1], durs [1, 3] summing to 8
    values = jnp.array([[[2.0], [2.0], [0.0], [4.0], [4.0], [4.0], [6.0], [6.0]]])
    durs = jnp.array([[3, 3, 2]])
    avg = average_over_durations(values, durs)
    # token0 frames [2,2,0] -> nonzero avg 2; token1 [4,4,4] -> 4; token2 [6,6] -> 6
    np.testing.assert_allclose(np.asarray(avg)[0, :, 0], [2.0, 4.0, 6.0])


def test_generate_path():
    durations = jnp.array([[2, 3, 0], [1, 1, 1]])
    x_mask = sequence_mask(jnp.array([2, 3]), 3).astype(jnp.float32)
    y_mask = sequence_mask(jnp.array([5, 3]), 5).astype(jnp.float32)
    mask = x_mask[:, :, None] * y_mask[:, None, :]
    path = np.asarray(generate_path(durations, mask))
    # sample 0: token0 -> frames 0-1, token1 -> frames 2-4
    expected0 = np.array(
        [[1, 1, 0, 0, 0], [0, 0, 1, 1, 1], [0, 0, 0, 0, 0]], dtype=np.float32
    )
    np.testing.assert_array_equal(path[0], expected0)
    # each valid frame assigned exactly one token
    assert (path[0].sum(0) == np.array([1, 1, 1, 1, 1])).all()
    assert (path[1].sum(0)[:3] == 1).all()


def _brute_force_mas(value, x_len, y_len):
    """Exhaustive DP reference for one sample."""
    import itertools

    best, best_path = -np.inf, None
    # enumerate all monotonic paths: choose positions where x increments
    for incr in itertools.combinations(range(1, y_len), x_len - 1):
        xs = np.zeros(y_len, dtype=int)
        for i in incr:
            xs[i:] += 1
        score = sum(value[xs[j], j] for j in range(y_len))
        if score > best:
            best = score
            best_path = xs
    path = np.zeros_like(value)
    for j, x in enumerate(best_path):
        path[x, j] = 1
    return path


def test_maximum_path_matches_numpy_and_bruteforce():
    rng = np.random.RandomState(0)
    B, T_x, T_y = 3, 4, 7
    value = rng.randn(B, T_x, T_y).astype(np.float32)
    x_lens = np.array([4, 3, 2])
    y_lens = np.array([7, 6, 4])
    mask = (
        (np.arange(T_x)[None, :, None] < x_lens[:, None, None])
        & (np.arange(T_y)[None, None, :] < y_lens[:, None, None])
    ).astype(np.float32)

    path_np = maximum_path_numpy(value, mask)
    path_jax = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    np.testing.assert_array_equal(path_jax, path_np)

    for b in range(B):
        bf = _brute_force_mas(value[b], x_lens[b], y_lens[b])
        np.testing.assert_array_equal(
            path_jax[b, : x_lens[b], : y_lens[b]], bf[: x_lens[b], : y_lens[b]]
        )
        # padded region must be zero
        assert path_jax[b, x_lens[b]:, :].sum() == 0
        assert path_jax[b, :, y_lens[b]:].sum() == 0


def test_maximum_path_under_jit():
    f = jax.jit(maximum_path)
    value = jnp.zeros((2, 3, 5))
    mask = jnp.ones((2, 3, 5))
    path = np.asarray(f(value, mask))
    # every frame maps to exactly one token, monotonic, ends at last token
    assert (path.sum(1) == 1).all()
    assert path[0, 2, 4] == 1
