"""Optimizer factory guards (reference trainer ``check_update`` NaN/Inf
skip; optax chain semantics)."""

import jax.numpy as jnp
import numpy as np


def test_skip_non_finite_grads_guard():
    from tts_tpu.trainer.optim import build_optimizer

    tx = build_optimizer("adamw", 0.1, grad_clip=1.0, skip_non_finite=True)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)

    import optax

    # finite grad → params move
    updates, state = tx.update({"w": jnp.ones((3,))}, state, params)
    moved = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(moved["w"]), 1.0)

    # NaN grad → zero update, inner state untouched
    bad = {"w": jnp.asarray([1.0, np.nan, 1.0])}
    updates, state2 = tx.update(bad, state, moved)
    unchanged = optax.apply_updates(moved, updates)
    assert np.allclose(np.asarray(unchanged["w"]), np.asarray(moved["w"]))
    assert int(state2.notfinite_count) == 1

    # next finite grad applies again
    updates, state3 = tx.update({"w": jnp.ones((3,))}, state2, unchanged)
    assert int(state3.notfinite_count) == 0


def test_skip_non_finite_wraps_outside_multisteps():
    """a NaN micro-batch must not poison the accumulation buffer."""
    import optax

    from tts_tpu.trainer.optim import build_optimizer

    tx = build_optimizer("sgd", 1.0, grad_accum=2, skip_non_finite=True)
    params = {"w": jnp.zeros(())}
    state = tx.init(params)
    # micro 1: grad 2.0 (accumulated); micro 2: NaN (skipped, does NOT count
    # toward the every-k schedule); micro 3: grad 4.0 → apply mean(2,4)=3
    for g, expect_move in [(2.0, 0.0), (float("nan"), 0.0), (4.0, -3.0)]:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    assert np.isclose(float(params["w"]), -3.0), float(params["w"])
