"""bf16 mixed-precision policy (replaces the reference's torch AMP
``autocast``/GradScaler, SURVEY §2.10).

TPU policy: **master params fp32, compute bf16, fp32 loss/grad updates**.
No loss scaling is needed — bf16 keeps fp32's exponent range, so the
reference's ``use_grad_scaler`` has no TPU equivalent.

Usage inside a train step::

    grads, (loss, metrics) = mp_grad(loss_fn, argnums=(0, 1))(params_a, params_b, batch)

``mp_grad`` casts the differentiated param pytrees and the float leaves of
every other argument to bf16 before tracing ``loss_fn``, then upcasts the
returned gradients to fp32 so the optax update runs on the fp32 master
copies.  The loss function itself should keep its final reductions in fp32
(cast intermediates where it matters); flax modules compute in the dtype of
their (bf16-cast) inputs/params without any per-layer changes.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

__all__ = ["cast_floats", "mp_value_and_grad", "is_mixed_precision"]


def cast_floats(tree: Any, dtype) -> Any:
    """Cast every inexact (floating) leaf of a pytree to ``dtype``."""

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(_cast, tree)


def is_mixed_precision(config) -> bool:
    return bool(getattr(config, "mixed_precision", False)) and (
        getattr(config, "precision", "bf16") in ("bf16", "bfloat16")
    )


def mp_value_and_grad(
    loss_fn: Callable,
    argnums: Union[int, Sequence[int]] = 0,
    has_aux: bool = False,
    enabled: bool = True,
):
    """``jax.value_and_grad`` under the bf16 compute policy.

    When ``enabled`` every argument's float leaves are cast to bf16 before
    the forward/backward, and the gradients are upcast back to fp32.  The
    returned callable has the same signature as
    ``jax.value_and_grad(loss_fn, argnums, has_aux)``.
    """
    if not enabled:
        return jax.value_and_grad(loss_fn, argnums=argnums, has_aux=has_aux)

    nums = (argnums,) if isinstance(argnums, int) else tuple(argnums)

    def wrapped(*args):
        # differentiate w.r.t. bf16 *copies*; master fp32 args stay outside
        def inner(*diff_args):
            full = list(args)
            for i, a in zip(nums, diff_args):
                full[i] = a
            full = [cast_floats(a, jnp.bfloat16) for a in full]
            out = loss_fn(*full)
            if has_aux:
                loss, aux = out
                return loss.astype(jnp.float32), aux
            return out.astype(jnp.float32)

        diff_args = tuple(cast_floats(args[i], jnp.bfloat16) for i in nums)
        out, grads = jax.value_and_grad(
            inner, argnums=tuple(range(len(nums))), has_aux=has_aux
        )(*diff_args)
        grads = cast_floats(grads, jnp.float32)
        if isinstance(argnums, int):
            grads = grads[0]
        return out, grads

    return wrapped
