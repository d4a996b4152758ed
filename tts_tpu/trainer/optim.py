"""Optimizer/schedule factory (optax).

Mirrors the reference's optimizer surface: AdamW (``vits.py:1652``),
RAdam (``TTS/utils/radam.py``), NoamLR warmup (glow-tts), ExponentialLR
(vits), StepwiseGradualLR (tacotron gradual training).
"""

from __future__ import annotations

from typing import Optional

import optax

__all__ = ["build_optimizer", "build_lr_schedule"]


def build_lr_schedule(name: Optional[str], lr: float, params: Optional[dict] = None):
    """LR schedule by reference name."""
    params = params or {}
    if name is None or name == "":
        return lr
    name = name.lower()
    if name == "noamlr":
        # NoamLR: lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5)
        warmup = params.get("warmup_steps", 4000)
        import jax.numpy as jnp

        def schedule(step):
            s = jnp.maximum(step.astype(jnp.float32) if hasattr(step, "astype") else float(step), 1.0)
            return lr * (warmup**0.5) * jnp.minimum(s**-0.5, s * warmup**-1.5)

        return schedule
    if name == "exponentiallr":
        gamma = params.get("gamma", 0.999875)
        # per-epoch decay in the reference (scheduler_after_epoch); applied
        # per-step here with the same gamma unless steps_per_epoch is given
        steps_per_epoch = params.get("steps_per_epoch", 1)

        def schedule(step):
            return lr * gamma ** (step // steps_per_epoch)

        return schedule
    if name == "steplr":
        step_size = params.get("step_size", 30)
        gamma = params.get("gamma", 0.1)

        def schedule(step):
            return lr * gamma ** (step // step_size)

        return schedule
    if name == "stepwisegraduallr":
        # piecewise-constant LR: last [threshold, lr] pair (in list order)
        # whose threshold <= step wins (reference Capacitron recipes)
        import jax.numpy as jnp

        pairs = params.get("gradual_learning_rates") or [[0, lr]]
        thresholds = jnp.asarray([float(p[0]) for p in pairs])
        lrs = jnp.asarray([float(p[1]) for p in pairs])
        pos = jnp.arange(len(pairs))

        def schedule(step):
            s = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
            idx = jnp.max(jnp.where(thresholds <= s, pos, 0))
            return lrs[idx]

        return schedule
    raise ValueError(f"Unknown lr scheduler {name!r}")


def build_optimizer(
    name: str,
    lr,
    params: Optional[dict] = None,
    grad_clip: float = 0.0,
    grad_accum: int = 1,
    skip_non_finite: bool = False,
) -> optax.GradientTransformation:
    """Build an optax chain for a reference optimizer name.

    ``grad_accum > 1`` wraps the chain in ``optax.MultiSteps`` so gradients
    average over N micro-batches and apply every N-th call (reference
    ``grad_accum_steps``, e.g. the XTTS recipe
    ``recipes/ljspeech/xtts_v2/train_gpt_xtts.py:164``).

    ``skip_non_finite`` guards every update with ``optax.apply_if_finite``:
    a micro-batch whose gradients contain NaN/Inf leaves params and inner
    optimizer state untouched (the reference trainer's ``check_update``
    grad-norm skip, but branch-free inside the compiled step).
    """
    params = dict(params or {})
    name = (name or "adamw").lower()
    betas = params.pop("betas", (0.9, 0.999))
    eps = params.pop("eps", 1e-8)
    weight_decay = params.pop("weight_decay", 0.0)

    if name == "adamw":
        tx = optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    elif name == "adam":
        tx = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    elif name == "radam":
        tx = optax.chain(
            optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps),
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.scale_by_learning_rate(lr),
        )
    elif name == "sgd":
        tx = optax.sgd(lr, momentum=params.pop("momentum", 0.0))
    elif name == "rmsprop":
        tx = optax.rmsprop(lr, decay=params.pop("alpha", 0.99), eps=eps)
    else:
        raise ValueError(f"Unknown optimizer {name!r}")

    if grad_clip and grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if grad_accum and grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(grad_accum))
    if skip_non_finite:
        # outermost so a bad micro-batch skips MultiSteps accumulation too.
        # the huge error budget means "skip indefinitely" (matching the
        # reference's check_update, which never gives up) — apply_if_finite
        # would otherwise APPLY the bad update once the count is exceeded.
        # per-step visibility comes from the grad_norm metric (NaN when the
        # step was skipped).
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10**9)
    return tx
