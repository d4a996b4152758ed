"""Train state container for one or more optimizers.

The reference's multi-optimizer sequencing (GAN: D step then G step,
``trainer`` pkg + ``gan.py:68``) becomes named param groups updated inside
one jitted step.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    """Pytree: step + named param groups + their optimizer states."""

    step: jax.Array
    params: Dict[str, Any]
    opt_states: Dict[str, Any]

    @classmethod
    def create(cls, params: Dict[str, Any], optimizers: Dict[str, optax.GradientTransformation]):
        import jax.numpy as jnp

        opt_states = {k: optimizers[k].init(params[k]) for k in optimizers}
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_states=opt_states)

    def apply_updates(self, optimizers, grads: Dict[str, Any]) -> "TrainState":
        new_params = dict(self.params)
        new_opt_states = dict(self.opt_states)
        for k, g in grads.items():
            updates, new_opt_states[k] = optimizers[k].update(
                g, self.opt_states[k], self.params[k]
            )
            new_params[k] = optax.apply_updates(self.params[k], updates)
        return self.replace(step=self.step + 1, params=new_params, opt_states=new_opt_states)
