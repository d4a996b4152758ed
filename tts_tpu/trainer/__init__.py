"""Training runtime (replaces the reference's external coqui Trainer package).

Jitted train steps with optax, multi-optimizer GAN sequencing fused into a
single gradient pass, bf16 compute policy with fp32 loss reductions, orbax
checkpointing, and data-parallel execution over a device mesh.
"""

from .callbacks import TrainerCallback  # noqa: F401
from .optim import build_lr_schedule, build_optimizer  # noqa: F401
from .state import TrainState  # noqa: F401
