from .config import VitsArgs, VitsAudioConfig, VitsConfig  # noqa: F401
from .model import (  # noqa: F401
    Vits,
    VitsModule,
    discriminator_adv_loss,
    feature_loss,
    generator_adv_loss,
    kl_loss,
)
from .modules import VitsDiscriminator  # noqa: F401
