from .mpgan import (
    MPGeneratorConfig,
    MPDiscriminatorConfig,
    mp_generator_init,
    mp_generator_apply,
    mp_discriminator_init,
    mp_discriminator_apply,
)
from .gapt import (
    GAPTConfig,
    gapt_g_init,
    gapt_g_apply,
    gapt_d_init,
    gapt_d_apply,
)

__all__ = [
    "MPGeneratorConfig",
    "MPDiscriminatorConfig",
    "mp_generator_init",
    "mp_generator_apply",
    "mp_discriminator_init",
    "mp_discriminator_apply",
    "GAPTConfig",
    "gapt_g_init",
    "gapt_g_apply",
    "gapt_d_init",
    "gapt_d_apply",
]
