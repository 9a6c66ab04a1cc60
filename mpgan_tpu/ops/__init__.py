from .linear import MLPConfig, mlp_init, mlp_apply, linear_init
from .spectral_norm import spectral_normalize
from .masking import mask_from_counts, mask_manual
from . import mp

__all__ = [
    "MLPConfig",
    "mlp_init",
    "mlp_apply",
    "linear_init",
    "spectral_normalize",
    "mask_from_counts",
    "mask_manual",
    "mp",
]
