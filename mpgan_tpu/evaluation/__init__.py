from .jet_features import jet_features
from .w1 import w1p, w1m, w1efp, wasserstein1d
from .efp import efps, efp_multigraphs
from .fpd import frechet_distance, fpd, fgd_inf
from .cov_mmd import cov_mmd

__all__ = [
    "jet_features",
    "w1p",
    "w1m",
    "w1efp",
    "wasserstein1d",
    "efps",
    "efp_multigraphs",
    "frechet_distance",
    "fpd",
    "fgd_inf",
    "cov_mmd",
]
