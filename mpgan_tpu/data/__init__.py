from .normalize import FeaturewiseLinear, FeaturewiseLinearBounded, FPND_FEATURE_MAXES
from .jetnet import JetNetDataset, gen_jet_corrections, synthetic_jets
from .mnist import MNISTGraphDataset
from .loader import BatchLoader

__all__ = [
    "FeaturewiseLinear",
    "FeaturewiseLinearBounded",
    "FPND_FEATURE_MAXES",
    "JetNetDataset",
    "gen_jet_corrections",
    "synthetic_jets",
    "MNISTGraphDataset",
    "BatchLoader",
]
