from .base import DensityEstimator
from .kde import GaussianKDE, KDE2D
from .unimodal import UnimodalPdf
from .hdi import sample_hdi, sample_hdi_device

__all__ = [
    "DensityEstimator",
    "GaussianKDE",
    "KDE2D",
    "UnimodalPdf",
    "sample_hdi",
    "sample_hdi_device",
]
