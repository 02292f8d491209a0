from .regression import GpRegressor
from .optimisation import GpOptimiser
from .inversion import GpLinearInverter
from .large_scale import LargeScaleGP
from .large_inversion import LargeScaleGpLinearInverter
from .acquisition import (
    ExpectedImprovement,
    UpperConfidenceBound,
    MaxVariance,
)
from .mean import ConstantMean, LinearMean, QuadraticMean
from .covariance import (
    SquaredExponential,
    RationalQuadratic,
    WhiteNoise,
    HeteroscedasticNoise,
    ChangePoint,
    CovarianceFunction,
    CompositeCovariance,
)

__all__ = [
    "GpRegressor",
    "GpOptimiser",
    "GpLinearInverter",
    "LargeScaleGP",
    "LargeScaleGpLinearInverter",
    "ExpectedImprovement",
    "UpperConfidenceBound",
    "MaxVariance",
    "ConstantMean",
    "LinearMean",
    "QuadraticMean",
    "SquaredExponential",
    "RationalQuadratic",
    "WhiteNoise",
    "HeteroscedasticNoise",
    "ChangePoint",
    "CovarianceFunction",
    "CompositeCovariance",
]
