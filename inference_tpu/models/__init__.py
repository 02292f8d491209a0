from .likelihoods import (
    Likelihood,
    GaussianLikelihood,
    CauchyLikelihood,
    LogisticLikelihood,
)
from .priors import (
    BasePrior,
    JointPrior,
    GaussianPrior,
    ExponentialPrior,
    UniformPrior,
)
from .posterior import Posterior

__all__ = [
    "Likelihood",
    "GaussianLikelihood",
    "CauchyLikelihood",
    "LogisticLikelihood",
    "BasePrior",
    "JointPrior",
    "GaussianPrior",
    "ExponentialPrior",
    "UniformPrior",
    "Posterior",
]
