from .gibbs import MetropolisChain, GibbsChain
from .pca import PcaChain
from .ensemble import EnsembleSampler
from .hmc import HamiltonianChain
from .nuts import NutsChain
from .parallel import ParallelTempering, ChainPool
from .utilities import Bounds, effective_sample_size, ChainProgressPrinter

__all__ = [
    "MetropolisChain",
    "GibbsChain",
    "PcaChain",
    "EnsembleSampler",
    "HamiltonianChain",
    "NutsChain",
    "ParallelTempering",
    "ChainPool",
    "Bounds",
    "effective_sample_size",
    "ChainProgressPrinter",
]
