from .hmc import HamiltonianChain
from .utilities import Bounds

__all__ = [
    "HamiltonianChain",
    "Bounds",
]
