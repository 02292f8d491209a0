"""Low-level compute ops: MXU-friendly pairwise-distance / covariance
assembly (with Pallas TPU kernels for the large-N hot path), device
linear-algebra helpers (``linalg``) and the mixed-precision restarted
PCG solver (``solvers``)."""

from .pairwise import scaled_sq_distances, sqexp_covariance
from .linalg import add_diagonal, identity_like
from .solvers import mixed_pcg

__all__ = [
    "scaled_sq_distances",
    "sqexp_covariance",
    "add_diagonal",
    "identity_like",
    "mixed_pcg",
]
