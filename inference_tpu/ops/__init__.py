"""Low-level compute ops: MXU-friendly pairwise-distance / covariance
assembly (with Pallas TPU kernels for the large-N hot path), batched KDE
evaluation, and device linear-algebra helpers."""

from .pairwise import scaled_sq_distances, sqexp_covariance

__all__ = ["scaled_sq_distances", "sqexp_covariance"]
