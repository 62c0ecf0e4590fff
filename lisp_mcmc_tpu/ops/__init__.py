from .linalg import (
    cholesky_clamped,
    covariant_sample,
    diagonal_covariance,
    haario_scale,
    moments_covariance,
    sample_covariance,
)

__all__ = [
    "cholesky_clamped",
    "covariant_sample",
    "diagonal_covariance",
    "haario_scale",
    "moments_covariance",
    "sample_covariance",
]
