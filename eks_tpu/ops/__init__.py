"""Device-side numerical kernels: Kalman filtering/smoothing, linalg, stats."""

from eks_tpu.ops.kalman import (
    FilterResult,
    SmootherResult,
    kalman_filter,
    kalman_smoother,
)
from eks_tpu.ops.pkalman import kalman_filter_parallel, kalman_smoother_parallel

__all__ = [
    "FilterResult",
    "SmootherResult",
    "kalman_filter",
    "kalman_smoother",
    "kalman_filter_parallel",
    "kalman_smoother_parallel",
]
