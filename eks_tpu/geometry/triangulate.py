"""Batched DLT triangulation.

Replaces the reference's joblib-threaded per-(model, keypoint) aniposelib
calls (eks/multicam_smoother.py:888-911) with ONE vectorized kernel over all
points: build the (2C, 4) DLT system per point from undistorted normalized
coordinates and extrinsics, and take the smallest right singular vector.

NaN observations are masked by zeroing their rows (a zero row contributes
nothing to AᵀA, which is exactly exclusion); points with fewer than 2 valid
views return NaN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eks_tpu.ops.linalg import highest_precision

__all__ = ["triangulate_dlt"]


@jax.jit
@highest_precision
def triangulate_dlt(
    points: jnp.ndarray,  # (C, N, 2) undistorted normalized coords
    extrinsics: jnp.ndarray,  # (C, 3, 4) [R | t]
) -> jnp.ndarray:
    """DLT: (C, N, 2) -> (N, 3), NaN-masked, fully batched over N."""
    C, N, _ = points.shape

    x = points[..., 0]  # (C, N)
    y = points[..., 1]
    valid = jnp.isfinite(x) & jnp.isfinite(y)  # (C, N)
    xs = jnp.where(valid, x, 0.0)
    ys = jnp.where(valid, y, 0.0)

    # rows: x * P[2] - P[0] and y * P[2] - P[1], per camera per point
    P0 = extrinsics[:, 0, :]  # (C, 4)
    P1 = extrinsics[:, 1, :]
    P2 = extrinsics[:, 2, :]
    rows_x = xs[..., None] * P2[:, None, :] - P0[:, None, :]  # (C, N, 4)
    rows_y = ys[..., None] * P2[:, None, :] - P1[:, None, :]
    w = valid[..., None].astype(points.dtype)
    A = jnp.concatenate([rows_x * w, rows_y * w], axis=0)  # (2C, N, 4)
    A = jnp.moveaxis(A, 0, 1)  # (N, 2C, 4)

    # smallest right singular vector per point
    _, _, vh = jnp.linalg.svd(A, full_matrices=False)
    p = vh[:, -1, :]  # (N, 4)
    xyz = p[:, :3] / p[:, 3:4]

    enough = jnp.sum(valid, axis=0) >= 2  # (N,)
    return jnp.where(enough[:, None], xyz, jnp.nan)
