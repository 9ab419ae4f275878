"""Batched DLT triangulation.

Replaces the reference's joblib-threaded per-(model, keypoint) aniposelib
calls (eks/multicam_smoother.py:888-911) with ONE vectorized kernel over all
points: build the (2C, 4) DLT system per point from undistorted normalized
coordinates and extrinsics, and take its null direction.

The null direction is found on the 4x4 normal matrix G = AᵀA by shifted
inverse iteration with an unrolled Cholesky factorization — every step is a
plain vectorized scalar op. A batched SVD/QR over millions of (2C, 4) systems
lowers to an XLA custom call that is both slow on TPU and VMEM-bounded
(observed: scoped-vmem OOM at 250k points); the normal-matrix route has no
custom call at all. Components orthogonal to the null direction are damped by
~(eps/λ_i) per iteration (eps = 1e-6 · mean diag), so a handful of iterations
reaches working precision.

NaN observations are masked by zeroing their rows (a zero row contributes
nothing to AᵀA, which is exactly exclusion); points with fewer than 2 valid
views return NaN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eks_tpu.ops.linalg import _chol_solve_unrolled, _chol_unrolled, highest_precision

__all__ = ["triangulate_dlt"]

_INV_ITERS = 8


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

    # normal matrix + scale-invariant shift (absolute floor keeps all-zero
    # systems factorizable; their output is masked to NaN below anyway)
    G = jnp.einsum("nri,nrj->nij", A, A)  # (N, 4, 4), PSD
    tr = jnp.trace(G, axis1=-2, axis2=-1)
    eps = 1e-6 * tr / 4.0 + 1e-12
    Gs = G + eps[:, None, None] * jnp.eye(4, dtype=G.dtype)

    # shifted inverse iteration from e4 (finite points have nonzero
    # homogeneous w, so the start is never orthogonal to the null direction)
    L = _chol_unrolled(Gs)
    v = jnp.zeros((N, 4), dtype=G.dtype).at[:, 3].set(1.0)
    for _ in range(_INV_ITERS):
        v = _chol_solve_unrolled(L, v, vector=True)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    xyz = v[:, :3] / v[:, 3:4]

    enough = jnp.sum(valid, axis=0) >= 2  # (N,)
    return jnp.where(enough[:, None], xyz, jnp.nan)
