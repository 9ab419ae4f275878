"""Small-matrix linear algebra helpers shared by the Kalman kernels.

Conventions are chosen to reproduce the numerics the reference gets from its
state-space backend (dynamax, used at eks/core.py:11-15): Cholesky-based PSD
solves with a 1e-9 diagonal boost and symmetrization, and Cholesky-based
Gaussian log-densities without jitter.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve, solve_triangular

__all__ = [
    "symmetrize",
    "psd_solve",
    "small_inv",
    "mvn_logpdf",
    "highest_precision",
    "force_unrolled_small_linalg",
]


def highest_precision(fn):
    """Trace ``fn`` with float32-exact matmul precision.

    On TPU, f32 matmuls default to fast bfloat16 passes; the Kalman recursions
    use tiny (2x2..8x3) matrices where MXU throughput is irrelevant but
    covariance roundoff compounds over thousands of steps, so we pin the
    highest precision for everything in the state-space core.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped

_LOG_2PI = math.log(2.0 * math.pi)


def symmetrize(a: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


# Above this dimension, fall back to LAPACK-style batched kernels; at or below
# it, unroll the Cholesky/solves at trace time. TPU's blocked linalg kernels
# are pathological on 2x2..8x8 batches (measured ~20x of the whole pipeline),
# which is all this library ever uses — but on CPU the unrolled graphs cost
# far more XLA compile time than LAPACK calls, so unrolling is gated on the
# default backend. Tests exercise the unrolled path explicitly via
# `force_unrolled_small_linalg`.
_UNROLL_DIM = 8
_FORCE_UNROLL: bool | None = None  # None = auto (TPU only)


def _use_unrolled(dim: int) -> bool:
    if dim > _UNROLL_DIM:
        return False
    if _FORCE_UNROLL is not None:
        return _FORCE_UNROLL
    return jax.default_backend() == "tpu"


class force_unrolled_small_linalg:
    """Context manager pinning the small-dim linalg implementation choice
    (True = unrolled, False = LAPACK) regardless of backend."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled

    def __enter__(self):
        global _FORCE_UNROLL
        self._prev = _FORCE_UNROLL
        _FORCE_UNROLL = self.enabled
        return self

    def __exit__(self, *exc):
        global _FORCE_UNROLL
        _FORCE_UNROLL = self._prev
        return False


def _chol_unrolled(a: jnp.ndarray) -> list[list]:
    """Lower Cholesky factor of (..., O, O), unrolled over O at trace time.
    Returns a list-of-lists of (...,) planes (entries above diag omitted)."""
    o = a.shape[-1]
    L: list[list] = [[None] * o for _ in range(o)]
    for i in range(o):
        for j in range(i + 1):
            s = a[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol_solve_unrolled(L: list[list], b: jnp.ndarray, vector: bool) -> jnp.ndarray:
    """Solve (L Lᵀ) x = b given the unrolled factor; b is (..., O) if
    ``vector`` else (..., O, M)."""
    o = len(L)
    if vector:
        bs = [b[..., i] for i in range(o)]
    else:
        bs = [b[..., i, :] for i in range(o)]
        L = [[entry[..., None] for entry in row if entry is not None] for row in L]
    # forward substitution: L y = b
    y: list = [None] * o
    for i in range(o):
        s = bs[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution: Lᵀ x = y
    x: list = [None] * o
    for i in range(o - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, o):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1) if vector else jnp.stack(x, axis=-2)


def psd_solve(a: jnp.ndarray, b: jnp.ndarray, diagonal_boost: float = 1e-9) -> jnp.ndarray:
    """Solve ``a x = b`` for symmetric positive-definite ``a`` via Cholesky,
    with symmetrization and a small diagonal boost for robustness."""
    a = symmetrize(a) + diagonal_boost * jnp.eye(a.shape[-1], dtype=a.dtype)
    if _use_unrolled(a.shape[-1]):
        vector = b.ndim == a.ndim - 1
        return _chol_solve_unrolled(_chol_unrolled(a), b, vector)
    factors = cho_factor(a, lower=True)
    return cho_solve(factors, b)


def small_inv(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a small (..., D, D) matrix, D <= 3 in closed form.

    ``jnp.linalg.inv`` lowers to an LU decomposition, which the TPU compiler
    handles poorly (and rejects outright in f64); the Kalman state dimension is
    2 or 3 everywhere in this library, so adjugate formulas are both faster and
    more portable. Falls back to ``jnp.linalg.inv`` for larger D.
    """
    d = a.shape[-1]
    if d == 1:
        return 1.0 / a
    if d == 2:
        a00, a01 = a[..., 0, 0], a[..., 0, 1]
        a10, a11 = a[..., 1, 0], a[..., 1, 1]
        det = a00 * a11 - a01 * a10
        adj = jnp.stack(
            [
                jnp.stack([a11, -a01], axis=-1),
                jnp.stack([-a10, a00], axis=-1),
            ],
            axis=-2,
        )
        return adj / det[..., None, None]
    if d == 3:
        a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
        a10, a11, a12 = a[..., 1, 0], a[..., 1, 1], a[..., 1, 2]
        a20, a21, a22 = a[..., 2, 0], a[..., 2, 1], a[..., 2, 2]
        c00 = a11 * a22 - a12 * a21
        c01 = a12 * a20 - a10 * a22
        c02 = a10 * a21 - a11 * a20
        c10 = a02 * a21 - a01 * a22
        c11 = a00 * a22 - a02 * a20
        c12 = a01 * a20 - a00 * a21
        c20 = a01 * a12 - a02 * a11
        c21 = a02 * a10 - a00 * a12
        c22 = a00 * a11 - a01 * a10
        det = a00 * c00 + a01 * c01 + a02 * c02
        adj = jnp.stack(
            [
                jnp.stack([c00, c10, c20], axis=-1),
                jnp.stack([c01, c11, c21], axis=-1),
                jnp.stack([c02, c12, c22], axis=-1),
            ],
            axis=-2,
        )
        return adj / det[..., None, None]
    return jnp.linalg.inv(a)


def mvn_logpdf(y: jnp.ndarray, mean: jnp.ndarray, cov: jnp.ndarray) -> jnp.ndarray:
    """log N(y; mean, cov) via Cholesky (no jitter), matching
    tfd.MultivariateNormalFullCovariance.log_prob semantics."""
    n = y.shape[-1]
    d = y - mean
    if _use_unrolled(n):
        L = _chol_unrolled(cov)
        # forward substitution z = L^{-1} d, unrolled
        ds = [d[..., i] for i in range(n)]
        z: list = [None] * n
        logdet = 0.0
        for i in range(n):
            s = ds[i]
            for k in range(i):
                s = s - L[i][k] * z[k]
            z[i] = s / L[i][i]
            logdet = logdet + jnp.log(L[i][i])
        quad = sum(zi**2 for zi in z)
        return -0.5 * quad - logdet - 0.5 * n * _LOG_2PI
    chol = jnp.linalg.cholesky(cov)
    z = solve_triangular(chol, d, lower=True)
    return (
        -0.5 * jnp.sum(z**2, axis=-1)
        - jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
        - 0.5 * n * _LOG_2PI
    )
