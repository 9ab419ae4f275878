"""Small-matrix linalg: unrolled vs LAPACK equivalence, inverses."""

import numpy as np
import pytest

import jax.numpy as jnp

from eks_tpu.ops.linalg import (
    force_unrolled_small_linalg,
    mvn_logpdf,
    psd_solve,
    small_inv,
)


def _spd(rng, n, batch=()):
    a = rng.normal(size=(*batch, n, n))
    return a @ np.swapaxes(a, -1, -2) + n * np.eye(n)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8])
def test_psd_solve_unrolled_matches_lapack(rng, n):
    a = _spd(rng, n, batch=(7,))
    b_vec = rng.normal(size=(7, n))
    b_mat = rng.normal(size=(7, n, 4))
    with force_unrolled_small_linalg(True):
        x_vec_u = np.asarray(psd_solve(jnp.asarray(a), jnp.asarray(b_vec)))
        x_mat_u = np.asarray(psd_solve(jnp.asarray(a), jnp.asarray(b_mat)))
    with force_unrolled_small_linalg(False):
        x_vec_l = np.asarray(psd_solve(jnp.asarray(a), jnp.asarray(b_vec)))
        x_mat_l = np.asarray(psd_solve(jnp.asarray(a), jnp.asarray(b_mat)))
    np.testing.assert_allclose(x_vec_u, x_vec_l, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(x_mat_u, x_mat_l, rtol=2e-5, atol=1e-6)
    # correctness against numpy
    np.testing.assert_allclose(
        np.einsum("bij,bj->bi", a, x_vec_u), b_vec, rtol=1e-3, atol=1e-4
    )


@pytest.mark.parametrize("n", [2, 3, 6, 8])
def test_mvn_logpdf_unrolled_matches_lapack(rng, n):
    cov = _spd(rng, n, batch=(5,))
    y = rng.normal(size=(5, n))
    mean = rng.normal(size=(5, n))
    with force_unrolled_small_linalg(True):
        ll_u = np.asarray(mvn_logpdf(jnp.asarray(y), jnp.asarray(mean), jnp.asarray(cov)))
    with force_unrolled_small_linalg(False):
        ll_l = np.asarray(mvn_logpdf(jnp.asarray(y), jnp.asarray(mean), jnp.asarray(cov)))
    np.testing.assert_allclose(ll_u, ll_l, rtol=1e-5, atol=1e-5)
    # scipy ground truth
    from scipy.stats import multivariate_normal

    for i in range(5):
        ref = multivariate_normal.logpdf(y[i], mean=mean[i], cov=cov[i])
        np.testing.assert_allclose(ll_u[i], ref, rtol=1e-3)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_small_inv(rng, n):
    a = rng.normal(size=(6, n, n)) + 2 * np.eye(n)
    inv = np.asarray(small_inv(jnp.asarray(a)))
    np.testing.assert_allclose(inv, np.linalg.inv(a), rtol=1e-4, atol=1e-5)
