"""The dependency shims under tests/shims must be faithful before the true-
reference parity suite can mean anything: the shim EKF/RTS is cross-checked
here against this package's own sequential oracle (ops/kalman.py, which pins
dynamax's conventions) on random small systems, and the aniposelib shim
surface against the reference's call sites."""

import os
import sys

import numpy as np
import pytest

SHIMS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tests", "shims")


@pytest.fixture(scope="module")
def shim():
    if SHIMS not in sys.path:
        sys.path.insert(0, SHIMS)
    import dynamax.nonlinear_gaussian_ssm as m

    return m


def _random_system(rng, T=40, D=3, O=4, time_varying_R=False):
    A = np.eye(D) * 0.9 + rng.normal(size=(D, D)) * 0.02
    C = rng.normal(size=(O, D))
    Q = np.eye(D) * 0.1
    m0 = rng.normal(size=D)
    S0 = np.eye(D) * 0.5
    ys = rng.normal(size=(T, O)).astype(np.float64)
    r = np.abs(rng.normal(size=(T, O))) * 0.3 + 0.1
    if time_varying_R:
        R = np.stack([np.diag(row) for row in r])
    else:
        r = np.broadcast_to(r[0], (T, O)).copy()
        R = np.diag(r[0])
    return ys, m0, S0, A, Q, C, r, R


@pytest.mark.parametrize("tv", [False, True])
def test_shim_filter_matches_oracle(shim, tv):
    import jax.numpy as jnp

    from eks_tpu.ops.kalman import kalman_filter

    rng = np.random.default_rng(0)
    ys, m0, S0, A, Q, C, r, R = _random_system(rng, time_varying_R=tv)

    params = shim.ParamsNLGSSM(
        initial_mean=jnp.asarray(m0), initial_covariance=jnp.asarray(S0),
        dynamics_function=lambda x: jnp.asarray(A) @ x,
        dynamics_covariance=jnp.asarray(Q),
        emission_function=lambda x: jnp.asarray(C) @ x,
        emission_covariance=jnp.asarray(R),
    )
    post = shim.extended_kalman_filter(params, jnp.asarray(ys))
    oracle = kalman_filter(
        jnp.asarray(ys), jnp.asarray(m0), jnp.asarray(S0), jnp.asarray(A),
        jnp.asarray(Q), C=jnp.asarray(C), r_diag=jnp.asarray(r),
    )
    np.testing.assert_allclose(
        float(post.marginal_loglik), float(oracle.log_likelihood), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(post.filtered_means), np.asarray(oracle.filtered_means),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(post.filtered_covariances), np.asarray(oracle.filtered_covs),
        atol=1e-5,
    )


@pytest.mark.parametrize("tv", [False, True])
def test_shim_smoother_matches_oracle(shim, tv):
    import jax.numpy as jnp

    from eks_tpu.ops.kalman import kalman_smoother

    rng = np.random.default_rng(1)
    ys, m0, S0, A, Q, C, r, R = _random_system(rng, time_varying_R=tv)

    params = shim.ParamsNLGSSM(
        initial_mean=jnp.asarray(m0), initial_covariance=jnp.asarray(S0),
        dynamics_function=lambda x: jnp.asarray(A) @ x,
        dynamics_covariance=jnp.asarray(Q),
        emission_function=lambda x: jnp.asarray(C) @ x,
        emission_covariance=jnp.asarray(R),
    )
    sm = shim.extended_kalman_smoother(params, jnp.asarray(ys))
    oracle = kalman_smoother(
        jnp.asarray(ys), jnp.asarray(m0), jnp.asarray(S0), jnp.asarray(A),
        jnp.asarray(Q), C=jnp.asarray(C), r_diag=jnp.asarray(r),
    )
    np.testing.assert_allclose(
        np.asarray(sm.smoothed_means), np.asarray(oracle.smoothed_means),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sm.smoothed_covariances), np.asarray(oracle.smoothed_covs),
        atol=1e-5,
    )


def test_shim_nonlinear_emission_relinearizes(shim):
    """EKF with a nonlinear h must match the oracle's jacfwd-EKF path."""
    import jax.numpy as jnp

    from eks_tpu.ops.kalman import kalman_filter

    rng = np.random.default_rng(2)
    D, O, T = 3, 4, 30
    A = np.eye(D) * 0.95
    Q = np.eye(D) * 0.05
    m0 = rng.normal(size=D) * 0.1
    S0 = np.eye(D) * 0.2
    W = rng.normal(size=(O, D))

    def h(x):
        return jnp.tanh(jnp.asarray(W) @ x)

    ys = rng.normal(size=(T, O)) * 0.5
    r = np.abs(rng.normal(size=(T, O))) * 0.2 + 0.05
    R = np.stack([np.diag(row) for row in r])

    params = shim.ParamsNLGSSM(
        initial_mean=jnp.asarray(m0), initial_covariance=jnp.asarray(S0),
        dynamics_function=lambda x: jnp.asarray(A) @ x,
        dynamics_covariance=jnp.asarray(Q),
        emission_function=h, emission_covariance=jnp.asarray(R),
    )
    post = shim.extended_kalman_filter(params, jnp.asarray(ys))
    oracle = kalman_filter(
        jnp.asarray(ys), jnp.asarray(m0), jnp.asarray(S0), jnp.asarray(A),
        jnp.asarray(Q), r_diag=jnp.asarray(r), h_fn=h,
    )
    np.testing.assert_allclose(
        float(post.marginal_loglik), float(oracle.log_likelihood), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(post.filtered_means), np.asarray(oracle.filtered_means),
        atol=1e-5,
    )


def test_aniposelib_shim_surface():
    """The reference touches exactly this surface
    (eks/multicam_smoother.py:233-239,868-873,902)."""
    if SHIMS not in sys.path:
        sys.path.insert(0, SHIMS)
    from aniposelib.cameras import CameraGroup

    assert hasattr(CameraGroup, "load")
    assert hasattr(CameraGroup, "triangulate")
