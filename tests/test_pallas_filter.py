"""Pallas fused prefix-scan filter: parity with the XLA parallel filter."""

import numpy as np
import pytest

import jax.numpy as jnp

from eks_tpu.ops.kalman import kalman_filter
from eks_tpu.ops.pallas_filter import kalman_filter_pallas


def _problem(rng, T):
    A = 0.95 * np.eye(2)
    Q = 0.3 * np.eye(2)
    C = np.eye(2)
    m0 = rng.normal(size=2)
    S0 = np.diag(rng.uniform(0.5, 2.0, 2))
    r = rng.uniform(0.05, 2.0, size=(T, 2))
    ys = rng.normal(size=(T, 2)).cumsum(axis=0) * 0.1
    return [jnp.asarray(a, dtype=jnp.float32) for a in (ys, m0, S0, A, Q, C, r)]


@pytest.mark.parametrize("T", [128, 256, 1000, 4096])
def test_pallas_matches_sequential(rng, T):
    ys, m0, S0, A, Q, C, r = _problem(rng, T)
    ref = kalman_filter(ys, m0, S0, A, Q, C=C, r_diag=r)
    out = kalman_filter_pallas(ys, m0, S0, A, Q, C, r, interpret=True)
    np.testing.assert_allclose(
        float(out.log_likelihood), float(ref.log_likelihood), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.filtered_means), np.asarray(ref.filtered_means), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.filtered_covs), np.asarray(ref.filtered_covs), atol=2e-3
    )


def test_pallas_handles_unaligned_T(rng):
    # T not a multiple of 128: identity-element padding must be neutral
    ys, m0, S0, A, Q, C, r = _problem(rng, 300)
    ref = kalman_filter(ys, m0, S0, A, Q, C=C, r_diag=r)
    out = kalman_filter_pallas(ys, m0, S0, A, Q, C, r, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.filtered_means), np.asarray(ref.filtered_means), atol=2e-3
    )
    np.testing.assert_allclose(
        float(out.log_likelihood), float(ref.log_likelihood), rtol=2e-4
    )
