"""First-party stand-in for ``dynamax.nonlinear_gaussian_ssm``.

Implements the three names the reference uses (``ParamsNLGSSM``,
``extended_kalman_filter``, ``extended_kalman_smoother``) with dynamax's
EKF/RTS conventions:

  * the scan carry holds the one-step-ahead *predictive* distribution,
    initialised at the prior ``(initial_mean, initial_covariance)`` — the
    first observation is assimilated against the prior, no transition first;
  * the marginal log-likelihood is accumulated at the predictive stage:
    ``ll += log N(y_t; h(m_pred), H P_pred Hᵀ + R_t)``;
  * gains come from dynamax's ``psd_solve`` semantics — symmetrize plus an
    ABSOLUTE 1e-9 diagonal boost before the Cholesky solve
    (dynamax.utils.utils.psd_solve) — while the log-likelihood term uses a
    plain no-jitter Cholesky (dynamax computes it via
    tfd.MultivariateNormalFullCovariance). The boost is material on the
    calibrated family's tiny 3-D world units: omitting it shifted the fly
    goldens ~1e-3 px (round-5 review finding). The covariance update is
    the plain (non-Joseph) form ``P_pred − K S Kᵀ``;
  * dynamics/emission functions are relinearised per step with ``jacfwd``
    (dynamics at the filtered mean, emission at the predicted mean);
  * ``emission_covariance`` may be constant ``(O, O)`` or time-varying
    ``(T, O, O)`` (the reference passes both:
    /root/reference/eks/core.py:229,419).

This is a self-contained ``lax.scan`` implementation, deliberately
independent of ``eks_tpu``'s production kernels, so parity between the
reference-run-through-shims and this package compares two separately
implemented numerical paths.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.scipy.linalg import cho_factor, cho_solve

__all__ = [
    "ParamsNLGSSM",
    "PosteriorGSSMFiltered",
    "PosteriorGSSMSmoothed",
    "extended_kalman_filter",
    "extended_kalman_smoother",
]

_LOG2PI = float(np.log(2.0 * np.pi))


class ParamsNLGSSM(NamedTuple):
    initial_mean: jnp.ndarray
    initial_covariance: jnp.ndarray
    dynamics_function: Callable
    dynamics_covariance: jnp.ndarray
    emission_function: Callable
    emission_covariance: jnp.ndarray


class PosteriorGSSMFiltered(NamedTuple):
    marginal_loglik: jnp.ndarray
    filtered_means: jnp.ndarray
    filtered_covariances: jnp.ndarray


class PosteriorGSSMSmoothed(NamedTuple):
    marginal_loglik: jnp.ndarray
    filtered_means: jnp.ndarray
    filtered_covariances: jnp.ndarray
    smoothed_means: jnp.ndarray
    smoothed_covariances: jnp.ndarray


def _call1(fn: Callable, x: jnp.ndarray) -> jnp.ndarray:
    """The reference passes ``f(x)``, ``f(x, A=A)`` and ``h(x, t=None,
    u=None)`` style callables; all accept a single positional argument."""
    return fn(x)


def _psd_solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """dynamax.utils.utils.psd_solve semantics: symmetrize and add an
    absolute 1e-9 diagonal boost before the Cholesky solve. Used for the
    Kalman and RTS GAIN solves only — the log-likelihood Cholesky stays
    un-jittered (tfd.MultivariateNormalFullCovariance semantics)."""
    a = 0.5 * (a + a.T) + 1e-9 * jnp.eye(a.shape[-1], dtype=a.dtype)
    return cho_solve(cho_factor(a, lower=True), b)


def _filter_scan(params: ParamsNLGSSM, emissions: jnp.ndarray):
    f = params.dynamics_function
    h = params.emission_function
    Q = jnp.asarray(params.dynamics_covariance)
    R = jnp.asarray(params.emission_covariance)
    jac_f = jax.jacfwd(lambda x: _call1(f, x))
    jac_h = jax.jacfwd(lambda x: _call1(h, x))
    time_varying_R = R.ndim == 3

    def step(carry, inp):
        ll, m_pred, P_pred = carry
        if time_varying_R:
            y_t, R_t = inp
        else:
            y_t, R_t = inp, R
        H = jac_h(m_pred)
        y_pred = _call1(h, m_pred)
        S = H @ P_pred @ H.T + R_t
        cf = cho_factor(S, lower=True)
        innov = y_t - y_pred
        logdet = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(cf[0]))))
        ll_t = -0.5 * (innov @ cho_solve(cf, innov) + logdet
                       + y_t.shape[-1] * _LOG2PI)
        K = _psd_solve(S, H @ P_pred).T
        m_filt = m_pred + K @ innov
        P_filt = P_pred - K @ S @ K.T
        F = jac_f(m_filt)
        m_next = _call1(f, m_filt)
        P_next = F @ P_filt @ F.T + Q
        return (ll + ll_t, m_next, P_next), (m_filt, P_filt)

    init = (
        jnp.zeros((), dtype=emissions.dtype),
        jnp.asarray(params.initial_mean),
        jnp.asarray(params.initial_covariance),
    )
    xs = (emissions, R) if time_varying_R else emissions
    (ll, _, _), (ms, Ps) = lax.scan(step, init, xs)
    return ll, ms, Ps


def extended_kalman_filter(
    params: ParamsNLGSSM,
    emissions: jnp.ndarray,
    inputs: Optional[jnp.ndarray] = None,
) -> PosteriorGSSMFiltered:
    """Sequential EKF over ``emissions`` (T, O)."""
    del inputs  # the reference never passes inputs
    ll, ms, Ps = _filter_scan(params, jnp.asarray(emissions))
    return PosteriorGSSMFiltered(ll, ms, Ps)


def extended_kalman_smoother(
    params: ParamsNLGSSM,
    emissions: jnp.ndarray,
    inputs: Optional[jnp.ndarray] = None,
) -> PosteriorGSSMSmoothed:
    """EKF forward pass + extended RTS backward pass (dynamics relinearised
    at the filtered means)."""
    del inputs
    emissions = jnp.asarray(emissions)
    ll, fms, fPs = _filter_scan(params, emissions)
    f = params.dynamics_function
    Q = jnp.asarray(params.dynamics_covariance)
    jac_f = jax.jacfwd(lambda x: _call1(f, x))

    def back_step(carry, inp):
        m_next_s, P_next_s = carry
        m_f, P_f = inp
        F = jac_f(m_f)
        m_pred = _call1(f, m_f)
        P_pred = F @ P_f @ F.T + Q
        G = _psd_solve(P_pred, F @ P_f).T
        m_s = m_f + G @ (m_next_s - m_pred)
        P_s = P_f + G @ (P_next_s - P_pred) @ G.T
        return (m_s, P_s), (m_s, P_s)

    _, (sm_rest, sP_rest) = lax.scan(
        back_step, (fms[-1], fPs[-1]), (fms[:-1], fPs[:-1]), reverse=True
    )
    sms = jnp.concatenate([sm_rest, fms[-1:]], axis=0)
    sPs = jnp.concatenate([sP_rest, fPs[-1:]], axis=0)
    return PosteriorGSSMSmoothed(ll, fms, fPs, sms, sPs)
