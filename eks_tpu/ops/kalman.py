"""Sequential Kalman/extended-Kalman filter and RTS smoother (``lax.scan``).

This is the reference-semantics path: it reproduces the update ordering of the
backend the reference delegates to (dynamax ``extended_kalman_filter`` /
``extended_kalman_smoother``, invoked at eks/core.py:290-291,469,648):

  * the carry holds the one-step-ahead *predictive* distribution, initialised
    with the prior ``(m0, S0)`` — i.e. ``y_0`` is assimilated against the
    prior directly, with no transition before the first update;
  * per-step marginal log-likelihood is accumulated at the predictive stage;
  * the covariance update is the plain (non-Joseph) form ``P - K S Kᵀ`` with a
    Cholesky PSD solve for the gain;
  * the backward (RTS) pass re-derives the one-step prediction from the
    filtered moments.

Observation noise is carried as per-step *diagonal variances* ``r`` of shape
(T, O) or (O,) — the reference only ever builds diagonal R (eks/utils.py:368).
Nonlinear emission functions are supported via ``h_fn`` with ``jacfwd``
linearization (used by the calibrated multicam path).

Everything here is jit/vmap friendly; batching over keypoints/blocks happens
at the caller via ``vmap``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from eks_tpu.ops.linalg import highest_precision, mvn_logpdf, psd_solve

__all__ = ["FilterResult", "SmootherResult", "kalman_filter", "kalman_smoother"]


class FilterResult(NamedTuple):
    log_likelihood: jnp.ndarray  # scalar
    filtered_means: jnp.ndarray  # (T, D)
    filtered_covs: jnp.ndarray  # (T, D, D)


class SmootherResult(NamedTuple):
    log_likelihood: jnp.ndarray
    filtered_means: jnp.ndarray
    filtered_covs: jnp.ndarray
    smoothed_means: jnp.ndarray  # (T, D)
    smoothed_covs: jnp.ndarray  # (T, D, D)


def _as_time_varying(r: jnp.ndarray, T: int) -> jnp.ndarray:
    r = jnp.asarray(r)
    if r.ndim == 1:
        r = jnp.broadcast_to(r, (T, r.shape[0]))
    return r


@highest_precision
def kalman_filter(
    ys: jnp.ndarray,  # (T, O)
    m0: jnp.ndarray,  # (D,)
    S0: jnp.ndarray,  # (D, D)
    A: jnp.ndarray,  # (D, D)
    Q: jnp.ndarray,  # (D, D)
    C: Optional[jnp.ndarray] = None,  # (O, D) linear emission
    r_diag: jnp.ndarray = None,  # (T, O) or (O,) observation variances
    h_fn: Optional[Callable] = None,  # nonlinear emission x->(O,)
) -> FilterResult:
    """Forward (extended) Kalman filter with per-step NLL accumulation."""
    T = ys.shape[0]
    r = _as_time_varying(r_diag, T)

    if h_fn is None:
        h = lambda x: C @ x
        jac_h = lambda x: C
    else:
        h = h_fn
        jac_h = jax.jacfwd(h_fn)

    def step(carry, inputs):
        ll, m_pred, P_pred = carry
        y_t, r_t = inputs
        R_t = jnp.diag(r_t)
        H = jac_h(m_pred)
        S = H @ P_pred @ H.T + R_t
        ll = ll + mvn_logpdf(y_t, h(m_pred), S)
        # update
        K = psd_solve(S, H @ P_pred).T
        m_filt = m_pred + K @ (y_t - h(m_pred))
        P_filt = P_pred - K @ S @ K.T
        # predict
        m_next = A @ m_filt
        P_next = A @ P_filt @ A.T + Q
        return (ll, m_next, P_next), (m_filt, P_filt)

    init = (jnp.zeros((), dtype=ys.dtype), m0, S0)
    (ll, _, _), (ms, Ps) = lax.scan(step, init, (ys, r))
    return FilterResult(ll, ms, Ps)


@highest_precision
def kalman_smoother(
    ys: jnp.ndarray,
    m0: jnp.ndarray,
    S0: jnp.ndarray,
    A: jnp.ndarray,
    Q: jnp.ndarray,
    C: Optional[jnp.ndarray] = None,
    r_diag: jnp.ndarray = None,
    h_fn: Optional[Callable] = None,
) -> SmootherResult:
    """Forward filter + backward RTS smoothing pass."""
    fr = kalman_filter(ys, m0, S0, A, Q, C=C, r_diag=r_diag, h_fn=h_fn)
    ms, Ps = fr.filtered_means, fr.filtered_covs

    def back_step(carry, inputs):
        m_next_s, P_next_s = carry
        m_f, P_f = inputs
        m_pred = A @ m_f
        P_pred = Q + A @ P_f @ A.T
        G = psd_solve(P_pred, A @ P_f).T
        m_s = m_f + G @ (m_next_s - m_pred)
        P_s = P_f + G @ (P_next_s - P_pred) @ G.T
        return (m_s, P_s), (m_s, P_s)

    last = (ms[-1], Ps[-1])
    _, (sm_rest, sP_rest) = lax.scan(
        back_step, last, (ms[:-1], Ps[:-1]), reverse=True
    )
    sm = jnp.concatenate([sm_rest, ms[-1:][...]], axis=0)
    sP = jnp.concatenate([sP_rest, Ps[-1:][...]], axis=0)
    return SmootherResult(fr.log_likelihood, ms, Ps, sm, sP)
