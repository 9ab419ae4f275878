"""Parallel-prefix (associative-scan) Kalman filter and RTS smoother.

The reference processes the time axis with a strictly sequential O(T) scan
(dynamax EKF invoked at eks/core.py:290-291,469). On TPU that serializes the
hot loop; here the linear-Gaussian filter and smoother are reformulated as
associative operators (Särkkä & García-Fernández, *Temporal Parallelization of
Bayesian Smoothers*, IEEE TAC 2021) and evaluated with
``lax.associative_scan`` in O(log T) depth. This is the direct analogue of
sequence/context parallelism for this workload and the headline algorithmic
change of the TPU rebuild (SURVEY.md §2.3, §5).

Filtering element per step t: an affine-Gaussian conditional map
``(m, P) -> posterior after predict+update`` parameterised as
``(A_t, b_t, C_t, eta_t, J_t)``; prefix-combining elements 0..t yields the
filtered moments ``m_{t|t} = b_{0:t}``, ``P_{t|t} = C_{0:t}``. The per-step
marginal log-likelihoods are then a batched elementwise pass over the
(shifted) filtered moments, so total NLL matches the sequential filter.

Smoothing element per step t: the backward affine map ``(E_t, g_t, L_t)``
with suffix combination — a reverse associative scan.

Only linear emissions are supported here (all reference model families except
the calibrated multicam path are linear); the extended filter falls back to
``ops.kalman``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, vmap

from eks_tpu.ops.kalman import FilterResult, SmootherResult, _as_time_varying
from eks_tpu.ops.linalg import highest_precision, mvn_logpdf, psd_solve, small_inv

__all__ = ["kalman_filter_parallel", "kalman_smoother_parallel"]


class _FilterElement(NamedTuple):
    A: jnp.ndarray  # (T, D, D)
    b: jnp.ndarray  # (T, D)
    C: jnp.ndarray  # (T, D, D)
    eta: jnp.ndarray  # (T, D)
    J: jnp.ndarray  # (T, D, D)


def _combine_filter(e1: _FilterElement, e2: _FilterElement) -> _FilterElement:
    """Associative combination of filtering elements; e1 precedes e2 in time."""
    dim = e1.A.shape[-1]
    eye = jnp.eye(dim, dtype=e1.A.dtype)

    def one(a1, b1, c1, n1, j1, a2, b2, c2, n2, j2):
        Z = small_inv(eye + c1 @ j2)
        Zt = jnp.swapaxes(Z, -1, -2)  # = inv(I + j2 @ c1) for symmetric c1, j2
        A = a2 @ Z @ a1
        b = a2 @ Z @ (b1 + c1 @ n2) + b2
        C = a2 @ Z @ c1 @ a2.T + c2
        eta = a1.T @ Zt @ (n2 - j2 @ b1) + n1
        J = a1.T @ Zt @ j2 @ a1 + j1
        return A, b, C, eta, J

    A, b, C, eta, J = vmap(one)(
        e1.A, e1.b, e1.C, e1.eta, e1.J, e2.A, e2.b, e2.C, e2.eta, e2.J
    )
    return _FilterElement(A, b, C, eta, J)


def _make_filter_elements(ys, m0, S0, A, Q, C, r) -> _FilterElement:
    """Build per-step filtering elements (vectorized over T)."""
    T, obs = ys.shape
    dim = m0.shape[0]
    eye = jnp.eye(dim, dtype=ys.dtype)

    # generic element for t >= 1: predict with (A, Q), update with (C, r_t, y_t)
    CQ = C @ Q  # (O, D)
    CA = C @ A  # (O, D)

    def generic(y_t, r_t):
        S = CQ @ C.T + jnp.diag(r_t)  # (O, O)
        K = psd_solve(S, CQ).T  # (D, O) = Q Cᵀ S⁻¹
        IKC = eye - K @ C
        A_el = IKC @ A
        b_el = K @ y_t
        C_el = IKC @ Q
        eta_el = CA.T @ psd_solve(S, y_t)
        J_el = CA.T @ psd_solve(S, CA)
        return A_el, b_el, C_el, eta_el, J_el

    A_all, b_all, C_all, eta_all, J_all = vmap(generic)(ys, r)

    # first element: update the prior (m0, S0) with y_0, no transition
    S_0 = C @ S0 @ C.T + jnp.diag(r[0])
    K_0 = psd_solve(S_0, C @ S0).T
    A_first = jnp.zeros((dim, dim), dtype=ys.dtype)
    b_first = m0 + K_0 @ (ys[0] - C @ m0)
    C_first = (eye - K_0 @ C) @ S0
    zeros_d = jnp.zeros((dim,), dtype=ys.dtype)
    zeros_dd = jnp.zeros((dim, dim), dtype=ys.dtype)

    A_all = A_all.at[0].set(A_first)
    b_all = b_all.at[0].set(b_first)
    C_all = C_all.at[0].set(C_first)
    eta_all = eta_all.at[0].set(zeros_d)
    J_all = J_all.at[0].set(zeros_dd)
    return _FilterElement(A_all, b_all, C_all, eta_all, J_all)


@highest_precision
def kalman_filter_parallel(
    ys: jnp.ndarray,  # (T, O)
    m0: jnp.ndarray,
    S0: jnp.ndarray,
    A: jnp.ndarray,
    Q: jnp.ndarray,
    C: jnp.ndarray,
    r_diag: jnp.ndarray,  # (T, O) or (O,)
) -> FilterResult:
    """O(log T)-depth linear Kalman filter with exact per-step NLL."""
    T = ys.shape[0]
    r = _as_time_varying(r_diag, T)

    elems = _make_filter_elements(ys, m0, S0, A, Q, C, r)
    prefix = lax.associative_scan(_combine_filter, elems)
    ms = prefix.b  # (T, D)
    Ps = prefix.C  # (T, D, D)

    # predictive moments: t=0 uses the prior, t>=1 predicts from t-1 filtered
    m_prev = jnp.concatenate([m0[None], ms[:-1]], axis=0)
    P_prev = jnp.concatenate([S0[None], Ps[:-1]], axis=0)
    pred_m = m_prev.at[1:].set(m_prev[1:] @ A.T)
    pred_P = P_prev.at[1:].set(
        jnp.einsum("ij,tjk,lk->til", A, P_prev[1:], A) + Q
    )

    def step_ll(y_t, r_t, mp, Pp):
        S = C @ Pp @ C.T + jnp.diag(r_t)
        return mvn_logpdf(y_t, C @ mp, S)

    ll = jnp.sum(vmap(step_ll)(ys, r, pred_m, pred_P))
    return FilterResult(ll, ms, Ps)


class _SmootherElement(NamedTuple):
    E: jnp.ndarray  # (T, D, D)
    g: jnp.ndarray  # (T, D)
    L: jnp.ndarray  # (T, D, D)


def _combine_smoother(later: _SmootherElement, earlier: _SmootherElement) -> _SmootherElement:
    """Associative combination of smoothing elements.

    Used under ``lax.associative_scan(..., reverse=True)``, which flips the
    sequence before scanning — so the FIRST argument is the element later in
    time. The composition applies the earlier element's affine map to the
    later suffix: ``x -> E_e x + g_e``.
    """

    def one(El, gl, Ll, Ee, ge, Le):
        return Ee @ El, Ee @ gl + ge, Ee @ Ll @ Ee.T + Le

    E, g, L = vmap(one)(
        later.E, later.g, later.L, earlier.E, earlier.g, earlier.L
    )
    return _SmootherElement(E, g, L)


@highest_precision
def kalman_smoother_parallel(
    ys: jnp.ndarray,
    m0: jnp.ndarray,
    S0: jnp.ndarray,
    A: jnp.ndarray,
    Q: jnp.ndarray,
    C: jnp.ndarray,
    r_diag: jnp.ndarray,
) -> SmootherResult:
    """O(log T)-depth linear RTS smoother (filter + reverse associative scan)."""
    fr = kalman_filter_parallel(ys, m0, S0, A, Q, C, r_diag)
    ms, Ps = fr.filtered_means, fr.filtered_covs
    T, dim = ms.shape

    def make_elem(m_f, P_f):
        P_pred = A @ P_f @ A.T + Q
        E = psd_solve(P_pred, A @ P_f).T  # (D, D) gain G_t
        g = m_f - E @ (A @ m_f)
        L = P_f - E @ P_pred @ E.T
        return E, g, L

    E_all, g_all, L_all = vmap(make_elem)(ms, Ps)
    # final element carries the filtered terminal moments
    E_all = E_all.at[-1].set(jnp.zeros((dim, dim), dtype=ms.dtype))
    g_all = g_all.at[-1].set(ms[-1])
    L_all = L_all.at[-1].set(Ps[-1])

    suffix = lax.associative_scan(
        _combine_smoother, _SmootherElement(E_all, g_all, L_all), reverse=True
    )
    return SmootherResult(fr.log_likelihood, ms, Ps, suffix.g, suffix.L)
