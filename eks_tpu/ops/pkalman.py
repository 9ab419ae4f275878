"""Parallel-prefix (associative-scan) Kalman filter and RTS smoother.

The reference processes the time axis with a strictly sequential O(T) scan
(dynamax EKF invoked at eks/core.py:290-291,469). On TPU that serializes the
hot loop; here the linear-Gaussian filter and smoother are reformulated as
associative operators (Särkkä & García-Fernández, *Temporal Parallelization of
Bayesian Smoothers*, IEEE TAC 2021) and evaluated with
``lax.associative_scan`` in O(log T) depth. This is the direct analogue of
sequence/context parallelism for this workload and the headline algorithmic
change of the TPU rebuild (SURVEY.md §2.3, §5).

Layout: the scan elements are carried as a **structure of scalar planes** —
one (T,)-shaped array per matrix entry — rather than (T, D, D) tensors. The
state dimension is 2 or 3, so an AoS layout puts the matrices in the TPU's
tiled minor dimensions at a few-percent lane utilization; with scalar planes
every combine is pure elementwise VPU work over the time axis and the D x D
algebra unrolls at trace time (closed-form inverses, no LU).

Filtering element per step t: an affine-Gaussian conditional map
``(m, P) -> posterior after predict+update`` parameterised as
``(A_t, b_t, C_t, eta_t, J_t)``; prefix-combining elements 0..t yields the
filtered moments ``m_{t|t} = b_{0:t}``, ``P_{t|t} = C_{0:t}``. The per-step
marginal log-likelihoods are then a batched elementwise pass over the
(shifted) filtered moments, so total NLL matches the sequential filter.
Smoothing element per step t: the backward affine map ``(E_t, g_t, L_t)``
with suffix combination — a reverse associative scan.

Nonlinear emissions are handled by :func:`ekf_parallel` /
:func:`eks_parallel`: a fixed-point iteration that relinearizes the emission
at the current predicted-mean trajectory and replays the linear parallel
sweep — the fixed point of that iteration IS the sequential extended Kalman
filter (same gains, same innovations), so parity with ``ops.kalman``'s
``h_fn`` path holds at convergence while every sweep stays O(log T) deep.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, vmap

from eks_tpu.ops.kalman import FilterResult, SmootherResult, _as_time_varying
from eks_tpu.ops.linalg import highest_precision, mvn_logpdf, psd_solve, small_inv

__all__ = [
    "kalman_filter_parallel",
    "kalman_smoother_parallel",
    "filter_nll_parallel_planes",
    "filter_nll_parallel_planes_batched",
    "filter_nll_parallel_planes_tv",
    "ekf_nll_parallel_planes_batched",
    "ekf_parallel",
    "eks_parallel",
    "force_soa_scan",
]

# The scalar-plane (SoA) layout wins big on TPU but loses on CPU, where XLA
# vectorizes small (T, D, D) tensor batches well and the unrolled scalar
# graphs thrash a single core. Auto: SoA on TPU, AoS elsewhere.
_FORCE_SOA: bool | None = None


def _use_soa() -> bool:
    if _FORCE_SOA is not None:
        return _FORCE_SOA
    return jax.default_backend() == "tpu"


class force_soa_scan:
    """Context manager pinning the scan-element layout (True = scalar planes,
    False = (T, D, D) tensors) regardless of backend."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled

    def __enter__(self):
        global _FORCE_SOA
        self._prev = _FORCE_SOA
        _FORCE_SOA = self.enabled
        return self

    def __exit__(self, *exc):
        global _FORCE_SOA
        _FORCE_SOA = self._prev
        return False


# --------------------------------------------------------------------------- #
# scalar-plane matrix algebra (unrolled at trace time; leaves are (T,) arrays)
# --------------------------------------------------------------------------- #
def _to_planes(M):
    """(T, D1, D2) -> tuple-of-tuples of (T,) planes."""
    d1, d2 = M.shape[-2], M.shape[-1]
    return tuple(tuple(M[..., i, j] for j in range(d2)) for i in range(d1))


def _vec_to_planes(v):
    return tuple(v[..., i] for i in range(v.shape[-1]))


def _planes_to_mat(p):
    return jnp.stack([jnp.stack(row, axis=-1) for row in p], axis=-2)


def _planes_to_vec(p):
    return jnp.stack(p, axis=-1)


def _pmatmul(a, b):
    rows, inner, cols = len(a), len(b), len(b[0])
    return tuple(
        tuple(sum(a[i][k] * b[k][j] for k in range(inner)) for j in range(cols))
        for i in range(rows)
    )


def _pmatvec(a, x):
    return tuple(sum(a[i][k] * x[k] for k in range(len(x))) for i in range(len(a)))


def _pt(a):
    return tuple(tuple(a[j][i] for j in range(len(a))) for i in range(len(a[0])))


def _padd(a, b):
    return tuple(
        tuple(a[i][j] + b[i][j] for j in range(len(a[0]))) for i in range(len(a))
    )


def _pvadd(x, y):
    return tuple(x[i] + y[i] for i in range(len(x)))


def _pvsub(x, y):
    return tuple(x[i] - y[i] for i in range(len(x)))


def _peye_plus(a):
    """I + a, elementwise planes."""
    return tuple(
        tuple(a[i][j] + (1.0 if i == j else 0.0) for j in range(len(a[0])))
        for i in range(len(a))
    )


def _pinv(a):
    """Closed-form inverse of a D<=3 plane matrix (adjugate / det)."""
    d = len(a)
    if d == 1:
        return ((1.0 / a[0][0],),)
    if d == 2:
        (a00, a01), (a10, a11) = a
        det = a00 * a11 - a01 * a10
        inv = 1.0 / det
        return ((a11 * inv, -a01 * inv), (-a10 * inv, a00 * inv))
    if d == 3:
        (a00, a01, a02), (a10, a11, a12), (a20, a21, a22) = a
        c00 = a11 * a22 - a12 * a21
        c01 = a12 * a20 - a10 * a22
        c02 = a10 * a21 - a11 * a20
        det = a00 * c00 + a01 * c01 + a02 * c02
        inv = 1.0 / det
        c10 = a02 * a21 - a01 * a22
        c11 = a00 * a22 - a02 * a20
        c12 = a01 * a20 - a00 * a21
        c20 = a01 * a12 - a02 * a11
        c21 = a02 * a10 - a00 * a12
        c22 = a00 * a11 - a01 * a10
        return (
            (c00 * inv, c10 * inv, c20 * inv),
            (c01 * inv, c11 * inv, c21 * inv),
            (c02 * inv, c12 * inv, c22 * inv),
        )
    raise NotImplementedError(f"plane inverse only implemented for D<=3, got {d}")


class _FilterElement(NamedTuple):
    A: tuple  # planes (D, D) of (T,)
    b: tuple  # planes (D,) of (T,)
    C: tuple
    eta: tuple
    J: tuple


class _FilterElementAoS(NamedTuple):
    A: jnp.ndarray  # (T, D, D)
    b: jnp.ndarray  # (T, D)
    C: jnp.ndarray
    eta: jnp.ndarray
    J: jnp.ndarray


def _combine_filter_aos(e1: _FilterElementAoS, e2: _FilterElementAoS) -> _FilterElementAoS:
    """AoS twin of :func:`_combine_filter` (same math on (T, D, D) tensors)."""
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
    return _FilterElementAoS(A, b, C, eta, J)


def _combine_filter(e1: _FilterElement, e2: _FilterElement) -> _FilterElement:
    """Associative combination of filtering elements; e1 precedes e2 in time."""
    Z = _pinv(_peye_plus(_pmatmul(e1.C, e2.J)))
    Zt = _pt(Z)  # = inv(I + J2 C1) for symmetric C1, J2
    A2Z = _pmatmul(e2.A, Z)
    A = _pmatmul(A2Z, e1.A)
    b = _pvadd(_pmatvec(A2Z, _pvadd(e1.b, _pmatvec(e1.C, e2.eta))), e2.b)
    C = _padd(_pmatmul(_pmatmul(A2Z, e1.C), _pt(e2.A)), e2.C)
    A1tZt = _pmatmul(_pt(e1.A), Zt)
    eta = _pvadd(_pmatvec(A1tZt, _pvsub(e2.eta, _pmatvec(e2.J, e1.b))), e1.eta)
    J = _padd(_pmatmul(_pmatmul(A1tZt, e2.J), e1.A), e1.J)
    return _FilterElement(A, b, C, eta, J)


def _make_filter_elements(ys, m0, S0, A, Q, C, r) -> _FilterElementAoS:
    """Build per-step filtering elements (vectorized over T, AoS layout).

    ``r`` is the diagonal observation noise, (T, O) time-varying or (O,)
    constant. The constant case (what the s-optimizer always passes — its R
    is the time median) hoists the innovation solve: S, the gain, and every
    matrix-valued element are time-invariant, leaving two matvecs per step.
    """
    dim = m0.shape[0]
    T = ys.shape[0]
    eye = jnp.eye(dim, dtype=ys.dtype)

    # generic element for t >= 1: predict with (A, Q), update with (C, r_t, y_t)
    CQ = C @ Q  # (O, D)
    CA = C @ A  # (O, D)

    if r.ndim == 1:
        S = CQ @ C.T + jnp.diag(r)  # (O, O), time-invariant
        K = psd_solve(S, CQ).T  # (D, O) = Q Cᵀ S⁻¹
        IKC = eye - K @ C
        M = psd_solve(S, CA)  # (O, D) = S⁻¹ C A
        b_all = ys @ K.T  # (T, D)
        eta_all = ys @ M  # y_tᵀ S⁻¹ CA == (CAᵀ S⁻¹ y_t)ᵀ (S symmetric)
        A_all = jnp.broadcast_to(IKC @ A, (T, dim, dim))
        C_all = jnp.broadcast_to(IKC @ Q, (T, dim, dim))
        J_all = jnp.broadcast_to(CA.T @ M, (T, dim, dim))
        r = jnp.broadcast_to(r, (T, r.shape[0]))
    else:

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
    b_first = m0 + K_0 @ (ys[0] - C @ m0)
    C_first = (eye - K_0 @ C) @ S0

    A_all = A_all.at[0].set(jnp.zeros((dim, dim), dtype=ys.dtype))
    b_all = b_all.at[0].set(b_first)
    C_all = C_all.at[0].set(C_first)
    eta_all = eta_all.at[0].set(jnp.zeros((dim,), dtype=ys.dtype))
    J_all = J_all.at[0].set(jnp.zeros((dim, dim), dtype=ys.dtype))
    return _FilterElementAoS(A_all, b_all, C_all, eta_all, J_all)


def _run_filter_prefix(elems: _FilterElementAoS):
    """Prefix-combine filtering elements -> filtered (ms, Ps).

    Dispatch: fused Pallas kernel on TPU (or when forced), else
    ``lax.associative_scan`` in the backend-appropriate layout."""
    from eks_tpu.ops.pallas_filter import _use_pallas, filter_prefix_pallas

    D = elems.b.shape[-1]
    if _use_pallas(D):
        return filter_prefix_pallas(
            elems, interpret=jax.default_backend() != "tpu"
        )
    if _use_soa():
        soa = _FilterElement(
            _to_planes(elems.A),
            _vec_to_planes(elems.b),
            _to_planes(elems.C),
            _vec_to_planes(elems.eta),
            _to_planes(elems.J),
        )
        prefix = lax.associative_scan(_combine_filter, soa)
        return _planes_to_vec(prefix.b), _planes_to_mat(prefix.C)
    prefix = lax.associative_scan(_combine_filter_aos, elems)
    return prefix.b, prefix.C


def _predictive_moments(ms, Ps, m0, S0, A, Q):
    """One-step-ahead predictive moments aligned with observations:
    t=0 uses the prior, t>=1 predicts from the t-1 filtered moments."""
    m_prev = jnp.concatenate([m0[None], ms[:-1]], axis=0)
    P_prev = jnp.concatenate([S0[None], Ps[:-1]], axis=0)
    pred_m = m_prev.at[1:].set(m_prev[1:] @ A.T)
    pred_P = P_prev.at[1:].set(
        jnp.einsum("ij,tjk,lk->til", A, P_prev[1:], A) + Q
    )
    return pred_m, pred_P


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

    # pass the RAW r so the builder's constant-R fast path can trigger
    elems = _make_filter_elements(ys, m0, S0, A, Q, C, r_diag)
    ms, Ps = _run_filter_prefix(elems)
    pred_m, pred_P = _predictive_moments(ms, Ps, m0, S0, A, Q)

    def step_ll(y_t, r_t, mp, Pp):
        S = C @ Pp @ C.T + jnp.diag(r_t)
        return mvn_logpdf(y_t, C @ mp, S)

    ll = jnp.sum(vmap(step_ll)(ys, r, pred_m, pred_P))
    return FilterResult(ll, ms, Ps)


# --------------------------------------------------------------------------- #
# plane-native constant-R filter NLL (the s-optimizer hot loop)
# --------------------------------------------------------------------------- #
def _pchol(S):
    """Lower Cholesky of a symmetric plane matrix (list-of-lists of (T,)
    planes, entries above the diagonal unused), unrolled at trace time."""
    o = len(S)
    L = [[None] * o for _ in range(o)]
    for i in range(o):
        for j in range(i + 1):
            s = S[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = jnp.sqrt(s) if i == j else s / L[j][j]
    return L


def _plane_nll_pre(ys, m0, S0, A, Q, C, r):
    """Constant-R filter elements as a stacked (P, T) plane table,
    P = 3D² + 2D in _FilterElement order. The time-invariant element
    matrices stay 0-D scalars until the pack; the data-dependent planes are
    O elementwise combinations of the observation columns."""
    T, O = ys.shape
    D = m0.shape[0]
    dt = ys.dtype
    eye = jnp.eye(D, dtype=dt)

    CQ = C @ Q
    CA = C @ A
    S_c = CQ @ C.T + jnp.diag(r)  # (O, O)
    K_c = psd_solve(S_c, CQ).T  # (D, O)
    IKC = eye - K_c @ C
    M_c = psd_solve(S_c, CA)  # (O, D)
    A_el = IKC @ A  # (D, D)
    C_el = IKC @ Q
    J_el = CA.T @ M_c

    # first element assimilates y_0 against the prior (no transition)
    S_0 = C @ S0 @ C.T + jnp.diag(r)
    K_0 = psd_solve(S_0, C @ S0).T
    b_first = m0 + K_0 @ (ys[0] - C @ m0)
    C_first = (eye - K_0 @ C) @ S0

    y_pl = [ys[:, o] for o in range(O)]  # O planes of (T,)

    def const_row(c_all, c_first):
        return jnp.full((T,), c_all, dtype=dt).at[0].set(c_first.astype(dt))

    def data_row(weights, first):
        # Σ_o w_o · y_o as elementwise plane work, then the t=0 override
        row = sum(y_pl[o] * weights[o] for o in range(O))
        return row.at[0].set(first.astype(dt))

    zero = jnp.asarray(0.0, dt)
    rows = []
    for i in range(D):  # A planes (zero at t=0)
        for j in range(D):
            rows.append(const_row(A_el[i, j], zero))
    for i in range(D):  # b planes: K_c @ y_t, b_first at t=0
        rows.append(data_row(K_c[i], b_first[i]))
    for i in range(D):  # C planes
        for j in range(D):
            rows.append(const_row(C_el[i, j], C_first[i, j]))
    for i in range(D):  # eta planes: (CA)ᵀ S⁻¹ y_t = M_cᵀ y_t, zero at t=0
        rows.append(data_row(M_c[:, i], zero))
    for i in range(D):  # J planes (zero at t=0)
        for j in range(D):
            rows.append(const_row(J_el[i, j], zero))
    return jnp.stack(rows)


def _plane_soa_scan(rows, D):
    """lax.associative_scan over a (P, [...,] T) plane table (non-Pallas
    fallback; the scan axis is the trailing one). Returns (m planes,
    P planes)."""
    dd = D * D
    soa = _FilterElement(
        A=tuple(tuple(rows[i * D + j] for j in range(D)) for i in range(D)),
        b=tuple(rows[dd + i] for i in range(D)),
        C=tuple(
            tuple(rows[dd + D + i * D + j] for j in range(D))
            for i in range(D)
        ),
        eta=tuple(rows[2 * dd + D + i] for i in range(D)),
        J=tuple(
            tuple(rows[2 * dd + 2 * D + i * D + j] for j in range(D))
            for i in range(D)
        ),
    )
    prefix = lax.associative_scan(_combine_filter, soa, axis=-1)
    return prefix.b, prefix.C


def _plane_split_moments(out, D):
    """Slice filtered-moment planes out of a scanned (P, [...,] T) table."""
    off_b, off_C = D * D, D * D + D
    m_pl = tuple(out[..., off_b + i, :] for i in range(D))
    P_pl = tuple(
        tuple(out[..., off_C + i * D + j, :] for j in range(D))
        for i in range(D)
    )
    return m_pl, P_pl


def _c_planes(C, O, D):
    """Normalize an emission operand to an ``[o][a]``-indexable structure of
    scalars-or-planes: an (O, D) matrix yields 0-d entries (broadcast against
    (T,) planes), a (T, O, D) per-step stack yields (T,) planes, and an
    already-nested tuple passes through."""
    if isinstance(C, (tuple, list)):
        return C
    if C.ndim == 2:
        return tuple(tuple(C[o, a] for a in range(D)) for o in range(O))
    return tuple(tuple(C[:, o, a] for a in range(D)) for o in range(O))


def _plane_pred_moments(m_pl, P_pl, m0, S0, A, Q):
    """One-step-ahead predictive moments from filtered-moment planes:
    pred_m = A m_{t-1}, pred_P = A P_{t-1} Aᵀ + Q for t >= 1; the prior
    (m0, S0) at t = 0."""
    D = len(m_pl)
    dt = m_pl[0].dtype

    def shifted(p, first):
        return jnp.concatenate([jnp.asarray(first, dt)[None], p[:-1]])

    m_prev = [shifted(m_pl[i], m0[i]) for i in range(D)]
    P_prev = [
        [shifted(P_pl[i][j], S0[i, j]) for j in range(D)] for i in range(D)
    ]
    pred_m = [
        sum(A[i, j] * m_prev[j] for j in range(D)).at[0].set(m0[i].astype(dt))
        for i in range(D)
    ]
    pred_P = [
        [
            (
                sum(
                    A[i, k] * P_prev[k][l] * A[j, l]
                    for k in range(D)
                    for l in range(D)
                )
                + Q[i, j]
            )
            .at[0]
            .set(S0[i, j].astype(dt))
            for j in range(D)
        ]
        for i in range(D)
    ]
    return pred_m, pred_P


def _plane_innovation_ll(pred_m, pred_P, ys, C, r, hx=None):
    """Gaussian log-density of the innovations from predictive-moment planes.
    ``C`` may be an (O, D) matrix or per-step planes (see :func:`_c_planes`);
    with ``hx`` (the per-step emission mean h(pred_m) as (T, O)) the residual
    is ``y - hx`` — the exact (extended-filter) form — else the linear
    ``y - C pred_m``."""
    T, O = ys.shape
    D = len(pred_m)
    dt = ys.dtype
    zero = jnp.asarray(0.0, dt)
    y_pl = [ys[:, o] for o in range(O)]
    C = _c_planes(C, O, D)

    S_pl = [
        [
            sum(
                C[i][k] * pred_P[k][l] * C[j][l]
                for k in range(D)
                for l in range(D)
            )
            + (r[i] if i == j else zero)
            for j in range(O)
        ]
        for i in range(O)
    ]
    if hx is None:
        d_pl = [
            y_pl[i] - sum(C[i][j] * pred_m[j] for j in range(D))
            for i in range(O)
        ]
    else:
        d_pl = [y_pl[i] - hx[:, i] for i in range(O)]
    L = _pchol(S_pl)
    z = [None] * O
    logdet = zero
    for i in range(O):
        s = d_pl[i]
        for k in range(i):
            s = s - L[i][k] * z[k]
        z[i] = s / L[i][i]
        logdet = logdet + jnp.log(L[i][i])
    quad = sum(zi * zi for zi in z)
    ll_t = -0.5 * quad - logdet - 0.5 * O * math.log(2.0 * math.pi)
    return jnp.sum(ll_t)


def _plane_nll_post(m_pl, P_pl, ys, m0, S0, A, Q, C, r):
    """Predictive moments + Gaussian log-density from filtered-moment planes,
    all unrolled plane algebra — no (T, D, D) tensor is ever built."""
    pred_m, pred_P = _plane_pred_moments(m_pl, P_pl, m0, S0, A, Q)
    return _plane_innovation_ll(pred_m, pred_P, ys, C, r)


def _plane_nll_pre_tv(ys, m0, S0, A, Q, C, r):
    """Time-varying diagonal-R filter elements as a stacked (P, T) plane
    table, built in the information (Woodbury) form: with diagonal R the
    per-step O x O innovation solve of the covariance form collapses to one
    unrolled D x D plane inverse plus O(O·D²) diagonal work —
        W_t = Cᵀ R_t⁻¹ C,  v_t = Cᵀ R_t⁻¹ y_t,  M_t = (Q⁻¹ + W_t)⁻¹,
        A_el = M_t Q⁻¹ A,  b = M_t v_t,  C_el = M_t,
        eta = Aᵀ (v_t - W_t M_t v_t),  J = Aᵀ (W_t - W_t M_t W_t) A
    (push-through identities of the standard element definitions, e.g.
    Q Cᵀ S⁻¹ = (Q⁻¹ + CᵀR⁻¹C)⁻¹ CᵀR⁻¹). Requires Q and S0 invertible.

    ``C`` may be the usual (O, D) matrix or a per-step emission stack —
    (T, O, D) or nested planes (see :func:`_c_planes`) — the relinearized
    form the iterated plane EKF feeds this same table with."""
    T, O = ys.shape
    D = m0.shape[0]
    dt = ys.dtype
    C = _c_planes(C, O, D)

    ri = [1.0 / r[:, o] for o in range(O)]  # (T,) planes
    y_pl = [ys[:, o] for o in range(O)]

    W = [
        [
            sum(C[o][a] * C[o][b] * ri[o] for o in range(O))
            for b in range(D)
        ]
        for a in range(D)
    ]
    v = [sum(C[o][a] * ri[o] * y_pl[o] for o in range(O)) for a in range(D)]

    Qi = small_inv(Q)
    QiA = Qi @ A
    M = _pinv([[W[a][b] + Qi[a, b] for b in range(D)] for a in range(D)])
    A_el = [
        [sum(M[i][k] * QiA[k, j] for k in range(D)) for j in range(D)]
        for i in range(D)
    ]
    b_el = _pmatvec(M, v)
    MW = _pmatmul(M, W)
    WMW = _pmatmul(W, MW)
    w = [v[a] - sum(W[a][k] * b_el[k] for k in range(D)) for a in range(D)]
    eta = [sum(A[k, i] * w[k] for k in range(D)) for i in range(D)]
    J = [
        [
            sum(
                A[k, i] * (W[k][l] - WMW[k][l]) * A[l, j]
                for k in range(D)
                for l in range(D)
            )
            for j in range(D)
        ]
        for i in range(D)
    ]

    # t = 0 assimilates y_0 against the prior: same information-form update
    # with S0 in the role of Q and no transition
    S0i = small_inv(S0)
    W0 = [[W[a][b][0] for b in range(D)] for a in range(D)]
    v0 = [v[a][0] for a in range(D)]
    M0 = _pinv([[W0[a][b] + S0i[a, b] for b in range(D)] for a in range(D)])
    rhs0 = [
        sum(S0i[a, k] * m0[k] for k in range(D)) + v0[a] for a in range(D)
    ]
    b0 = _pmatvec(M0, rhs0)

    zero = jnp.asarray(0.0, dt)
    rows = []
    for i in range(D):  # A planes (zero at t=0)
        for j in range(D):
            rows.append(A_el[i][j].astype(dt).at[0].set(zero))
    for i in range(D):  # b planes
        rows.append(b_el[i].astype(dt).at[0].set(b0[i].astype(dt)))
    for i in range(D):  # C planes
        for j in range(D):
            rows.append(M[i][j].astype(dt).at[0].set(M0[i][j].astype(dt)))
    for i in range(D):  # eta planes (zero at t=0)
        rows.append(eta[i].astype(dt).at[0].set(zero))
    for i in range(D):  # J planes (zero at t=0)
        for j in range(D):
            rows.append(J[i][j].astype(dt).at[0].set(zero))
    return jnp.stack(rows)


@highest_precision
def filter_nll_parallel_planes_tv(
    ys: jnp.ndarray,  # (T, O)
    m0: jnp.ndarray,  # (D,)
    S0: jnp.ndarray,  # (D, D)
    A: jnp.ndarray,  # (D, D)
    Q: jnp.ndarray,  # (D, D)
    C: jnp.ndarray,  # (O, D)
    r: jnp.ndarray,  # (T, O) time-varying diagonal observation noise
) -> jnp.ndarray:
    """Marginal log-likelihood of the linear filter with TIME-VARYING
    diagonal R, computed entirely in scalar planes (the 2-parameter pupil
    optimizer's loss — models/ibl_pupil.py:_pupil_optimize_jit — whose R is
    the per-frame ensemble variance). Same plane pipeline as
    :func:`filter_nll_parallel_planes`, with the element table built in the
    information form (see :func:`_plane_nll_pre_tv`)."""
    from eks_tpu.ops.pallas_filter import _scan_fn, _use_pallas

    D = m0.shape[0]
    O = ys.shape[1]
    rows = _plane_nll_pre_tv(ys, m0, S0, A, Q, C, r)
    if _use_pallas(D):
        out = _scan_fn("filter", D, jax.default_backend() != "tpu")(rows)
        m_pl, P_pl = _plane_split_moments(out, D)
    else:
        m_pl, P_pl = _plane_soa_scan(rows, D)
    r_pl = [r[:, o] for o in range(O)]
    return _plane_nll_post(m_pl, P_pl, ys, m0, S0, A, Q, C, r_pl)


@highest_precision
def ekf_nll_parallel_planes_batched(
    ys: jnp.ndarray,  # (N, T, O)
    m0: jnp.ndarray,  # (N, D)
    S0: jnp.ndarray,  # (N, D, D)
    A: jnp.ndarray,  # (N, D, D)
    Q: jnp.ndarray,  # (N, D, D)
    h_fn,  # callable (D,) -> (O,)
    r: jnp.ndarray,  # (N, O) constant or (N, T, O) time-varying diagonal R
    x_init: jnp.ndarray,  # (N, T, D) linearization trajectories
    n_sweeps: int = 3,
) -> jnp.ndarray:
    """Iterated-EKF marginal log-likelihoods (N,), fully plane-native.

    The s-optimizer's loss for the calibrated (nonlinear emission) multicam
    family. Each sweep linearizes ``h`` at the current trajectory ``x̄``,
    runs the time-varying-C information-form plane table
    (:func:`_plane_nll_pre_tv` with per-step C planes) through ONE
    lane-batched prefix scan for all N sequences, and replaces ``x̄`` with the
    resulting predicted means; the epilogue evaluates the exact EKF
    innovation density at the final predicted trajectory. ``n_sweeps = k``
    matches :func:`ekf_parallel` with ``n_iters = k - 1`` (same fixed point
    == the sequential EKF, ops/kalman.py); from a good ``x_init`` (the
    calibrated family feeds the triangulated trajectory) 3 sweeps sit at the
    fixed point, vs 13 cold sweeps from a broadcast prior.

    Vs the AoS :func:`ekf_parallel` under vmap, every tensor here is
    (N, T)-shaped (fully tiled on TPU), the per-step O x O innovation solve
    collapses to the unrolled D x D plane inverse, and the prefix scan runs
    KB lanes per grid step instead of being grid-serialized by vmap.
    """
    from eks_tpu.ops.pallas_filter import _scan_fn_batched, _use_pallas

    N, T, O = ys.shape
    D = m0.shape[1]
    jac = jax.jacfwd(h_fn)
    rt = r if r.ndim == 3 else jnp.broadcast_to(r[:, None, :], (N, T, O))

    def relinearize(y_l, x_l):  # per lane: (T, O), (T, D)
        Hs = vmap(jac)(x_l)  # (T, O, D)
        y_eff = y_l - vmap(h_fn)(x_l) + jnp.einsum("tod,td->to", Hs, x_l)
        return Hs, y_eff

    def pred_stacked(m_pl, P_pl, m0_l, S0_l, A_l, Q_l):
        pm, pP = _plane_pred_moments(m_pl, P_pl, m0_l, S0_l, A_l, Q_l)
        pm_st = jnp.stack(pm, axis=-1)  # (T, D)
        pP_st = jnp.stack(
            [jnp.stack(row, axis=-1) for row in pP], axis=-2
        )  # (T, D, D)
        return pm_st, pP_st

    x_bar = x_init
    pred_m = pred_P = None
    for _ in range(n_sweeps):
        Hs, y_eff = vmap(relinearize)(ys, x_bar)
        rows = vmap(
            lambda y_l, m0_l, S0_l, A_l, Q_l, C_l, r_l: _plane_nll_pre_tv(
                y_l, m0_l, S0_l, A_l, Q_l, C_l, r_l
            )
        )(y_eff, m0, S0, A, Q, Hs, rt)  # (N, P, T)
        if _use_pallas(D):
            out = _scan_fn_batched(
                "filter", D, T, jax.default_backend() != "tpu"
            )(rows)
            m_pl, P_pl = _plane_split_moments(out, D)
        else:
            m_pl, P_pl = _plane_soa_scan(
                tuple(rows[:, p] for p in range(rows.shape[1])), D
            )
        pred_m, pred_P = vmap(pred_stacked)(m_pl, P_pl, m0, S0, A, Q)
        x_bar = pred_m  # (N, T, D)

    def ll_lane(y_l, pm_l, pP_l, r_l):
        Hs = vmap(jac)(pm_l)
        hx = vmap(h_fn)(pm_l)
        pm_pl = tuple(pm_l[:, i] for i in range(D))
        pP_pl = tuple(
            tuple(pP_l[:, i, j] for j in range(D)) for i in range(D)
        )
        r_pl = tuple(r_l[:, o] for o in range(O))
        return _plane_innovation_ll(pm_pl, pP_pl, y_l, Hs, r_pl, hx=hx)

    return vmap(ll_lane)(ys, pred_m, pred_P, rt)


@highest_precision
def filter_nll_parallel_planes(
    ys: jnp.ndarray,  # (T, O)
    m0: jnp.ndarray,  # (D,)
    S0: jnp.ndarray,  # (D, D)
    A: jnp.ndarray,  # (D, D)
    Q: jnp.ndarray,  # (D, D)
    C: jnp.ndarray,  # (O, D)
    r: jnp.ndarray,  # (O,) constant diagonal observation noise
) -> jnp.ndarray:
    """Marginal log-likelihood of the linear filter with CONSTANT diagonal R,
    computed entirely in scalar planes — no (T, D, D) tensor is ever built.

    This is the s-optimizer's loss (its R is the time median,
    core.py:_optimize_blocks). The generic path packs broadcast (T, D, D)
    element tensors, scans, unpacks to (T, D, D) moments, and evaluates the
    log-density through einsums over tiny minor dims — each step a relayout
    that wastes the TPU's (8, 128) tiles. Here every tensor the compiler
    sees is (T,)-shaped (under vmap: (K, T) — fully tiled). Same math, same
    element algebra, same scan kernel.
    """
    from eks_tpu.ops.pallas_filter import _scan_fn, _use_pallas

    D = m0.shape[0]
    rows = _plane_nll_pre(ys, m0, S0, A, Q, C, r)
    if _use_pallas(D):
        out = _scan_fn("filter", D, jax.default_backend() != "tpu")(rows)
        m_pl, P_pl = _plane_split_moments(out, D)
    else:
        m_pl, P_pl = _plane_soa_scan(rows, D)
    return _plane_nll_post(m_pl, P_pl, ys, m0, S0, A, Q, C, r)


@highest_precision
def filter_nll_parallel_planes_batched(
    ys: jnp.ndarray,  # (N, T, O)
    m0: jnp.ndarray,  # (N, D)
    S0: jnp.ndarray,  # (N, D, D)
    A: jnp.ndarray,  # (N, D, D)
    Q: jnp.ndarray,  # (N, D, D)
    C: jnp.ndarray,  # (N, O, D)
    r: jnp.ndarray,  # (N, O)
) -> jnp.ndarray:
    """Batched twin of :func:`filter_nll_parallel_planes` over N independent
    sequences: the elementwise prep/epilogue are vmapped (pure (N, T) plane
    work), and the prefix scan runs as ONE lane-batched Pallas kernel — KB
    lanes per grid step on the sublane axis — instead of N single-lane grid
    steps (a vmapped ``pallas_call`` serializes over a grid dimension, which
    on one TensorCore wastes 7/8 of the VPU's sublanes). Returns (N,) lls.

    On TPU (or under ``force_fused_nll``) the whole loss runs as ONE fused
    kernel — element build + prefix scan + likelihood epilogue with nothing
    T-sized ever touching HBM (ops/pallas_nll.py); the staged plane pipeline
    below remains the oracle and the fallback for D > 3 / O > 8.
    """
    from eks_tpu.ops.pallas_nll import _use_fused_nll, filter_nll_fused_batched

    T = ys.shape[1]
    D = m0.shape[1]
    if _use_fused_nll(D, ys.shape[2], T):
        return filter_nll_fused_batched(
            ys, m0, S0, A, Q, C, r,
            interpret=jax.default_backend() != "tpu",
        )
    return _filter_nll_planes_batched_staged(ys, m0, S0, A, Q, C, r)


def _filter_nll_planes_batched_staged(ys, m0, S0, A, Q, C, r):
    """The staged (element table in HBM) lane-batched plane NLL — the
    production fallback of :func:`filter_nll_parallel_planes_batched` for
    O > 8 / over-VMEM-budget T, and the observation-tangent fallback of the
    fused kernel's custom JVP (it supports JVPs w.r.t. every input,
    including ``ys``)."""
    from eks_tpu.ops.pallas_filter import _scan_fn_batched, _use_pallas

    T = ys.shape[1]
    D = m0.shape[1]
    rows = vmap(_plane_nll_pre)(ys, m0, S0, A, Q, C, r)  # (N, P, T)
    if _use_pallas(D):
        out = _scan_fn_batched(
            "filter", D, T, jax.default_backend() != "tpu"
        )(rows)
        m_pl, P_pl = _plane_split_moments(out, D)
    else:
        m_pl, P_pl = _plane_soa_scan(
            tuple(rows[:, p] for p in range(rows.shape[1])), D
        )
    return vmap(_plane_nll_post)(m_pl, P_pl, ys, m0, S0, A, Q, C, r)


class _SmootherElement(NamedTuple):
    E: tuple  # planes (D, D) of (T,)
    g: tuple  # planes (D,) of (T,)
    L: tuple


class _SmootherElementAoS(NamedTuple):
    E: jnp.ndarray  # (T, D, D)
    g: jnp.ndarray  # (T, D)
    L: jnp.ndarray


def _combine_smoother_aos(
    later: _SmootherElementAoS, earlier: _SmootherElementAoS
) -> _SmootherElementAoS:
    """AoS twin of :func:`_combine_smoother` (reverse-scan argument order)."""

    def one(El, gl, Ll, Ee, ge, Le):
        return Ee @ El, Ee @ gl + ge, Ee @ Ll @ Ee.T + Le

    E, g, L = vmap(one)(
        later.E, later.g, later.L, earlier.E, earlier.g, earlier.L
    )
    return _SmootherElementAoS(E, g, L)


def _combine_smoother(later: _SmootherElement, earlier: _SmootherElement) -> _SmootherElement:
    """Associative combination of smoothing elements.

    Used under ``lax.associative_scan(..., reverse=True)``, which flips the
    sequence before scanning — so the FIRST argument is the element later in
    time. The composition applies the earlier element's affine map to the
    later suffix: ``x -> E_e x + g_e``.
    """
    E = _pmatmul(earlier.E, later.E)
    g = _pvadd(_pmatvec(earlier.E, later.g), earlier.g)
    L = _padd(_pmatmul(_pmatmul(earlier.E, later.L), _pt(earlier.E)), earlier.L)
    return _SmootherElement(E, g, L)


def _make_smoother_elements(ms, Ps, A, Q):
    """RTS smoothing elements from filtered moments: per-step backward
    affine-Gaussian maps (E, g, L); the final element carries the filtered
    terminal moments."""
    dim = ms.shape[1]

    def make_elem(m_f, P_f):
        P_pred = A @ P_f @ A.T + Q
        E = psd_solve(P_pred, A @ P_f).T  # (D, D) gain G_t
        g = m_f - E @ (A @ m_f)
        L = P_f - E @ P_pred @ E.T
        return E, g, L

    E_all, g_all, L_all = vmap(make_elem)(ms, Ps)
    E_all = E_all.at[-1].set(jnp.zeros((dim, dim), dtype=ms.dtype))
    g_all = g_all.at[-1].set(ms[-1])
    L_all = L_all.at[-1].set(Ps[-1])
    return E_all, g_all, L_all


def _rts_from_filtered(ms, Ps, A, Q):
    """Backward RTS pass as a reverse associative scan over the filtered
    moments; emission-independent, so linear and (iterated) extended filters
    share it. Returns (smoothed means, smoothed covs)."""
    from eks_tpu.ops.pallas_filter import _FORCE_PALLAS, smoother_suffix_pallas

    E_all, g_all, L_all = _make_smoother_elements(ms, Ps, A, Q)
    dim = ms.shape[1]
    # the fused backward kernel only runs when explicitly forced: measured on
    # v5e it loses to the XLA reverse scan (69ms vs 41ms for the 20-lane
    # final pass) — the reversal copies + re-packing eat the fusion win,
    # unlike the forward filter where Pallas is ~2x ahead
    if _FORCE_PALLAS and dim <= 3:
        return smoother_suffix_pallas(
            E_all, g_all, L_all, interpret=jax.default_backend() != "tpu"
        )

    if _use_soa():
        suffix = lax.associative_scan(
            _combine_smoother,
            _SmootherElement(
                _to_planes(E_all), _vec_to_planes(g_all), _to_planes(L_all)
            ),
            reverse=True,
        )
        return _planes_to_vec(suffix.g), _planes_to_mat(suffix.L)
    suffix = lax.associative_scan(
        _combine_smoother_aos,
        _SmootherElementAoS(E_all, g_all, L_all),
        reverse=True,
    )
    return suffix.g, suffix.L


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
    sm, sP = _rts_from_filtered(fr.filtered_means, fr.filtered_covs, A, Q)
    return SmootherResult(
        fr.log_likelihood, fr.filtered_means, fr.filtered_covs, sm, sP
    )


# --------------------------------------------------------------------------- #
# iterated parallel EKF: nonlinear emissions at O(log T) depth
# --------------------------------------------------------------------------- #
def _make_filter_elements_tv(ys, m0, S0, A, Q, Cs, r) -> _FilterElementAoS:
    """Filtering elements with a per-step emission matrix ``Cs`` (T, O, D) —
    the relinearized form the iterated EKF feeds the linear prefix scan."""
    dim = m0.shape[0]
    eye = jnp.eye(dim, dtype=ys.dtype)

    def generic(y_t, r_t, C_t):
        CQ = C_t @ Q
        CA = C_t @ A
        S = CQ @ C_t.T + jnp.diag(r_t)
        K = psd_solve(S, CQ).T  # (D, O) = Q C_tᵀ S⁻¹
        IKC = eye - K @ C_t
        return IKC @ A, K @ y_t, IKC @ Q, CA.T @ psd_solve(S, y_t), CA.T @ psd_solve(S, CA)

    A_all, b_all, C_all, eta_all, J_all = vmap(generic)(ys, r, Cs)

    # first element: assimilate y_0 against the prior, no transition
    C0 = Cs[0]
    S_0 = C0 @ S0 @ C0.T + jnp.diag(r[0])
    K_0 = psd_solve(S_0, C0 @ S0).T
    A_all = A_all.at[0].set(jnp.zeros((dim, dim), dtype=ys.dtype))
    b_all = b_all.at[0].set(m0 + K_0 @ (ys[0] - C0 @ m0))
    C_all = C_all.at[0].set((eye - K_0 @ C0) @ S0)
    eta_all = eta_all.at[0].set(jnp.zeros((dim,), dtype=ys.dtype))
    J_all = J_all.at[0].set(jnp.zeros((dim, dim), dtype=ys.dtype))
    return _FilterElementAoS(A_all, b_all, C_all, eta_all, J_all)


@highest_precision
def ekf_parallel(
    ys: jnp.ndarray,  # (T, O)
    m0: jnp.ndarray,
    S0: jnp.ndarray,
    A: jnp.ndarray,
    Q: jnp.ndarray,
    h_fn,  # callable (D,) -> (O,)
    r_diag: jnp.ndarray,
    n_iters: int = 12,
    x_init: jnp.ndarray | None = None,  # (T, D) nominal predicted means
) -> FilterResult:
    """Extended Kalman filter via fixed-point relinearization over parallel
    linear sweeps.

    Each iteration linearizes ``h`` at the current predicted-mean trajectory
    ``x̄`` and replays the O(log T) linear filter on the affine surrogate
    ``ỹ_t = y_t - h(x̄_t) + H_t x̄_t``; the updated predicted means become the
    next ``x̄``. When ``x̄`` equals the filter's own predicted means the
    recursion is EXACTLY the sequential EKF (``ops/kalman.py:81-95``, the
    dynamax-parity path replacing eks/core.py:290-291), so the fixed point
    reproduces it — at O(n_iters · log T) depth instead of O(T).
    """
    T = ys.shape[0]
    r = _as_time_varying(r_diag, T)
    jac = jax.jacfwd(h_fn)

    def relinearized_moments(x_bar):
        Hs = vmap(jac)(x_bar)  # (T, O, D)
        y_eff = ys - vmap(h_fn)(x_bar) + jnp.einsum("tod,td->to", Hs, x_bar)
        elems = _make_filter_elements_tv(y_eff, m0, S0, A, Q, Hs, r)
        return _run_filter_prefix(elems)

    if x_init is None:
        x_init = jnp.broadcast_to(m0, (T, m0.shape[0]))

    def body(_, x_bar):
        ms, _ = relinearized_moments(x_bar)
        return jnp.concatenate([m0[None], ms[:-1] @ A.T], axis=0)

    x_bar = lax.fori_loop(0, n_iters, body, x_init)
    ms, Ps = relinearized_moments(x_bar)

    # exact EKF NLL: innovations against h at the final predicted trajectory
    pred_m, pred_P = _predictive_moments(ms, Ps, m0, S0, A, Q)

    def step_ll(y_t, r_t, mp, Pp):
        H = jac(mp)
        S = H @ Pp @ H.T + jnp.diag(r_t)
        return mvn_logpdf(y_t, h_fn(mp), S)

    ll = jnp.sum(vmap(step_ll)(ys, r, pred_m, pred_P))
    return FilterResult(ll, ms, Ps)


@highest_precision
def eks_parallel(
    ys: jnp.ndarray,
    m0: jnp.ndarray,
    S0: jnp.ndarray,
    A: jnp.ndarray,
    Q: jnp.ndarray,
    h_fn,
    r_diag: jnp.ndarray,
    n_iters: int = 12,
    x_init: jnp.ndarray | None = None,
) -> SmootherResult:
    """Iterated parallel EKF + the (emission-independent) parallel RTS pass."""
    fr = ekf_parallel(ys, m0, S0, A, Q, h_fn, r_diag, n_iters=n_iters, x_init=x_init)
    sm, sP = _rts_from_filtered(fr.filtered_means, fr.filtered_covs, A, Q)
    return SmootherResult(
        fr.log_likelihood, fr.filtered_means, fr.filtered_covs, sm, sP
    )
