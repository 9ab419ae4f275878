"""Kalman core: sequential scan vs float64 numpy oracle vs parallel prefix scan."""

import numpy as np
import pytest

import jax.numpy as jnp

from eks_tpu.ops.kalman import kalman_filter, kalman_smoother
from eks_tpu.ops.pkalman import kalman_filter_parallel, kalman_smoother_parallel


# --------------------------------------------------------------------- #
# float64 numpy oracle with the exact update conventions of the core
# --------------------------------------------------------------------- #
def oracle_filter_smoother(ys, m0, S0, A, Q, C, r):
    T, O = ys.shape
    D = m0.shape[0]
    r = np.broadcast_to(r, (T, O))
    ll = 0.0
    m_pred, P_pred = m0.astype(np.float64), S0.astype(np.float64)
    ms = np.zeros((T, D))
    Ps = np.zeros((T, D, D))
    for t in range(T):
        R = np.diag(r[t])
        S = C @ P_pred @ C.T + R
        resid = ys[t] - C @ m_pred
        chol = np.linalg.cholesky(S)
        z = np.linalg.solve(chol, resid)
        ll += (
            -0.5 * z @ z
            - np.log(np.diag(chol)).sum()
            - 0.5 * O * np.log(2 * np.pi)
        )
        K = np.linalg.solve(S, C @ P_pred).T
        m_filt = m_pred + K @ resid
        P_filt = P_pred - K @ S @ K.T
        ms[t], Ps[t] = m_filt, P_filt
        m_pred = A @ m_filt
        P_pred = A @ P_filt @ A.T + Q
    # RTS backward
    sm = ms.copy()
    sP = Ps.copy()
    for t in range(T - 2, -1, -1):
        m_pred = A @ ms[t]
        P_pred = Q + A @ Ps[t] @ A.T
        G = np.linalg.solve(P_pred, A @ Ps[t]).T
        sm[t] = ms[t] + G @ (sm[t + 1] - m_pred)
        sP[t] = Ps[t] + G @ (sP[t + 1] - P_pred) @ G.T
    return ll, ms, Ps, sm, sP


def make_problem(rng, T=200, D=2, O=2, ar=0.95):
    A = ar * np.eye(D)
    Q = 0.3 * np.eye(D)
    C = rng.normal(size=(O, D)) if O != D else np.eye(O)
    m0 = rng.normal(size=D)
    S0 = np.diag(rng.uniform(0.5, 2.0, size=D))
    # simulate
    x = np.zeros((T, D))
    x[0] = m0
    for t in range(1, T):
        x[t] = A @ x[t - 1] + rng.normal(size=D) * np.sqrt(0.3)
    r = rng.uniform(0.05, 2.0, size=(T, O))
    ys = x @ C.T + rng.normal(size=(T, O)) * np.sqrt(r)
    return ys, m0, S0, A, Q, C, r


@pytest.mark.parametrize("D,O", [(2, 2), (3, 6), (3, 8)])
def test_sequential_matches_oracle_f64(rng, D, O):
    # exact-convention check in float64: must agree to near machine precision
    import jax

    ys, m0, S0, A, Q, C, r = make_problem(rng, T=150, D=D, O=O)
    ll_o, ms_o, Ps_o, sm_o, sP_o = oracle_filter_smoother(ys, m0, S0, A, Q, C, r)

    with jax.enable_x64():
        args = [jnp.asarray(a, dtype=jnp.float64) for a in (ys, m0, S0, A, Q)]
        res = kalman_smoother(
            *args,
            C=jnp.asarray(C, dtype=jnp.float64),
            r_diag=jnp.asarray(r, dtype=jnp.float64),
        )
        ll = float(res.log_likelihood)
        fm = np.array(res.filtered_means)
        sm = np.array(res.smoothed_means)
        sP = np.array(res.smoothed_covs)
    np.testing.assert_allclose(ll, ll_o, rtol=1e-8)
    np.testing.assert_allclose(fm, ms_o, atol=1e-7)
    np.testing.assert_allclose(sm, sm_o, atol=1e-7)
    np.testing.assert_allclose(sP, sP_o, atol=1e-7)


def test_sequential_matches_oracle_f32_loose(rng):
    # float32 production path drifts from the f64 oracle only within
    # accumulated-rounding tolerance
    ys, m0, S0, A, Q, C, r = make_problem(rng, T=150, D=2, O=2)
    ll_o, ms_o, _, sm_o, _ = oracle_filter_smoother(ys, m0, S0, A, Q, C, r)
    args = [jnp.asarray(a) for a in (ys, m0, S0, A, Q)]
    res = kalman_smoother(*args, C=jnp.asarray(C), r_diag=jnp.asarray(r))
    np.testing.assert_allclose(float(res.log_likelihood), ll_o, rtol=1e-3)
    np.testing.assert_allclose(np.array(res.filtered_means), ms_o, atol=2e-2)
    np.testing.assert_allclose(np.array(res.smoothed_means), sm_o, atol=2e-2)


@pytest.mark.parametrize("D,O", [(2, 2), (3, 6)])
@pytest.mark.parametrize(
    "T", [1, 2, 3, 37, pytest.param(256, marks=pytest.mark.slow)]
)  # T=256 at both configs costs ~46s of compile; parity is T-independent
def test_parallel_matches_sequential(rng, D, O, T):
    ys, m0, S0, A, Q, C, r = make_problem(rng, T=T, D=D, O=O)
    args = [jnp.asarray(a) for a in (ys, m0, S0, A, Q)]
    seq = kalman_smoother(*args, C=jnp.asarray(C), r_diag=jnp.asarray(r))
    par = kalman_smoother_parallel(*args, jnp.asarray(C), jnp.asarray(r))

    np.testing.assert_allclose(
        float(par.log_likelihood), float(seq.log_likelihood), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.array(par.filtered_means), np.array(seq.filtered_means), atol=1e-3
    )
    np.testing.assert_allclose(
        np.array(par.filtered_covs), np.array(seq.filtered_covs), atol=1e-3
    )
    np.testing.assert_allclose(
        np.array(par.smoothed_means), np.array(seq.smoothed_means), atol=2e-3
    )
    np.testing.assert_allclose(
        np.array(par.smoothed_covs), np.array(seq.smoothed_covs), atol=2e-3
    )


@pytest.mark.slow  # 10k-frame compile+run costs ~1 min on XLA:CPU; the
# stability property is shape-driven, not inner-loop-driven
def test_parallel_long_sequence_stability(rng):
    # 10k frames, tiny/huge variance extremes as produced by ensemble()'s
    # nan_replacement=1000 and the 1e-12 variance floor
    ys, m0, S0, A, Q, C, r = make_problem(rng, T=10_000, D=2, O=2)
    r[100:110] = 1000.0
    r[200:210] = 1e-6
    args = [jnp.asarray(a) for a in (ys, m0, S0, A, Q)]
    seq = kalman_filter(*args, C=jnp.asarray(C), r_diag=jnp.asarray(r))
    par = kalman_filter_parallel(*args, jnp.asarray(C), jnp.asarray(r))
    np.testing.assert_allclose(
        float(par.log_likelihood), float(seq.log_likelihood), rtol=5e-4
    )
    np.testing.assert_allclose(
        np.array(par.filtered_means), np.array(seq.filtered_means), atol=5e-3
    )


@pytest.mark.parametrize("D,O", [(2, 2), (3, 8)])
def test_constant_r_hoisted_elements_match_broadcast(rng, D, O):
    """The element builder's constant-R fast path (one hoisted innovation
    solve instead of T) must agree with the broadcast time-varying path and
    the f64 oracle."""
    ys, m0, S0, A, Q, C, _ = make_problem(rng, T=150, D=D, O=O)
    r_const = rng.uniform(0.1, 1.0, size=O)

    args = (jnp.asarray(ys), jnp.asarray(m0), jnp.asarray(S0),
            jnp.asarray(A), jnp.asarray(Q), jnp.asarray(C))
    hoisted = kalman_filter_parallel(*args, jnp.asarray(r_const))
    broadcast = kalman_filter_parallel(
        *args, jnp.broadcast_to(jnp.asarray(r_const), (150, O))
    )
    np.testing.assert_allclose(
        float(hoisted.log_likelihood), float(broadcast.log_likelihood),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        hoisted.filtered_means, broadcast.filtered_means, atol=1e-4
    )
    np.testing.assert_allclose(
        hoisted.filtered_covs, broadcast.filtered_covs, atol=1e-4
    )
    ll, ms, _, _, _ = oracle_filter_smoother(ys, m0, S0, A, Q, C, r_const)
    np.testing.assert_allclose(float(hoisted.log_likelihood), ll, rtol=1e-4)
    np.testing.assert_allclose(hoisted.filtered_means, ms, atol=1e-3)


def test_nonlinear_emission_matches_linear():
    # h(x) = Cx given as a callable must reproduce the linear path exactly
    rng = np.random.default_rng(1)
    ys, m0, S0, A, Q, C, r = make_problem(rng, T=50, D=3, O=6)
    args = [jnp.asarray(a) for a in (ys, m0, S0, A, Q)]
    Cj = jnp.asarray(C)
    lin = kalman_smoother(*args, C=Cj, r_diag=jnp.asarray(r))
    nonlin = kalman_smoother(
        *args, r_diag=jnp.asarray(r), h_fn=lambda x: Cj @ x
    )
    np.testing.assert_allclose(
        np.array(lin.smoothed_means), np.array(nonlin.smoothed_means), atol=1e-5
    )
    np.testing.assert_allclose(
        float(lin.log_likelihood), float(nonlin.log_likelihood), rtol=1e-6
    )


# --------------------------------------------------------------------- #
# iterated parallel EKF (nonlinear emissions at O(log T) depth)
# --------------------------------------------------------------------- #
def _nonlinear_problem(rng, T=300, D=3, O=4, return_states=False):
    from eks_tpu.ops.pkalman import eks_parallel  # noqa: F401  (import check)

    P1 = rng.normal(size=(2, D)) * 0.5
    P2 = rng.normal(size=(2, D)) * 0.5

    def h(x):
        z1 = 2.0 + 0.1 * x[2]
        z2 = 2.0 - 0.05 * x[0]
        return jnp.concatenate([P1 @ x / z1, P2 @ x / z2])

    A = 0.98 * np.eye(D)
    Q = 0.05 * np.eye(D)
    m0 = rng.normal(size=D) * 0.3
    S0 = 0.5 * np.eye(D)
    x = m0.copy()
    xs = np.zeros((T, D))
    for t in range(T):
        x = A @ x + rng.normal(size=D) * np.sqrt(0.05)
        xs[t] = x
    ys = np.stack([np.asarray(h(jnp.asarray(v))) for v in xs])
    ys += rng.normal(size=(T, O)) * 0.05
    r = np.full((T, O), 0.05**2) * rng.uniform(0.5, 2.0, (T, O))
    if return_states:
        return h, ys, m0, S0, A, Q, r, xs
    return h, ys, m0, S0, A, Q, r


def test_iterated_parallel_ekf_matches_sequential(rng):
    from eks_tpu.ops.pkalman import eks_parallel

    h, ys, m0, S0, A, Q, r = _nonlinear_problem(rng)
    args = [jnp.asarray(a, jnp.float32) for a in (ys, m0, S0, A, Q)]
    rj = jnp.asarray(r, jnp.float32)
    seq = kalman_smoother(*args, r_diag=rj, h_fn=h)
    par = eks_parallel(*args, h, rj, n_iters=12)
    np.testing.assert_allclose(
        float(par.log_likelihood), float(seq.log_likelihood), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(par.filtered_means), np.asarray(seq.filtered_means), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(par.smoothed_means), np.asarray(seq.smoothed_means), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(par.smoothed_covs), np.asarray(seq.smoothed_covs), atol=1e-4
    )


@pytest.mark.slow  # real-calibration EKF run (~37s); the op itself stays
# fast-tier via test_iterated_parallel_ekf_matches_sequential
def test_iterated_parallel_ekf_fly_calibration():
    """VERDICT item 6 done-criterion: nonlinear smoother output matches the
    sequential EKF at atol=1e-4 on real fly data with O(log T) depth."""
    import os

    import jax

    from eks_tpu.core import ensemble
    from eks_tpu.geometry.camera import CameraGroup, make_projection_from_camgroup
    from eks_tpu.marker_array import input_dfs_to_markerArray
    from eks_tpu.models.multicam import (
        initialize_kalman_filter_geometric,
        triangulate_3d_models,
    )
    from eks_tpu.ops.pkalman import eks_parallel
    from eks_tpu.utils import format_data

    data = "/root/reference/data/fly"
    if not os.path.isdir(data):
        pytest.skip("reference fly data missing")

    camgroup = CameraGroup.load(f"{data}/calibration.toml")
    cams = [c.name for c in camgroup.cameras]
    dfs, kps = format_data(data, camera_names=cams)
    ma = input_dfs_to_markerArray(dfs, kps, cams)
    emA = ensemble(ma)
    tri = triangulate_3d_models(ma, camgroup)  # (M, K, T, 3)
    ys3d = tri.mean(axis=0)
    m0s, S0s, As, Qs, _ = initialize_kalman_filter_geometric(ys3d)
    h_fn, _ = make_projection_from_camgroup(camgroup)

    # one keypoint, raw 2D obs stacked over views with ensemble-variance R
    unsm = emA.slice_fields("x", "y").array[0]   # (C, T, K, 2)
    evar = emA.slice_fields("var_x", "var_y").array[0]
    k = 0
    y = jnp.asarray(np.moveaxis(unsm[:, :, k], 0, 1).reshape(unsm.shape[1], -1))
    r = jnp.asarray(
        np.clip(np.moveaxis(evar[:, :, k], 0, 1).reshape(evar.shape[1], -1), 1e-12, None)
    )
    common = [jnp.asarray(a, jnp.float32) for a in (m0s[k], S0s[k], As[k], 2.0 * Qs[k])]
    seq = kalman_smoother(y, *common, r_diag=r, h_fn=h_fn)
    par = eks_parallel(y, *common, h_fn, r, n_iters=12)
    np.testing.assert_allclose(
        float(par.log_likelihood), float(seq.log_likelihood), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(par.smoothed_means), np.asarray(seq.smoothed_means), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(par.smoothed_covs), np.asarray(seq.smoothed_covs), atol=1e-4
    )


@pytest.mark.slow  # the iterated-EKF plane graph is the most expensive
# XLA:CPU LLVM compile in the suite (~2 min); AoS-EKF parity stays fast-tier
def test_plane_ekf_nll_matches_aos(rng):
    """The plane-native batched iterated-EKF NLL (the calibrated family's
    s-optimizer loss, ops/pkalman.py::ekf_nll_parallel_planes_batched) must
    agree with the AoS ekf_parallel at EVERY sweep count (n_sweeps = k is
    ekf_parallel's n_iters = k-1: same relinearization schedule), and with
    the sequential EKF at convergence."""
    from jax import vmap

    from eks_tpu.ops.pkalman import ekf_nll_parallel_planes_batched, ekf_parallel

    h, ys, m0, S0, A, Q, r = _nonlinear_problem(rng, T=120)
    N = 3
    ysB = jnp.asarray(
        np.stack([ys + 0.01 * i for i in range(N)]), jnp.float32
    )
    m0B = jnp.asarray(np.stack([m0 * (1 + 0.1 * i) for i in range(N)]), jnp.float32)
    S0B = jnp.asarray(np.tile(S0, (N, 1, 1)), jnp.float32)
    AB = jnp.asarray(np.tile(A, (N, 1, 1)), jnp.float32)
    QB = jnp.asarray(np.tile(Q, (N, 1, 1)), jnp.float32)
    rB = jnp.asarray(np.tile(np.median(r, axis=0), (N, 1)), jnp.float32)
    xB = jnp.asarray(
        np.tile(m0, (N, ys.shape[0], 1)) * 0.5, jnp.float32
    )

    for k in (1, 3, 13):
        ll_plane = ekf_nll_parallel_planes_batched(
            ysB, m0B, S0B, AB, QB, h, rB, xB, n_sweeps=k
        )
        ll_aos = vmap(
            lambda y, m, s, q, xi: ekf_parallel(
                y, m, s, AB[0], q, h, rB[0], n_iters=k - 1, x_init=xi
            ).log_likelihood
        )(ysB, m0B, S0B, QB, xB)
        np.testing.assert_allclose(
            np.asarray(ll_plane), np.asarray(ll_aos), rtol=1e-5
        )

    # at convergence both reach the sequential EKF
    ll_13 = ekf_nll_parallel_planes_batched(
        ysB, m0B, S0B, AB, QB, h, rB, xB, n_sweeps=13
    )
    ll_seq = vmap(
        lambda y, m, s, q: kalman_filter(
            y, m, s, AB[0], q, C=None, r_diag=rB[0], h_fn=h
        ).log_likelihood
    )(ysB, m0B, S0B, QB)
    np.testing.assert_allclose(np.asarray(ll_13), np.asarray(ll_seq), rtol=1e-5)


def test_plane_ekf_nll_warm_start_sits_at_fixed_point(rng):
    """From a good linearization init (the calibrated family feeds the
    triangulated trajectory), core._EKF_OPT_SWEEPS_WARM + 1 sweeps must land
    on the cold-start (12 + 1 sweeps) fixed point — the property that lets
    the optimizer run ~4x fewer relinearization sweeps per Adam iteration."""
    from eks_tpu.core import _EKF_OPT_SWEEPS_WARM
    from eks_tpu.ops.pkalman import ekf_nll_parallel_planes_batched

    h, ys, m0, S0, A, Q, r, xs = _nonlinear_problem(
        rng, T=150, return_states=True
    )
    args = [
        jnp.asarray(a, jnp.float32)[None]
        for a in (ys, m0, S0, A, Q, np.median(r, axis=0))
    ]
    ysB, m0B, S0B, AB, QB, rB = args
    # warm init: the (noisy) true states — the analogue of triangulation
    x_good = jnp.asarray(xs, jnp.float32)[None]
    x_cold = jnp.broadcast_to(m0B[:, None, :], x_good.shape)

    ll_cold = ekf_nll_parallel_planes_batched(
        ysB, m0B, S0B, AB, QB, h, rB, x_cold, n_sweeps=13
    )
    ll_warm = ekf_nll_parallel_planes_batched(
        ysB, m0B, S0B, AB, QB, h, rB, x_good,
        n_sweeps=_EKF_OPT_SWEEPS_WARM + 1,
    )
    np.testing.assert_allclose(
        np.asarray(ll_warm), np.asarray(ll_cold), rtol=1e-6
    )


@pytest.mark.slow  # EKF-plane jvp graph is a ~50s LLVM compile; the
# fixed-point property keeps a fast-tier pin (warm-start test below)
def test_plane_ekf_nll_jvp_matches_finite_difference(rng):
    """The optimizer consumes d(NLL)/d(log s) through jax.jvp of the plane
    EKF loss; pin it against a float64-ish central difference."""
    import jax

    from eks_tpu.ops.pkalman import ekf_nll_parallel_planes_batched

    h, ys, m0, S0, A, Q, r, xs = _nonlinear_problem(
        rng, T=100, return_states=True
    )
    ysB, m0B, S0B, AB, QB = (
        jnp.asarray(a, jnp.float32)[None] for a in (ys, m0, S0, A, Q)
    )
    rB = jnp.asarray(np.median(r, axis=0), jnp.float32)[None]
    xB = jnp.asarray(xs, jnp.float32)[None]

    def loss(s_log):
        ll = ekf_nll_parallel_planes_batched(
            ysB, m0B, S0B, AB, jnp.exp(s_log) * QB, h, rB, xB, n_sweeps=3
        )
        return -ll[0]

    s0 = jnp.asarray(0.4, jnp.float32)
    val, tangent = jax.jvp(loss, (s0,), (jnp.ones_like(s0),))
    eps = 1e-2
    fd = (float(loss(s0 + eps)) - float(loss(s0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(tangent), fd, rtol=2e-2)


@pytest.mark.parametrize(
    "D,O",
    [
        (2, 2),
        # wider plane graphs cost minutes of XLA:CPU LLVM compile; the slow
        # tier keeps the coverage, the fast tier keeps the smallest config
        pytest.param(3, 6, marks=pytest.mark.slow),
        pytest.param(3, 8, marks=pytest.mark.slow),
    ],
)
def test_plane_nll_matches_parallel_filter(rng, D, O):
    """The plane-native constant-R NLL (the s-optimizer loss,
    filter_nll_parallel_planes) must agree with the generic parallel filter
    AND the float64 oracle — in both the SoA-scan and Pallas-kernel layouts."""
    from eks_tpu.ops.pallas_filter import force_pallas_scan
    from eks_tpu.ops.pkalman import filter_nll_parallel_planes

    ys, m0, S0, A, Q, C, r_t = make_problem(rng, T=257, D=D, O=O)
    r = np.median(r_t, axis=0)  # (O,) constant diag, like the optimizer uses
    args = [jnp.asarray(a) for a in (ys, m0, S0, A, Q, C, r)]

    ll_gen = float(kalman_filter_parallel(*args).log_likelihood)
    ll_oracle, *_ = oracle_filter_smoother(ys, m0, S0, A, Q, C, r)

    for pallas in (False, True):
        with force_pallas_scan(pallas):
            ll_pl = float(filter_nll_parallel_planes(*args))
        np.testing.assert_allclose(ll_pl, ll_gen, rtol=1e-5)
        np.testing.assert_allclose(ll_pl, ll_oracle, rtol=1e-4)


def test_plane_nll_jvp_matches_value_and_grad(rng):
    """jax.jvp through the plane-native NLL (what the optimizer consumes)
    must match finite differences of the value."""
    import jax

    from eks_tpu.ops.pkalman import filter_nll_parallel_planes

    ys, m0, S0, A, Q, C, r_t = make_problem(rng, T=200, D=2, O=2)
    r = np.median(r_t, axis=0)
    args = [jnp.asarray(a) for a in (ys, m0, S0, A, C, r)]

    def nll(s_log):
        s = jnp.exp(s_log)
        y, m0_, S0_, A_, C_, r_ = args
        return -filter_nll_parallel_planes(y, m0_, S0_, A_, s * jnp.asarray(Q), C_, r_)

    v, g = jax.jvp(nll, (jnp.asarray(0.3),), (jnp.asarray(1.0),))
    h = 1e-3
    fd = (float(nll(jnp.asarray(0.3 + h))) - float(nll(jnp.asarray(0.3 - h)))) / (2 * h)
    np.testing.assert_allclose(float(g), fd, rtol=5e-2)


@pytest.mark.slow  # ~65s of plane-graph compile; the batched plane path
# keeps a fast-tier pin via test_plane_nll_batched_d3_value_parity
@pytest.mark.parametrize("D,O", [(2, 2)])  # one config: the batched path
# reuses the per-sequence element build and epilogue already covered at
# D=3 by test_plane_nll_matches_parallel_filter; a second config here only
# re-pays ~3 min of XLA:CPU compile for the same code paths
def test_plane_nll_batched_matches_single(rng, D, O):
    """The lane-batched plane NLL (one Pallas kernel for N sequences) must
    agree with the per-sequence plane NLL in both scan layouts, and its
    custom JVP must match finite differences."""
    import jax

    from eks_tpu.ops.pallas_filter import force_pallas_scan
    from eks_tpu.ops.pkalman import (
        filter_nll_parallel_planes,
        filter_nll_parallel_planes_batched,
    )

    N = 5
    probs = [make_problem(rng, T=130, D=D, O=O) for _ in range(N)]
    st = lambda i: jnp.stack([jnp.asarray(p[i]) for p in probs])
    ys, m0, S0, A, Q, C = st(0), st(1), st(2), st(3), st(4), st(5)
    r = jnp.stack([jnp.asarray(np.median(p[6], axis=0)) for p in probs])

    single = np.array(
        [
            float(
                filter_nll_parallel_planes(
                    ys[i], m0[i], S0[i], A[i], Q[i], C[i], r[i]
                )
            )
            for i in range(N)
        ]
    )

    def total_nll(s_log):
        s = jnp.exp(s_log)[:, None, None]
        return -jnp.sum(
            filter_nll_parallel_planes_batched(ys, m0, S0, A, s * Q, C, r)
        )

    x = jnp.zeros(N).at[0].set(0.3).at[1].set(-0.2)
    tan = jnp.ones(N)
    h = 1e-3
    # force_fused_nll(False) pins the STAGED lane-batched Pallas scan (the
    # production fallback for O > 8 / over-budget T) — without it the fused
    # single-kernel path would shadow the staged path's parity coverage here
    from eks_tpu.ops.pallas_nll import force_fused_nll

    for pallas in (False, True):
        with force_pallas_scan(pallas), force_fused_nll(False):
            batched = np.asarray(
                filter_nll_parallel_planes_batched(ys, m0, S0, A, Q, C, r)
            )
            np.testing.assert_allclose(batched, single, rtol=1e-5)
            _, g = jax.jvp(total_nll, (x,), (tan,))
            fd = (float(total_nll(x + h * tan)) - float(total_nll(x - h * tan))) / (
                2 * h
            )
        np.testing.assert_allclose(float(g), fd, rtol=5e-2)


@pytest.mark.parametrize(
    "D,O",
    [(2, 2), pytest.param(3, 8, marks=pytest.mark.slow)],
)
def test_plane_nll_tv_matches_parallel_filter(rng, D, O):
    """The information-form plane NLL for TIME-VARYING diagonal R (the pupil
    optimizer's loss, filter_nll_parallel_planes_tv) must agree with the
    generic parallel filter AND the float64 oracle in both scan layouts."""
    from eks_tpu.ops.pallas_filter import force_pallas_scan
    from eks_tpu.ops.pkalman import filter_nll_parallel_planes_tv

    ys, m0, S0, A, Q, C, r_t = make_problem(rng, T=200, D=D, O=O)
    args = [jnp.asarray(a) for a in (ys, m0, S0, A, Q, C, r_t)]

    ll_gen = float(kalman_filter_parallel(*args).log_likelihood)
    ll_oracle, *_ = oracle_filter_smoother(ys, m0, S0, A, Q, C, r_t)

    for pallas in (False, True):
        with force_pallas_scan(pallas):
            ll_pl = float(filter_nll_parallel_planes_tv(*args))
        np.testing.assert_allclose(ll_pl, ll_gen, rtol=1e-5)
        np.testing.assert_allclose(ll_pl, ll_oracle, rtol=1e-4)


def test_plane_nll_tv_jvp_matches_finite_difference(rng):
    """jax.jvp through the tv plane NLL (what the pupil optimizer consumes)
    must match finite differences."""
    import jax

    from eks_tpu.ops.pkalman import filter_nll_parallel_planes_tv

    ys, m0, S0, A, Q, C, r_t = make_problem(rng, T=150, D=3, O=8)
    args = [jnp.asarray(a) for a in (ys, m0, S0, A, C, r_t)]

    def nll(s_log):
        y, m0_, S0_, A_, C_, r_ = args
        return -filter_nll_parallel_planes_tv(
            y, m0_, S0_, A_, jnp.exp(s_log) * jnp.asarray(Q), C_, r_
        )

    v, g = jax.jvp(nll, (jnp.asarray(0.2),), (jnp.asarray(1.0),))
    h = 1e-3
    fd = (float(nll(jnp.asarray(0.2 + h))) - float(nll(jnp.asarray(0.2 - h)))) / (2 * h)
    np.testing.assert_allclose(float(g), fd, rtol=5e-2)


def test_plane_nll_batched_d3_value_parity(rng):
    """Value-only D=3 coverage of the lane-batched kernel (different plane
    count/tiling than D=2): batched == per-sequence in the Pallas layout.
    The jvp/finite-difference machinery is exercised at D=2 above — this
    pins only the D-dependent plane indexing and tile sizing."""
    from eks_tpu.ops.pallas_filter import force_pallas_scan
    from eks_tpu.ops.pkalman import (
        filter_nll_parallel_planes,
        filter_nll_parallel_planes_batched,
    )

    N, D, O = 3, 3, 6
    probs = [make_problem(rng, T=96, D=D, O=O) for _ in range(N)]
    st = lambda i: jnp.stack([jnp.asarray(p[i]) for p in probs])
    ys, m0, S0, A, Q, C = st(0), st(1), st(2), st(3), st(4), st(5)
    r = jnp.stack([jnp.asarray(np.median(p[6], axis=0)) for p in probs])

    single = np.array(
        [
            float(
                filter_nll_parallel_planes(
                    ys[i], m0[i], S0[i], A[i], Q[i], C[i], r[i]
                )
            )
            for i in range(N)
        ]
    )
    from eks_tpu.ops.pallas_nll import force_fused_nll

    # staged-pinned: keep direct parity coverage of the lane-batched Pallas
    # filter scan (the fused kernel has its own suite in test_pallas_nll.py)
    with force_pallas_scan(True), force_fused_nll(False):
        batched = np.asarray(
            filter_nll_parallel_planes_batched(ys, m0, S0, A, Q, C, r)
        )
    np.testing.assert_allclose(batched, single, rtol=1e-5)
