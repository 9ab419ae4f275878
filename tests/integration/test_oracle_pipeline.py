"""Full-pipeline float64 numpy oracle on real reference data.

Independent re-implementation of the ENTIRE inference chain — ensemble
statistics, s-init heuristic, constant-median-R Adam optimization with the
exact stopping rule, and the time-varying-R final smoother — in plain float64
numpy, then asserted against the product pipeline at the reference's own
parity contract (atol=1e-4, /root/reference/tests/conftest.py:95-101).

The per-filter oracle lives in tests/test_ops_kalman.py; this extends it
end-to-end for one singlecam and one pupil session (VERDICT round-1 item 4).
Oracle gradients are float64 central differences (error ~1e-10, far below
both families' stopping tolerances); the product runs under enable_x64 so
optimizer trajectories are comparable step-for-step.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_DATA, reference_data_available
from tests.test_ops_kalman import oracle_filter_smoother

# slow tier: full-length end-to-end runs (inner gate: -m 'not slow')
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not reference_data_available(), reason="reference data missing"
)]

T_SESSION = 400  # truncated session length (oracle filter is a python loop)


# ----------------------------------------------------------------- #
# oracle building blocks
# ----------------------------------------------------------------- #
def np_ensemble(arr):
    """(M, T, K, 3) [x, y, likelihood] -> median preds (T,K,2),
    confidence-weighted vars (T,K,2), mean conf (T,K). Mirrors
    eks/core.py:54-99 semantics in float64."""
    x, y, lh = arr[..., 0], arr[..., 1], arr[..., 2]
    preds = np.stack([np.nanmedian(x, axis=0), np.nanmedian(y, axis=0)], axis=-1)
    conf = lh.sum(axis=0) / arr.shape[0]
    var = np.stack([np.nanvar(x, axis=0), np.nanvar(y, axis=0)], axis=-1)
    var = var / conf[..., None]
    var = np.nan_to_num(var, nan=1000.0)
    return preds, var, conf


def np_adam(loss_fn, theta0, lr, tol, cap, grad_scale=1.0, fd_h=1e-6):
    """optax.adam trajectory with central-difference gradients and the exact
    stopping rule of core.py:215-237 / ibl_pupil.py:299-318."""
    b1, b2, eps = 0.9, 0.999, 1e-8
    theta = np.asarray(theta0, dtype=np.float64).copy()
    mu = np.zeros_like(theta)
    nu = np.zeros_like(theta)
    prev = np.inf
    for t in range(1, cap + 1):
        loss = loss_fn(theta)
        g = np.zeros_like(theta)
        for i in range(theta.size):
            d = np.zeros_like(theta)
            d[i] = fd_h * max(1.0, abs(theta[i]))
            g[i] = (loss_fn(theta + d) - loss_fn(theta - d)) / (2 * d[i])
        g = g * grad_scale
        mu = b1 * mu + (1 - b1) * g
        nu = b2 * nu + (1 - b2) * g**2
        step = lr * (mu / (1 - b1**t)) / (np.sqrt(nu / (1 - b2**t)) + eps)
        theta = theta - step
        if np.isfinite(prev):
            rel = tol * abs(np.log(max(prev, 1e-12)))
            if abs(loss - prev) < rel + 1e-6:
                break
        prev = loss
    return theta


def _load_session(path, bodyparts=None, T=T_SESSION):
    from eks_tpu.utils import format_data

    dfs, kps = format_data(path)
    if bodyparts is None:
        bodyparts = kps
    M = len(dfs)
    arr = np.zeros((M, T, len(bodyparts), 3))
    for m, df in enumerate(dfs):
        for k, kp in enumerate(bodyparts):
            for d, f in enumerate(["x", "y", "likelihood"]):
                arr[m, :, k, d] = df[f"{kp}_{f}"].to_numpy()[:T]
    return arr, bodyparts


# ----------------------------------------------------------------- #
# singlecam
# ----------------------------------------------------------------- #
def test_singlecam_pipeline_matches_f64_oracle():
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.singlecam import ensemble_kalman_smoother_singlecam

    arr, bodyparts = _load_session(
        f"{REFERENCE_DATA}/ibl-pupil", ["pupil_top_r", "pupil_right_r"]
    )
    s_frames = [(0, 200)]

    # ---------------- oracle ----------------
    preds, evar, conf = np_ensemble(arr)  # (T,K,2) etc.
    means = preds.mean(axis=0)  # centering, quantile=100
    centered = preds - means
    T, K, _ = preds.shape

    s_oracle = np.zeros(K)
    sm_oracle = np.zeros((T, K, 2))
    pv_oracle = np.zeros((T, K, 2))
    for k in range(K):
        yk = centered[:, k, :]
        S0 = np.diag(np.nanvar(yk, axis=0))
        A = Q = C = np.eye(2)
        m0 = np.zeros(2)

        # s init: std of ensemble-variance diffs, 5 dp (eks/core.py:104-133)
        g = round(float(np.nanstd(np.diff(evar[:2000, k, :], axis=0))), 5)
        if not (np.isfinite(g) and g > 0):
            g = 2.0

        # loss: cropped frames, constant median-R floored at 1e-4
        lo, hi = s_frames[0]
        y_loss = yk[lo:hi]
        r_const = np.clip(
            np.nanmedian(np.clip(evar[lo:hi, k, :], 1e-12, None), axis=0),
            1e-4, np.inf,
        )

        def nll(theta):
            s = np.exp(np.clip(theta[0], -8.0, 8.0))
            ll, *_ = oracle_filter_smoother(
                y_loss, m0, S0, A, s * Q, C, r_const
            )
            return -ll if np.isfinite(ll) else 1e12

        theta = np_adam(
            nll, [np.log(np.clip(g, 1e-6, 1e3))],
            lr=1.0, tol=1e-2, cap=300, grad_scale=0.25,
        )
        s_k = float(np.exp(np.clip(theta[0], -8.0, 8.0)))
        s_oracle[k] = s_k

        _, _, _, sm, sP = oracle_filter_smoother(
            yk, m0, S0, A, s_k * Q, C, np.clip(evar[:, k, :], 1e-12, None)
        )
        sm_oracle[:, k] = sm + means[k]
        pv_oracle[:, k, 0] = sP[:, 0, 0]
        pv_oracle[:, k, 1] = sP[:, 1, 1]

    # ---------------- product ----------------
    with jax.enable_x64():
        ma = MarkerArray(arr[:, None], data_fields=["x", "y", "likelihood"])
        df, s_finals = ensemble_kalman_smoother_singlecam(
            ma, bodyparts, s_frames=s_frames
        )

    np.testing.assert_allclose(s_finals, s_oracle, rtol=1e-4)
    for k, bp in enumerate(bodyparts):
        blk = df["ensemble-kalman_tracker"][bp]
        np.testing.assert_allclose(
            blk[["x", "y"]].to_numpy(), sm_oracle[:, k], rtol=0, atol=1e-4
        )
        np.testing.assert_allclose(
            blk[["x_posterior_var", "y_posterior_var"]].to_numpy(),
            pv_oracle[:, k], rtol=0, atol=1e-4,
        )
        np.testing.assert_allclose(
            blk[["x_ens_var", "y_ens_var"]].to_numpy(),
            evar[:, k], rtol=0, atol=1e-4,
        )


# ----------------------------------------------------------------- #
# ibl-pupil
# ----------------------------------------------------------------- #
def test_pupil_pipeline_matches_f64_oracle():
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.ibl_pupil import (
        BODYPART_LIST,
        PUPIL_C,
        ensemble_kalman_smoother_ibl_pupil,
        get_pupil_diameter,
        get_pupil_location,
    )

    arr, _ = _load_session(f"{REFERENCE_DATA}/ibl-pupil", BODYPART_LIST)
    s_frames = [(0, 300)]

    # ---------------- oracle ----------------
    preds, evar, conf = np_ensemble(arr)
    T = preds.shape[0]
    flat = preds.reshape(T, -1)
    keys = [f"{kp}_{c}" for kp in BODYPART_LIST for c in ["x", "y"]]
    named = {k: flat[:, i] for i, k in enumerate(keys)}
    diam = get_pupil_diameter(named)
    loc = get_pupil_location(named)
    mean_x, mean_y = float(loc[:, 0].mean()), float(loc[:, 1].mean())
    dvar = float(np.var(diam))
    xvar = float(np.var(loc[:, 0] - mean_x))
    yvar = float(np.var(loc[:, 1] - mean_y))

    y_obs = flat.copy()
    y_obs[:, 0::2] -= mean_x
    y_obs[:, 1::2] -= mean_y
    m0 = np.array([diam.mean(), 0.0, 0.0])
    S0 = np.diag([np.nanvar(diam), xvar, yvar])
    r_all = np.clip(evar.reshape(T, -1), 1e-12, None)

    lo, hi = s_frames[0]
    y_loss, r_loss = y_obs[lo:hi], r_all[lo:hi]
    eps = 1e-3

    def model(s_d, s_c):
        A = np.diag([s_d, s_c, s_c])
        Q = np.diag(
            [dvar * (1 - s_d**2), xvar * (1 - s_c**2), yvar * (1 - s_c**2)]
        )
        return A, Q

    def nll(u):
        s = 1 / (1 + np.exp(-np.asarray(u))) * (1 - 2 * eps) + eps
        A, Q = model(s[0], s[1])
        ll, *_ = oracle_filter_smoother(y_loss, m0, S0, A, Q, PUPIL_C, r_loss)
        return -ll if np.isfinite(ll) else 1e12

    s0 = np.array([0.99, 0.98])
    u = np_adam(nll, np.log(s0 / (1 - s0)), lr=5e-3, tol=1e-6, cap=5000)
    s_star = 1 / (1 + np.exp(-u)) * (1 - 2 * eps) + eps

    A, Q = model(s_star[0], s_star[1])
    _, _, _, sm, sP = oracle_filter_smoother(y_obs, m0, S0, A, Q, PUPIL_C, r_all)
    y_m = sm @ PUPIL_C.T
    y_v = np.einsum("ij,tjl,ml->tim", PUPIL_C, sP, PUPIL_C)

    # ---------------- product ----------------
    with jax.enable_x64():
        ma = MarkerArray(arr[:, None], data_fields=["x", "y", "likelihood"])
        df, s_finals = ensemble_kalman_smoother_ibl_pupil(
            ma, BODYPART_LIST, s_frames=s_frames
        )

    np.testing.assert_allclose(s_finals, s_star, atol=1e-5)

    # output packing quirks (block order [top,right,bottom,left], posterior
    # var at (i,i)/(i+1,i+1)) are part of the oracle assertion
    key_pairs = [(0, 1), (4, 5), (2, 3), (6, 7)]
    for i, bp in enumerate(BODYPART_LIST):
        blk = df["ensemble-kalman_tracker"][bp]
        jx, jy = key_pairs[i]
        np.testing.assert_allclose(
            blk["x"].to_numpy(), y_m[:, jx] + mean_x, rtol=0, atol=1e-4
        )
        np.testing.assert_allclose(
            blk["y"].to_numpy(), y_m[:, jy] + mean_y, rtol=0, atol=1e-4
        )
        np.testing.assert_allclose(
            blk["x_posterior_var"].to_numpy(), y_v[:, i, i], rtol=0, atol=1e-4
        )
        np.testing.assert_allclose(
            blk["y_posterior_var"].to_numpy(),
            y_v[:, i + 1, i + 1], rtol=0, atol=1e-4,
        )


# ----------------------------------------------------------------- #
# multicam oracle building blocks
# ----------------------------------------------------------------- #
def _load_multicam_session(path, camera_names, bodyparts=None, T=T_SESSION):
    from eks_tpu.marker_array import input_dfs_to_markerArray
    from eks_tpu.utils import format_data

    dfs, kps = format_data(path, camera_names=camera_names)
    if bodyparts is None:
        bodyparts = kps
    ma = input_dfs_to_markerArray(dfs, bodyparts, camera_names)
    arr = np.asarray(ma.array, dtype=np.float64)[:, :, :T]  # (M, C, T, K, 3)
    return arr, bodyparts


def np_ensemble_multicam(arr):
    """Per-camera ensemble: (M, C, T, K, 3) -> preds (C, T, K, 2),
    confidence-weighted vars (C, T, K, 2)."""
    preds = np.zeros(arr.shape[1:4] + (2,))
    evar = np.zeros_like(preds)
    for c in range(arr.shape[1]):
        p, v, _ = np_ensemble(arr[:, c])
        preds[c], evar[c] = p, v
    return preds, evar


def np_center_multicam(preds, variances, quantile):
    """center_predictions oracle (eks/utils.py:293-365): variance-quantile
    frame filter with global min-frames truncation + good-frame centering.
    preds/variances are (C, T, K, 2)."""
    max_vars = variances.max(axis=(0, 3))  # (T, K)
    thresholds = np.percentile(max_vars, quantile, axis=0)
    valid = max_vars <= thresholds
    min_frames = int(valid.sum(axis=0).min())
    C, _, K, _ = preds.shape
    good = np.zeros((C, min_frames, K, 2))
    for k in range(K):
        idx = np.where(valid[:, k])[0][:min_frames]
        good[:, :, k] = preds[:, idx, k]
    means = good.mean(axis=1, keepdims=True)  # (C, 1, K, 2)
    return valid, preds - means, good - means, means


def np_pca_fit(Xg, n_components):
    """sklearn-convention PCA oracle: mean, SVD, svd_flip (sign of each
    component's max-|loading| made positive; stats._pca_fit_batched)."""
    mean = Xg.mean(axis=0)
    _, _, vt = np.linalg.svd(Xg - mean, full_matrices=False)
    signs = np.sign(vt[np.arange(vt.shape[0]), np.argmax(np.abs(vt), axis=1)])
    vt = vt * signs[:, None]
    return mean, vt[:n_components]


def _stack_views(arr_c):
    """(C, T, K, 2) -> (K, T, 2C) per-frame [cam0_x, cam0_y, cam1_x, ...]."""
    return arr_c.transpose(2, 1, 0, 3).reshape(arr_c.shape[2], arr_c.shape[1], -1)


def _s_init(evar_k):
    g = round(float(np.nanstd(np.diff(evar_k[:2000], axis=0))), 5)
    return g if (np.isfinite(g) and g > 0) else 2.0


# ----------------------------------------------------------------- #
# multicam linear (PCA subspace) — VERDICT r2 item 6a
# ----------------------------------------------------------------- #
def test_multicam_linear_pipeline_matches_f64_oracle():
    """Independent f64 oracle of the FULL linear multicam chain — per-camera
    ensemble -> quantile centering -> PCA init (C = componentsT, Q =
    normalized lag-1 diff covariance) -> constant-median-R Adam s-optimization
    -> tv-R smoothing -> reprojection with the posterior+ensemble-var output
    quirk — against the product path (reference chain being mirrored:
    eks/multicam_smoother.py:279-551)."""
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.multicam import ensemble_kalman_smoother_multicam

    cams = ["top", "bot"]
    bodyparts = ["paw1LH", "paw2LF"]
    arr, _ = _load_multicam_session(
        f"{REFERENCE_DATA}/mirror-mouse-separate", cams, bodyparts
    )
    s_frames = [(0, 200)]
    n_latent = 3

    # ---------------- oracle ----------------
    preds, evar = np_ensemble_multicam(arr)  # (C, T, K, 2)
    valid, centered, good, means = np_center_multicam(preds, evar, 50.0)
    X_all = _stack_views(centered)  # (K, T, 2C)
    X_good = _stack_views(good)
    ev_st = _stack_views(evar)  # (K, T, 2C)
    K_, T, O = X_all.shape

    s_oracle = np.zeros(K_)
    ym_oracle = np.zeros((K_, T, O))
    yv_oracle = np.zeros((K_, T, O))
    lo, hi = s_frames[0]
    for k in range(K_):
        pca_mean, comps = np_pca_fit(X_good[k], n_latent)
        pcs_all = (X_all[k] - pca_mean) @ comps.T
        good_pcs = pcs_all[valid[:, k]]
        C_k = comps.T  # (2C, L)
        m0 = np.zeros(n_latent)
        S0 = np.diag(np.var(good_pcs, axis=0))
        d = np.diff(good_pcs, axis=0)
        cov = np.atleast_2d(np.cov(d.T))
        Q = cov / np.max(np.abs(cov))
        A = np.eye(n_latent)

        # obs are the CENTERED stacks (PCA mean NOT subtracted — reference
        # quirk, eks/multicam_smoother.py:429-431)
        yk = X_all[k]
        y_loss = yk[lo:hi]
        r_const = np.clip(
            np.nanmedian(np.clip(ev_st[k, lo:hi], 1e-12, None), axis=0),
            1e-4, np.inf,
        )

        def nll(theta):
            s = np.exp(np.clip(theta[0], -8.0, 8.0))
            ll, *_ = oracle_filter_smoother(y_loss, m0, S0, A, s * Q, C_k, r_const)
            return -ll if np.isfinite(ll) else 1e12

        g = _s_init(ev_st[k])
        theta = np_adam(
            nll, [np.log(np.clip(g, 1e-6, 1e3))],
            lr=1.0, tol=1e-2, cap=300, grad_scale=0.25,
        )
        s_k = float(np.exp(np.clip(theta[0], -8.0, 8.0)))
        s_oracle[k] = s_k

        _, _, _, sm, sP = oracle_filter_smoother(
            yk, m0, S0, A, s_k * Q, C_k, np.clip(ev_st[k], 1e-12, None)
        )
        ym_oracle[k] = sm @ C_k.T
        yv_oracle[k] = np.einsum("oj,tjl,ol->to", C_k, sP, C_k)

    # ---------------- product (general path, forced by s_frames) -----------
    with jax.enable_x64():
        ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])
        camera_dfs, s_finals, _df3d = ensemble_kalman_smoother_multicam(
            ma, bodyparts, cams, s_frames=s_frames, n_latent=n_latent
        )

    np.testing.assert_allclose(s_finals, s_oracle, rtol=1e-4)
    for c in range(len(cams)):
        for k, bp in enumerate(bodyparts):
            blk = camera_dfs[c]["ensemble-kalman_tracker"][bp]
            xi, yi = 2 * c, 2 * c + 1
            np.testing.assert_allclose(
                blk["x"].to_numpy(),
                ym_oracle[k, :, xi] + means[c, 0, k, 0],
                rtol=0, atol=1e-4,
            )
            np.testing.assert_allclose(
                blk["y"].to_numpy(),
                ym_oracle[k, :, yi] + means[c, 0, k, 1],
                rtol=0, atol=1e-4,
            )
            # posterior var + ensemble var (deliberate reference quirk,
            # eks/multicam_smoother.py:509-510)
            np.testing.assert_allclose(
                blk["x_posterior_var"].to_numpy(),
                yv_oracle[k, :, xi] + ev_st[k, :, xi],
                rtol=0, atol=1e-4,
            )
            np.testing.assert_allclose(
                blk["y_posterior_var"].to_numpy(),
                yv_oracle[k, :, yi] + ev_st[k, :, yi],
                rtol=0, atol=1e-4,
            )
            np.testing.assert_allclose(
                blk[["x_ens_var", "y_ens_var"]].to_numpy(),
                evar[c, :, k], rtol=0, atol=1e-4,
            )


# ----------------------------------------------------------------- #
# multicam calibrated (nonlinear EKF) — VERDICT r2 item 6b
# ----------------------------------------------------------------- #
def np_rodrigues(rvec):
    rvec = np.asarray(rvec, dtype=np.float64)
    theta = np.linalg.norm(rvec)
    if theta < 1e-12:
        a = rvec
        Ksk = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        return np.eye(3) + Ksk
    a = rvec / theta
    Ksk = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(theta) * Ksk + (1 - np.cos(theta)) * (Ksk @ Ksk)


def _np_dist_terms(x, y, d):
    """OpenCV rational + tangential + thin-prism distortion of normalized
    coords; d is the zero-padded 14-vector [k1,k2,p1,p2,k3,k4..k6,s1..s4,..]."""
    k1, k2, p1, p2, k3, k4, k5, k6, s1, s2, s3, s4 = d[:12]
    r2 = x * x + y * y
    r4, r6 = r2 * r2, r2 * r2 * r2
    radial = (1 + k1 * r2 + k2 * r4 + k3 * r6) / (1 + k4 * r2 + k5 * r4 + k6 * r6)
    x_tan = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    y_tan = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    xd = x * radial + x_tan + s1 * r2 + s2 * r4
    yd = y * radial + y_tan + s3 * r2 + s4 * r4
    return xd, yd


class _NpCam:
    """f64 numpy oracle of one calibrated camera (projection, undistort,
    extrinsics) parsed straight from the Anipose TOML section."""

    def __init__(self, sec):
        self.K = np.asarray(sec["matrix"], dtype=np.float64)
        d = np.asarray(sec["distortions"], dtype=np.float64).ravel()
        self.d = np.zeros(14)
        self.d[: d.shape[0]] = d
        self.rvec = np.asarray(sec["rotation"], dtype=np.float64).ravel()
        self.tvec = np.asarray(sec["translation"], dtype=np.float64).ravel()
        self.R = np_rodrigues(self.rvec)

    def project(self, pts):  # (..., 3) -> (..., 2)
        Xc = pts @ self.R.T + self.tvec
        x, y = Xc[..., 0] / Xc[..., 2], Xc[..., 1] / Xc[..., 2]
        xd, yd = _np_dist_terms(x, y, self.d)
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy, skew = self.K[0, 2], self.K[1, 2], self.K[0, 1]
        return np.stack([fx * xd + skew * yd + cx, fy * yd + cy], axis=-1)

    def undistort(self, pts):  # pixels (..., 2) -> normalized (..., 2)
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy, skew = self.K[0, 2], self.K[1, 2], self.K[0, 1]
        yd = (pts[..., 1] - cy) / fy
        xd = (pts[..., 0] - cx - skew * yd) / fx
        x, y = xd, yd
        for _ in range(5):  # cv2's 5-iteration compensation (camera.py:159)
            k1, k2, p1, p2, k3, k4, k5, k6, s1, s2, s3, s4 = self.d[:12]
            r2 = x * x + y * y
            r4, r6 = r2 * r2, r2 * r2 * r2
            inv_rad = (1 + k4 * r2 + k5 * r4 + k6 * r6) / (
                1 + k1 * r2 + k2 * r4 + k3 * r6
            )
            dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x) + s1 * r2 + s2 * r4
            dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y + s3 * r2 + s4 * r4
            x, y = (xd - dx) * inv_rad, (yd - dy) * inv_rad
        return np.stack([x, y], axis=-1)

    def extrinsics(self):
        return np.concatenate([self.R, self.tvec.reshape(3, 1)], axis=1)


def np_dlt(und, extr):
    """SVD-based DLT oracle: (C, N, 2) undistorted normalized coords +
    (C, 3, 4) extrinsics -> (N, 3). Independent method from the product's
    normal-matrix inverse iteration (geometry/triangulate.py)."""
    C, N, _ = und.shape
    out = np.zeros((N, 3))
    for n in range(N):
        rows = []
        for c in range(C):
            P = extr[c]
            rows.append(und[c, n, 0] * P[2] - P[0])
            rows.append(und[c, n, 1] * P[2] - P[1])
        A = np.stack(rows)
        _, _, vt = np.linalg.svd(A)
        v = vt[-1]
        out[n] = v[:3] / v[3]
    return out


def oracle_ekf_filter_smoother(ys, m0, S0, A, Q, h, r, fd_h=1e-6):
    """Sequential EKF (relinearized at each predicted mean, FD Jacobians)
    + linear-A RTS backward pass, float64. Matches the fixed point of the
    product's iterated parallel EKF (ops/pkalman.py::ekf_parallel).

    Every innovation/gain solve adds the reference substrate's absolute
    1e-9 diagonal boost (dynamax psd_solve, which the reference's
    extended_kalman_smoother rides; ops/linalg.py::psd_solve mirrors it) —
    on the fly session's tiny 3D world units the boost shifts the RTS gain
    by ~1e-5 relative, well above the atol=1e-4 pixel contract."""
    T, O = ys.shape
    D = m0.shape[0]
    r = np.broadcast_to(r, (T, O))
    ll = 0.0
    m_pred, P_pred = m0.astype(np.float64), S0.astype(np.float64)
    ms = np.zeros((T, D))
    Ps = np.zeros((T, D, D))
    for t in range(T):
        H = np.zeros((O, D))
        for i in range(D):
            dv = np.zeros(D)
            dv[i] = fd_h * max(1.0, abs(m_pred[i]))
            H[:, i] = (h(m_pred + dv) - h(m_pred - dv)) / (2 * dv[i])
        R = np.diag(r[t])
        S = H @ P_pred @ H.T + R
        resid = ys[t] - h(m_pred)
        chol = np.linalg.cholesky(S)
        z = np.linalg.solve(chol, resid)
        ll += (
            -0.5 * z @ z
            - np.log(np.diag(chol)).sum()
            - 0.5 * O * np.log(2 * np.pi)
        )
        Kg = np.linalg.solve(S + 1e-9 * np.eye(O), H @ P_pred).T
        m_filt = m_pred + Kg @ resid
        P_filt = P_pred - Kg @ S @ Kg.T
        ms[t], Ps[t] = m_filt, P_filt
        m_pred = A @ m_filt
        P_pred = A @ P_filt @ A.T + Q
    sm = ms.copy()
    sP = Ps.copy()
    for t in range(T - 2, -1, -1):
        m_pred = A @ ms[t]
        P_pred = Q + A @ Ps[t] @ A.T
        G = np.linalg.solve(P_pred + 1e-9 * np.eye(D), A @ Ps[t]).T
        sm[t] = ms[t] + G @ (sm[t + 1] - m_pred)
        sP[t] = Ps[t] + G @ (sP[t + 1] - P_pred) @ G.T
    return ll, ms, Ps, sm, sP


def test_multicam_calibrated_pipeline_matches_f64_oracle():
    """Independent f64 oracle of the FULL calibrated chain — per-camera
    ensemble -> undistort + SVD-DLT triangulation -> geometric MAD init ->
    relinearized sequential-EKF s-optimization on raw 2D observations ->
    tv-R EKF smoothing -> projection reprojection with FD-Jacobian
    covariance (camera-0 ensemble-var quirk included) — against the product
    path (reference chain: eks/multicam_smoother.py:279-551 nonlinear arm,
    :600-650 init, :862-946 projection/reprojection)."""
    import tomllib

    from eks_tpu.geometry import CameraGroup
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.multicam import ensemble_kalman_smoother_multicam

    data = f"{REFERENCE_DATA}/fly"
    with open(f"{data}/calibration.toml", "rb") as f:
        calib = tomllib.load(f)
    cam_secs = [calib[k] for k in sorted(k for k in calib if k.startswith("cam"))]
    np_cams = [_NpCam(sec) for sec in cam_secs]
    cam_names = [str(sec["name"]) for sec in cam_secs]

    T_cal = 300
    bodyparts = ["L1A", "R1A"]
    arr, _ = _load_multicam_session(data, cam_names, bodyparts, T=T_cal)
    M, C, T, K_, _ = arr.shape
    s_frames = [(0, 150)]

    # ---------------- oracle ----------------
    preds, evar = np_ensemble_multicam(arr)  # (C, T, K, 2)
    ev_st = _stack_views(evar)  # (K, T, 2C)
    y_st = _stack_views(preds)  # raw (uncentered) obs — nonlinear-path quirk

    # triangulate every (model, keypoint, frame), then average over models
    extr = np.stack([c.extrinsics() for c in np_cams])
    tri = np.zeros((M, K_, T, 3))
    for m in range(M):
        for k in range(K_):
            und = np.stack(
                [np_cams[c].undistort(arr[m, c, :, k, :2]) for c in range(C)]
            )
            tri[m, k] = np_dlt(und, extr)
    ys_3d = tri.mean(axis=0)  # (K, T, 3)

    def h_all(x):
        return np.concatenate([cam.project(x) for cam in np_cams])

    s_oracle = np.zeros(K_)
    inits = []
    lo, hi = s_frames[0]
    for k in range(K_):
        # geometric init (multicam.py::initialize_kalman_filter_geometric)
        m0 = ys_3d[k, :10].mean(axis=0)
        S0 = np.diag(np.nanvar(ys_3d[k], axis=0) + 1e-4)
        A = np.eye(3)
        dx = np.diff(ys_3d[k], axis=0)
        med = np.median(dx, axis=0, keepdims=True)
        mad = np.median(np.abs(dx - med), axis=0) + 1e-12
        Q = np.diag(np.maximum((1.4826 * mad) ** 2, 1e-8))
        inits.append((m0, S0, A, Q))

        yk = y_st[k]
        y_loss = yk[lo:hi]
        r_const = np.clip(
            np.nanmedian(np.clip(ev_st[k, lo:hi], 1e-12, None), axis=0),
            1e-4, np.inf,
        )

        def nll(theta):
            s = np.exp(np.clip(theta[0], -8.0, 8.0))
            ll, *_ = oracle_ekf_filter_smoother(
                y_loss, m0, S0, A, s * Q, h_all, r_const
            )
            return -ll if np.isfinite(ll) else 1e12

        g = _s_init(ev_st[k])
        theta = np_adam(
            nll, [np.log(np.clip(g, 1e-6, 1e3))],
            lr=1.0, tol=1e-2, cap=300, grad_scale=0.25,
        )
        s_oracle[k] = float(np.exp(np.clip(theta[0], -8.0, 8.0)))

    # ---------------- product (general path, forced by s_frames) -----------
    with jax.enable_x64():
        ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])
        camgroup = CameraGroup.load(f"{data}/calibration.toml")
        camera_dfs, s_finals, df_3d = ensemble_kalman_smoother_multicam(
            ma, bodyparts, cam_names, s_frames=s_frames, camgroup=camgroup
        )

    # optimizer parity: FD-Jacobian sequential-EKF Adam vs the product's
    # autodiff parallel-EKF Adam land on the same optimum to 1e-4
    np.testing.assert_allclose(s_finals, s_oracle, rtol=1e-4)

    # chain parity AT THE SAME FIXED POINT: the downstream pixel asserts run
    # the oracle smoother at the PRODUCT's s (an s mismatch of 1e-4 rel —
    # allowed above — already moves pixels by ~3e-3, swamping atol=1e-4; the
    # xy/var contract tests the smoother+projection chain given s, the s
    # contract tests the optimizer)
    proj_xy = np.zeros((C, K_, T, 2))
    proj_var = np.zeros((C, K_, T, 2))
    for k in range(K_):
        m0, S0, A, Q = inits[k]
        yk = y_st[k]
        _, _, _, sm, sP = oracle_ekf_filter_smoother(
            yk, m0, S0, A, float(s_finals[k]) * Q, h_all,
            np.clip(ev_st[k], 1e-12, None),
        )
        for c in range(C):
            proj_xy[c, k] = np_cams[c].project(sm)
            # FD Jacobian of the per-camera head, cov2d = J V J^T; ensemble
            # var of CAMERA 0 added for every camera (reference quirk,
            # eks/multicam_smoother.py:456-461 + :943-944)
            for t in range(T):
                J = np.zeros((2, 3))
                for i in range(3):
                    dv = np.zeros(3)
                    dv[i] = 1e-6 * max(1.0, abs(sm[t, i]))
                    J[:, i] = (
                        np_cams[c].project(sm[t] + dv)
                        - np_cams[c].project(sm[t] - dv)
                    ) / (2 * dv[i])
                cov2d = J @ sP[t] @ J.T
                proj_var[c, k, t, 0] = cov2d[0, 0] + ev_st[k, t, 0]
                proj_var[c, k, t, 1] = cov2d[1, 1] + ev_st[k, t, 1]
    for c in range(C):
        for k, bp in enumerate(bodyparts):
            blk = camera_dfs[c]["ensemble-kalman_tracker"][bp]
            np.testing.assert_allclose(
                blk[["x", "y"]].to_numpy(), proj_xy[c, k], rtol=0, atol=1e-4
            )
            np.testing.assert_allclose(
                blk[["x_posterior_var", "y_posterior_var"]].to_numpy(),
                proj_var[c, k], rtol=0, atol=1e-4,
            )
