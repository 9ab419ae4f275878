"""Multicam smoother: inflation rules, n_latent sweep, both paths, e2e."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from eks_tpu.marker_array import MarkerArray
from eks_tpu.models.multicam import (
    OUTPUT_LABELS,
    ensemble_kalman_smoother_multicam,
    fit_eks_mirrored_multicam,
    fit_eks_multicam,
    inflate_variance,
    initialize_kalman_filter_geometric,
    initialize_kalman_filter_pca,
    project_3d_covariance_to_2d,
    triangulate_3d_models,
)
from tests.conftest import REFERENCE_DATA, reference_data_available

KPS = ["kp0", "kp1"]
CAMS = ["alpha", "beta"]


def make_multicam_array(rng, M=4, C=2, T=100, K=2, jitter=0.3):
    arr = np.zeros((M, C, T, K, 3))
    base = rng.normal(size=(1, C, T, K, 2)).cumsum(axis=2) * 0.3 + 40
    arr[..., :2] = base + rng.normal(size=(M, C, T, K, 2)) * jitter
    arr[..., 2] = rng.uniform(0.8, 1.0, size=(M, C, T, K))
    return MarkerArray(arr, data_fields=["x", "y", "likelihood"])


@pytest.mark.parametrize("inflate", [False, True])
def test_linear_smoother_runs(rng, inflate):
    ma = make_multicam_array(rng)
    dfs, s, df3d = ensemble_kalman_smoother_multicam(
        ma, KPS, CAMS, smooth_param=5.0, inflate_vars=inflate, n_latent=3
    )
    assert len(dfs) == 2
    for df in dfs:
        assert df.shape == (100, 2 * 9)
        coords = df["ensemble-kalman_tracker"]["kp0"].columns.tolist()
        assert coords == OUTPUT_LABELS
        assert np.isfinite(df.to_numpy()).all()
    assert len(s) == 2
    assert df3d.shape == (100, 2 * 6)


def test_fused_linear_path_matches_host_path(rng):
    """The fused device prep/packaging path (taken automatically for the
    plain linear family) must match the general host path. The host path is
    forced with a no-op s_frames span, which disables the fused gate without
    changing which frames the optimizer sees."""
    ma = make_multicam_array(rng, M=5, C=2, T=300, K=4)
    names = ["kp0", "kp1", "kp2", "kp3"]
    dfs_f, s_f, d3_f = ensemble_kalman_smoother_multicam(
        ma, names, CAMS, inflate_vars=False, n_latent=3
    )
    dfs_h, s_h, d3_h = ensemble_kalman_smoother_multicam(
        ma, names, CAMS, inflate_vars=False, n_latent=3, s_frames=[(0, 300)]
    )
    np.testing.assert_allclose(s_f, s_h, rtol=1e-4)
    for df_f, df_h in zip(dfs_f, dfs_h):
        np.testing.assert_allclose(
            df_f.to_numpy(), df_h.to_numpy(), rtol=0, atol=1e-4
        )
    np.testing.assert_allclose(
        d3_f.to_numpy(), d3_h.to_numpy(), rtol=0, atol=1e-4
    )


def test_fused_linear_path_quantile_filter(rng):
    """Fused path with a strict variance quantile (50%) still matches the
    host path — exercises the masked-SVD PCA and traced good-frame counts."""
    ma = make_multicam_array(rng, M=5, C=2, T=200, K=3, jitter=0.5)
    names = ["kp0", "kp1", "kp2"]
    dfs_f, s_f, _ = ensemble_kalman_smoother_multicam(
        ma, names, CAMS, inflate_vars=False, n_latent=2, quantile_keep_pca=50
    )
    dfs_h, s_h, _ = ensemble_kalman_smoother_multicam(
        ma, names, CAMS, inflate_vars=False, n_latent=2,
        quantile_keep_pca=50, s_frames=[(0, 200)],
    )
    np.testing.assert_allclose(s_f, s_h, rtol=1e-4)
    for df_f, df_h in zip(dfs_f, dfs_h):
        np.testing.assert_allclose(
            df_f.to_numpy(), df_h.to_numpy(), rtol=0, atol=1e-4
        )


def test_near_duplicate_seeds_small_variance(rng):
    # near-identical seeds -> tiny ensemble variance in outputs
    ma = make_multicam_array(rng, jitter=1e-4)
    dfs, _, _ = ensemble_kalman_smoother_multicam(ma, KPS, CAMS, smooth_param=2.0)
    ens_var = dfs[0].xs("x_ens_var", level="coords", axis=1).to_numpy()
    assert np.nanmedian(ens_var) < 1e-4


@pytest.mark.parametrize("n_latent", [1, 2, 3])
def test_n_latent_sweep(rng, n_latent):
    ma = make_multicam_array(rng)
    dfs, s, _ = ensemble_kalman_smoother_multicam(
        ma, KPS, CAMS, smooth_param=3.0, n_latent=n_latent
    )
    assert np.isfinite(dfs[0].to_numpy()).all()


# ------------------------- inflate_variance ------------------------- #
def test_inflate_variance_truth_table():
    N = 4
    v = np.ones((N, 6))
    maha = {
        0: np.array([[10.0], [1.0], [1.0], [1.0]]),
        1: np.array([[1.0], [6.0], [1.0], [1.0]]),
        2: np.array([[1.0], [1.0], [1.0], [1.0]]),
    }
    out, inflated = inflate_variance(v, maha, threshold=5.0, scalar=10.0)
    assert inflated
    np.testing.assert_array_equal(out[0], [10, 10, 1, 1, 1, 1])
    np.testing.assert_array_equal(out[1], [1, 1, 10, 10, 1, 1])
    np.testing.assert_array_equal(out[2], np.ones(6))


def test_inflate_variance_two_view_whole_row():
    v = np.ones((2, 4))
    maha = {0: np.array([[9.0], [1.0]]), 1: np.array([[1.0], [1.0]])}
    out, inflated = inflate_variance(v, maha)
    # with 2 views, one flagged view inflates the entire row
    np.testing.assert_array_equal(out[0], [10, 10, 10, 10])
    np.testing.assert_array_equal(out[1], np.ones(4))
    assert inflated


def test_inflate_variance_no_op():
    v = np.ones((3, 4))
    maha = {0: np.ones((3, 1)), 1: np.ones((3, 1))}
    out, inflated = inflate_variance(v, maha)
    assert not inflated
    np.testing.assert_array_equal(out, v)


def test_inflate_variance_needs_two_views():
    with pytest.raises(AssertionError):
        inflate_variance(np.ones((2, 2)), {0: np.ones((2, 1))})


# ------------------------- KF inits ------------------------- #
def test_initialize_kalman_filter_pca(rng):
    good_pcs = [rng.normal(size=(50, 3)) for _ in range(2)]

    class FakePCA:
        def __init__(self):
            self.components_ = rng.normal(size=(3, 4))

    pcas = [FakePCA(), FakePCA()]
    m0s, S0s, As, Qs, Cs = initialize_kalman_filter_pca(good_pcs, pcas, 3)
    assert np.asarray(m0s).shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(As)[0], np.eye(3))
    np.testing.assert_allclose(
        np.asarray(Cs)[0], pcas[0].components_.T, rtol=1e-6
    )
    Q = np.asarray(Qs)[0]
    assert np.abs(Q).max() == pytest.approx(1.0)  # normalized by max |cov|
    S0 = np.asarray(S0s)[0]
    assert np.allclose(S0, np.diag(np.diagonal(S0)))


def test_initialize_kalman_filter_geometric(rng):
    ys = rng.normal(size=(2, 60, 3)).cumsum(axis=1)
    m0s, S0s, As, Qs, Cs = initialize_kalman_filter_geometric(ys)
    np.testing.assert_allclose(np.asarray(m0s), ys[:, :10].mean(axis=1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(As)[0], np.eye(3))
    np.testing.assert_array_equal(np.asarray(Cs)[1], np.eye(3))
    assert (np.diagonal(np.asarray(Qs), axis1=1, axis2=2) >= 1e-8).all()


# ------------------- nonlinear-path helpers (mocked rig) ------------------- #
def _make_group(rng, n_cams=2):
    from eks_tpu.geometry import Camera, CameraGroup

    cams = []
    for c in range(n_cams):
        cams.append(
            Camera(
                name=f"cam{c}",
                matrix=np.array([[500.0, 0, 200], [0, 500.0, 150], [0, 0, 1]]),
                dist=np.zeros(5),
                rvec=rng.normal(size=3) * 0.2,
                tvec=np.array([0.3 * c, 0.0, 3.0]),
            )
        )
    return CameraGroup(cams)


def test_triangulate_3d_models_shape_and_recovery(rng):
    import jax

    with jax.enable_x64():
        group = _make_group(rng)
        M, C, T, K = 2, 2, 10, 3
        X = rng.normal(size=(T, K, 3)) * 0.2  # world points
        arr = np.zeros((M, C, T, K, 3))
        for c, cam in enumerate(group.cameras):
            uv = np.asarray(cam.projection_fn()(jnp.asarray(X.reshape(-1, 3))))
            arr[:, c, :, :, :2] = uv.reshape(T, K, 2)[None]
        ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])
        tri = triangulate_3d_models(ma, group)
        assert tri.shape == (M, K, T, 3)
        for m in range(M):
            np.testing.assert_allclose(
                tri[m].transpose(1, 0, 2), X, atol=1e-6
            )


def test_project_3d_covariance_matches_finite_difference(rng):
    group = _make_group(rng, 1)
    h = group.cameras[0].projection_fn()
    T = 5
    ms = rng.normal(size=(T, 3)) * 0.2
    Vs = np.stack([np.diag(rng.uniform(0.01, 0.1, 3)) for _ in range(T)])
    ev = np.abs(rng.normal(size=(T, 2))) * 0.01
    var_x, var_y = project_3d_covariance_to_2d(ms, Vs, h, ev)
    # finite-difference Jacobian check
    eps = 1e-4
    for t in range(T):
        J = np.zeros((2, 3))
        for d in range(3):
            dp = ms[t].copy()
            dm = ms[t].copy()
            dp[d] += eps
            dm[d] -= eps
            J[:, d] = (np.asarray(h(jnp.asarray(dp))) - np.asarray(h(jnp.asarray(dm)))) / (2 * eps)
        cov = J @ Vs[t] @ J.T
        np.testing.assert_allclose(var_x[t], cov[0, 0] + ev[t, 0], rtol=1e-2)
        np.testing.assert_allclose(var_y[t], cov[1, 1] + ev[t, 1], rtol=1e-2)


def test_nonlinear_smoother_runs(rng):
    import jax

    with jax.enable_x64():
        group = _make_group(rng)
        M, C, T, K = 3, 2, 40, 2
        X = rng.normal(size=(T, K, 3)).cumsum(axis=0) * 0.01
        arr = np.zeros((M, C, T, K, 3))
        for c, cam in enumerate(group.cameras):
            uv = np.asarray(cam.projection_fn()(jnp.asarray(X.reshape(-1, 3))))
            arr[:, c, :, :, :2] = uv.reshape(T, K, 2)[None] + rng.normal(
                size=(M, T, K, 2)
            )
        arr[..., 2] = 0.95
        ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])
        dfs, s, df3d = ensemble_kalman_smoother_multicam(
            ma, KPS, [c.name for c in group.cameras], smooth_param=1.0, camgroup=group
        )
        assert len(dfs) == 2
        assert np.isfinite(df3d.to_numpy()).all()
        # 3D latents should track the true world trajectory loosely
        x3d = df3d.xs("x", level="coords", axis=1).to_numpy()  # (T, K)
        err = np.abs(x3d - X[..., 0]).mean()
        assert err < 0.1


def test_fused_nonlinear_path_matches_host_path(rng):
    """The fused calibrated path (batched undistort + DLT + geometric init +
    reprojection on device) must match the general host-staged path. The host
    path is forced with a no-op s_frames span."""
    import jax

    with jax.enable_x64():
        group = _make_group(rng)
        M, C, T, K = 3, 2, 60, 2
        X = rng.normal(size=(T, K, 3)).cumsum(axis=0) * 0.01
        arr = np.zeros((M, C, T, K, 3))
        for c, cam in enumerate(group.cameras):
            uv = np.asarray(cam.projection_fn()(jnp.asarray(X.reshape(-1, 3))))
            arr[:, c, :, :, :2] = uv.reshape(T, K, 2)[None] + rng.normal(
                size=(M, T, K, 2)
            )
        arr[..., 2] = 0.95
        ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])
        names = [c.name for c in group.cameras]
        dfs_f, s_f, d3_f = ensemble_kalman_smoother_multicam(
            ma, KPS, names, smooth_param=1.0, camgroup=group
        )
        dfs_h, s_h, d3_h = ensemble_kalman_smoother_multicam(
            ma, KPS, names, smooth_param=1.0, camgroup=group, s_frames=[(0, T)]
        )
        np.testing.assert_allclose(s_f, s_h, rtol=1e-6)
        for df_f, df_h in zip(dfs_f, dfs_h):
            np.testing.assert_allclose(
                df_f.to_numpy(), df_h.to_numpy(), rtol=0, atol=1e-4
            )
        np.testing.assert_allclose(
            d3_f.to_numpy(), d3_h.to_numpy(), rtol=0, atol=1e-4
        )


@pytest.mark.skipif(not reference_data_available(), reason="reference data missing")
def test_inflation_fixed_point_matches_sklearn_default(monkeypatch):
    """The reference fits FactorAnalysis with sklearn defaults (randomized SVD,
    random_state=0; /root/reference/eks/stats.py:114-117). Our FA must drive
    the x10 inflation loop to the same fixed point on real data."""
    from sklearn.decomposition import FactorAnalysis as SkFA

    import eks_tpu.stats as stats_mod
    from eks_tpu.core import ensemble
    from eks_tpu.marker_array import input_dfs_to_markerArray
    from eks_tpu.models.multicam import mA_compute_maha
    from eks_tpu.utils import center_predictions, format_data

    cams = ["top", "bot"]
    dfs, kps = format_data(f"{REFERENCE_DATA}/mirror-mouse-separate", camera_names=cams)
    ma = input_dfs_to_markerArray(dfs, kps, cams)
    emA = ensemble(ma, avg_mode="median", var_mode="confidence_weighted_var")
    emA_vars = emA.slice_fields("var_x", "var_y")
    emA_likes = emA.slice_fields("likelihood")
    _, emA_centered, _, _ = center_predictions(emA, 50.0)

    ours = mA_compute_maha(emA_centered, emA_vars, emA_likes, 3,
                           inflate_vars_kwargs={}).array.copy()

    class _SkAdapter:
        """sklearn-default FactorAnalysis behind our attribute surface."""

        def __init__(self, n_components):
            self._fa = SkFA(n_components=n_components, random_state=0)

        def fit(self, X):
            self._fa.fit(X)
            self.components_ = self._fa.components_
            self.mean_ = self._fa.mean_
            return self

    monkeypatch.setattr(stats_mod, "FactorAnalysis", _SkAdapter)
    sk = mA_compute_maha(emA_centered, emA_vars, emA_likes, 3,
                         inflate_vars_kwargs={}).array

    # identical inflation decisions -> identical variances (not just close)
    np.testing.assert_array_equal(ours == sk, True)


# ------------------------------- e2e ------------------------------- #
@pytest.mark.skipif(not reference_data_available(), reason="reference data missing")
@pytest.mark.slow  # ~19s real-data run; golden suites pin this path
def test_fit_eks_mirrored_multicam_e2e(tmp_path):
    df, s, input_dfs, bodyparts = fit_eks_mirrored_multicam(
        input_source=f"{REFERENCE_DATA}/mirror-mouse",
        save_file=str(tmp_path / "mirrored.csv"),
        camera_names=["top", "bot"],
        smooth_param=5.0,
    )
    assert (tmp_path / "mirrored.csv").exists()
    assert all(f"{bp}_top" in df.columns.get_level_values("bodyparts") for bp in bodyparts)
    assert np.isfinite(df.to_numpy()).all()


@pytest.mark.skipif(not reference_data_available(), reason="reference data missing")
def test_fit_eks_multicam_separate_e2e(tmp_path):
    dfs, s, input_dfs, bodyparts, df3d = fit_eks_multicam(
        input_source=f"{REFERENCE_DATA}/mirror-mouse-separate",
        save_dir=str(tmp_path),
        camera_names=["top", "bot"],
        smooth_param=5.0,
    )
    assert (tmp_path / "multicam_top_results.csv").exists()
    assert (tmp_path / "multicam_bot_results.csv").exists()
    assert len(dfs) == 2 and np.isfinite(dfs[0].to_numpy()).all()


@pytest.mark.skipif(not reference_data_available(), reason="reference data missing")
@pytest.mark.slow  # ~25s real-calibration run; golden suites pin this path
def test_fit_eks_multicam_fly_calibrated_e2e(tmp_path):
    dfs, s, input_dfs, bodyparts, df3d = fit_eks_multicam(
        input_source=f"{REFERENCE_DATA}/fly",
        save_dir=str(tmp_path),
        calibration=f"{REFERENCE_DATA}/fly/calibration.toml",
        smooth_param=10.0,
    )
    assert (tmp_path / "multicam_Cam-A_results.csv").exists()
    assert (tmp_path / "multicam_3d_results.csv").exists()
    assert len(dfs) == 3
    for df in dfs:
        arr = df.to_numpy()
        assert np.isfinite(arr).all()
    assert np.isfinite(df3d.to_numpy()).all()


def test_inflate_vars_kwargs_never_mutated(rng):
    """Neither mA_compute_maha nor the smoother may write into the caller's
    kwargs dict: a reused dict with a fitted 'mean' was silently zeroed on
    the next call (round-5 self-review)."""
    from eks_tpu.models.multicam import mA_compute_maha

    ma = make_multicam_array(rng)
    from eks_tpu.core import ensemble
    from eks_tpu.utils import center_predictions

    emA = ensemble(ma)
    _, cent, _, _ = center_predictions(emA, 50.0)
    fitted_mean = np.full(4, 7.5)
    kwargs = {"likelihood_threshold": 0.95, "mean": fitted_mean.copy()}
    snapshot = dict(kwargs)

    mA_compute_maha(
        cent, emA.slice_fields("var_x", "var_y"),
        emA.slice_fields("likelihood"), 2, inflate_vars_kwargs=kwargs,
    )
    assert set(kwargs) == set(snapshot)  # no setdefault leakage
    np.testing.assert_array_equal(kwargs["mean"], fitted_mean)

    ensemble_kalman_smoother_multicam(
        ma, KPS, CAMS, smooth_param=3.0, inflate_vars=True,
        inflate_vars_kwargs=kwargs, n_latent=2,
    )
    assert set(kwargs) == set(snapshot)
    np.testing.assert_array_equal(kwargs["mean"], fitted_mean)
