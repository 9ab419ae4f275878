"""Stats: PCA/FA parity with sklearn, Mahalanobis contracts and recovery."""

import numpy as np
import pytest

from eks_tpu.marker_array import MarkerArray
from eks_tpu.stats import PCA, FactorAnalysis, compute_mahalanobis, compute_pca
from eks_tpu.utils import center_predictions


# ------------------------------ PCA ------------------------------ #
@pytest.mark.parametrize(
    "shape", [(200, 6), (250, 4), (40, 6)]  # covariance_eigh x2, full
)
def test_pca_bit_identical_to_sklearn(rng, shape):
    """fit AND transform must be bit-identical to sklearn's — the reference
    fits real sklearn PCAs and the true-reference parity goldens see any
    f32 basis difference amplified through the smoother."""
    from sklearn.decomposition import PCA as SkPCA

    n, f = shape
    X = (rng.normal(size=(n, f)) @ rng.normal(size=(f, f))).astype(np.float32)
    ours = PCA(3).fit(X)
    sk = SkPCA(n_components=3).fit(X)
    np.testing.assert_array_equal(ours.mean_, sk.mean_)
    np.testing.assert_array_equal(ours.components_, sk.components_)
    np.testing.assert_array_equal(ours.transform(X), sk.transform(X))


def test_pca_bit_identical_to_sklearn_f64(rng):
    from sklearn.decomposition import PCA as SkPCA

    X = rng.normal(size=(200, 6)) @ rng.normal(size=(6, 6))
    ours = PCA(3).fit(X)
    sk = SkPCA(n_components=3).fit(X)
    np.testing.assert_array_equal(ours.mean_, sk.mean_)
    np.testing.assert_array_equal(ours.components_, sk.components_)
    np.testing.assert_array_equal(ours.transform(X), sk.transform(X))


def test_compute_pca_shapes(rng):
    C, T, K = 2, 50, 3
    arr = np.concatenate(
        [
            rng.normal(size=(1, C, T, K, 2)),
            np.abs(rng.normal(size=(1, C, T, K, 2))),
            rng.uniform(size=(1, C, T, K, 1)),
        ],
        axis=-1,
    )
    ma = MarkerArray(arr, data_fields=["x", "y", "var_x", "var_y", "likelihood"])
    mask, centered, good_centered, _ = center_predictions(ma, 50.0)
    pcas, good_pcs = compute_pca(mask, centered, good_centered, n_components=3)
    assert len(pcas) == K and len(good_pcs) == K
    for k in range(K):
        assert pcas[k].components_.shape == (3, 2 * C)
        assert good_pcs[k].shape == (mask[:, k].sum(), 3)


def test_compute_pca_precomputed_passthrough(rng):
    C, T, K = 2, 40, 2
    arr = np.concatenate(
        [
            rng.normal(size=(1, C, T, K, 2)),
            np.abs(rng.normal(size=(1, C, T, K, 2))),
            rng.uniform(size=(1, C, T, K, 1)),
        ],
        axis=-1,
    )
    ma = MarkerArray(arr, data_fields=["x", "y", "var_x", "var_y", "likelihood"])
    mask, centered, good_centered, _ = center_predictions(ma, 100)
    fixed = PCA(2)
    fixed.mean_ = np.zeros(2 * C)
    fixed.components_ = np.eye(2, 2 * C)
    pcas, good_pcs = compute_pca(mask, centered, good_centered, 2, pca_object=fixed)
    assert all(p is fixed for p in pcas)
    X0 = centered.array[0, :, :, 0, :].transpose(1, 0, 2).reshape(T, -1)
    np.testing.assert_allclose(good_pcs[0], X0[:, :2], atol=1e-6)


# --------------------------- Factor Analysis --------------------------- #
def test_fa_matches_sklearn_lapack(rng):
    from sklearn.decomposition import FactorAnalysis as SkFA

    Z = rng.normal(size=(500, 3))
    W_true = rng.normal(size=(3, 8))
    X = Z @ W_true + rng.normal(size=(500, 8)) * 0.1 + 5.0
    ours = FactorAnalysis(n_components=3, svd_method="lapack").fit(X)
    sk = SkFA(n_components=3, svd_method="lapack").fit(X)
    np.testing.assert_allclose(ours.mean_, sk.mean_, atol=1e-10)
    np.testing.assert_allclose(ours.noise_variance_, sk.noise_variance_, atol=1e-6)
    np.testing.assert_allclose(
        np.abs(ours.components_), np.abs(sk.components_), atol=1e-4
    )
    assert ours.n_iter_ == sk.n_iter_


@pytest.mark.parametrize("shape,k", [((500, 4), 3), ((400, 6), 2), ((40, 8), 2)])
def test_fa_matches_sklearn_default_randomized(rng, shape, k):
    # our default reproduces sklearn's default (randomized SVD, shared
    # RandomState(0) stream, LU power iterations) to float64 roundoff
    from sklearn.decomposition import FactorAnalysis as SkFA

    Z = rng.normal(size=(shape[0], k))
    X = Z @ rng.normal(size=(k, shape[1])) + rng.normal(size=shape) * 0.2
    ours = FactorAnalysis(n_components=k).fit(X)
    sk = SkFA(n_components=k, random_state=0).fit(X)
    assert ours.n_iter_ == sk.n_iter_
    np.testing.assert_allclose(ours.components_, sk.components_, atol=1e-9)
    np.testing.assert_allclose(ours.noise_variance_, sk.noise_variance_, atol=1e-9)


def test_randomized_svd_matches_sklearn_stream(rng):
    from sklearn.utils.extmath import randomized_svd as sk_rsvd

    from eks_tpu.stats import _randomized_svd

    X = rng.normal(size=(300, 6))
    # sklearn's 'auto' normalizer skips normalization for n_iter <= 2 and
    # uses LU beyond (sklearn.utils.extmath._randomized_range_finder);
    # FactorAnalysis exposes iterated_power, so every branch must match —
    # compare against sklearn's OWN 'auto' mode across the rule boundary
    for n_iter in (1, 2, 3, 4):
        u, s, vt = _randomized_svd(
            X, 3, n_iter=n_iter, rng=np.random.RandomState(7)
        )
        u2, s2, vt2 = sk_rsvd(
            X, 3, n_iter=n_iter, random_state=7,
            power_iteration_normalizer="auto",
        )
        np.testing.assert_allclose(s, s2, atol=1e-12, err_msg=f"n_iter={n_iter}")
        np.testing.assert_allclose(vt, vt2, atol=1e-12, err_msg=f"n_iter={n_iter}")
        np.testing.assert_allclose(u, u2, atol=1e-12, err_msg=f"n_iter={n_iter}")


# ----------------------------- Mahalanobis ----------------------------- #
def _latent_data(rng, N=300, C=3, L=2, noise=0.05):
    W = rng.normal(size=(2 * C, L))
    z = rng.normal(size=(N, L))
    x = z @ W.T + rng.normal(size=(N, 2 * C)) * noise
    v = np.full((N, 2 * C), noise**2)
    return x, v, W


def test_mahalanobis_shapes(rng):
    x, v, _ = _latent_data(rng)
    out = compute_mahalanobis(x, v, n_latent=2)
    assert set(out) == {"mahalanobis", "posterior_variance", "reconstructed"}
    assert set(out["mahalanobis"]) == {0, 1, 2}
    for view in range(3):
        assert out["mahalanobis"][view].shape == (300, 1)
        assert out["posterior_variance"][view].shape == (300, 2, 2)
    assert out["reconstructed"].shape == x.shape


def test_mahalanobis_exact_recovery_with_true_loading(rng):
    # noiseless data generated from a true loading matrix must be
    # reconstructed exactly when that matrix is supplied
    x, v, W = _latent_data(rng, noise=0.0)
    v = np.full_like(v, 1e-4)
    out = compute_mahalanobis(
        x, v, n_latent=2, loading_matrix=W, mean=np.zeros(x.shape[1]), epsilon=1e-12
    )
    np.testing.assert_allclose(out["reconstructed"], x, atol=1e-6)
    for view in out["mahalanobis"]:
        assert np.all(out["mahalanobis"][view] < 1e-6)


def test_mahalanobis_matches_reference_loops(rng):
    # vectorized implementation == literal per-row loops
    x, v, W = _latent_data(rng, N=50)
    v = v * rng.uniform(0.5, 2.0, size=v.shape)
    mu = np.zeros(x.shape[1])
    eps = 1e-6
    out = compute_mahalanobis(x, v, n_latent=2, loading_matrix=W, mean=mu, epsilon=eps)
    for i in range(50):
        Dinv = np.diag(1.0 / (v[i] + eps))
        B = np.linalg.inv(W.T @ Dinv @ W)
        z = B @ W.T @ Dinv @ (x[i] - mu)
        xhat_i = W @ z + mu
        np.testing.assert_allclose(out["reconstructed"][i], xhat_i, rtol=1e-8)
        for view in range(3):
            sl = slice(2 * view, 2 * view + 2)
            Qi = np.diag(v[i, sl]) + W[sl] @ B @ W[sl].T
            np.testing.assert_allclose(
                out["posterior_variance"][view][i], Qi, rtol=1e-8
            )
            d = (x[i] - xhat_i)[sl]
            np.testing.assert_allclose(
                out["mahalanobis"][view][i, 0],
                d @ np.linalg.inv(Qi) @ d,
                rtol=1e-6,
            )


def test_mahalanobis_likelihood_filter(rng):
    x, v, _ = _latent_data(rng)
    likes = rng.uniform(0.5, 1.0, size=(x.shape[0], 3))
    out = compute_mahalanobis(
        x, v, n_latent=2, likelihoods=likes, likelihood_threshold=0.8
    )
    assert out["reconstructed"].shape == x.shape
