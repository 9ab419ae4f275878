"""Single-camera smoother: param pass-through, KF init, output schema, e2e."""

import numpy as np
import pandas as pd
import pytest

from eks_tpu.marker_array import MarkerArray
from eks_tpu.models.singlecam import (
    OUTPUT_LABELS,
    ensemble_kalman_smoother_singlecam,
    fit_eks_singlecam,
    initialize_kalman_filter,
)
from tests.conftest import REFERENCE_DATA, reference_data_available


def make_marker_array(rng, M=4, T=80, K=3):
    arr = np.zeros((M, 1, T, K, 3))
    walk = rng.normal(size=(1, 1, T, K, 2)).cumsum(axis=2) + 50
    arr[..., :2] = walk + rng.normal(size=(M, 1, T, K, 2)) * 0.3
    arr[..., 2] = rng.uniform(0.7, 1.0, size=(M, 1, T, K))
    return MarkerArray(arr, data_fields=["x", "y", "likelihood"])


KPS = ["nose", "ear", "tail"]


@pytest.mark.parametrize("sp", [2.0, 2, [1.5], [1.0, 2.0, 3.0], None])
def test_smooth_param_passthrough(rng, sp):
    ma = make_marker_array(rng)
    df, s_finals = ensemble_kalman_smoother_singlecam(ma, KPS, smooth_param=sp)
    assert len(s_finals) == 3
    if isinstance(sp, (int, float)):
        np.testing.assert_array_equal(s_finals, [float(sp)] * 3)
    elif isinstance(sp, list) and len(sp) == 3:
        np.testing.assert_array_equal(s_finals, sp)
    assert np.isfinite(df.to_numpy()).all()


def test_output_schema(rng):
    ma = make_marker_array(rng, T=60, K=2)
    df, _ = ensemble_kalman_smoother_singlecam(ma, KPS[:2], smooth_param=1.0)
    assert df.shape == (60, 2 * len(OUTPUT_LABELS))
    assert list(df.columns.names) == ["scorer", "bodyparts", "coords"]
    scorers = df.columns.get_level_values("scorer").unique()
    assert list(scorers) == ["ensemble-kalman_tracker"]
    coords = df["ensemble-kalman_tracker"]["nose"].columns.tolist()
    assert coords == OUTPUT_LABELS
    # posterior variances positive
    assert (df.xs("x_posterior_var", level="coords", axis=1).to_numpy() > 0).all()


def test_initialize_kalman_filter(rng):
    ma = make_marker_array(rng)
    from eks_tpu.core import ensemble
    from eks_tpu.utils import center_predictions

    emA = ensemble(ma)
    _, centered, _, _ = center_predictions(emA, 100)
    m0s, S0s, As, Qs, Cs = initialize_kalman_filter(centered)
    K = 3
    np.testing.assert_array_equal(np.asarray(m0s), np.zeros((K, 2)))
    np.testing.assert_array_equal(np.asarray(As), np.tile(np.eye(2), (K, 1, 1)))
    np.testing.assert_array_equal(np.asarray(Qs), np.tile(np.eye(2), (K, 1, 1)))
    np.testing.assert_array_equal(np.asarray(Cs), np.tile(np.eye(2), (K, 1, 1)))
    S0 = np.asarray(S0s)
    assert (np.diagonal(S0, axis1=1, axis2=2) > 0).all()
    assert np.allclose(S0, np.swapaxes(S0, 1, 2))
    assert np.allclose(S0 * (1 - np.eye(2)), 0)


def test_smoothing_reduces_roughness(rng):
    ma = make_marker_array(rng, M=5, T=200, K=2)
    df, _ = ensemble_kalman_smoother_singlecam(ma, KPS[:2], smooth_param=None)
    sm_x = df[("ensemble-kalman_tracker", "nose", "x")].to_numpy()
    med_x = df[("ensemble-kalman_tracker", "nose", "x_ens_median")].to_numpy()
    assert np.abs(np.diff(sm_x)).mean() <= np.abs(np.diff(med_x)).mean() * 1.05


@pytest.mark.skipif(not reference_data_available(), reason="reference data missing")
def test_fit_eks_singlecam_e2e(tmp_path):
    save_file = tmp_path / "out" / "eks_singlecam.csv"
    df, s_finals, input_dfs, bodyparts = fit_eks_singlecam(
        input_source=f"{REFERENCE_DATA}/ibl-pupil",
        save_file=str(save_file),
        s_frames=[(0, 400)],
    )
    assert save_file.exists()
    assert len(bodyparts) == 4 and len(input_dfs) == 5
    assert len(s_finals) == 4 and np.isfinite(s_finals).all()
    reread = pd.read_csv(save_file, header=[0, 1, 2], index_col=0)
    assert reread.shape == df.shape == (2000, 4 * 9)
    np.testing.assert_allclose(reread.to_numpy(), df.to_numpy(), rtol=1e-6)
