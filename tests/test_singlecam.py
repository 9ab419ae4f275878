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


@pytest.mark.slow  # ~37s real-data run; the golden suites pin this path
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


# --------------------------------------------------------------------------- #
# multi-session batching
# --------------------------------------------------------------------------- #
def test_sessions_batched_matches_sequential(rng):
    """Equal-shape sessions stack as keypoint lanes; outputs must match
    independent per-session runs to f32 reduction ulp (every pipeline stage
    is per-keypoint independent; batch width can retile XLA reductions)."""
    from eks_tpu.models.singlecam import (
        ensemble_kalman_smoother_singlecam_sessions,
    )

    mas = [make_marker_array(rng, M=4, T=90, K=k) for k in (2, 3)]
    names = [KPS[:2], KPS[:3]]
    batched = ensemble_kalman_smoother_singlecam_sessions(
        mas, names, smooth_param=None
    )
    for (df_b, s_b), ma, ns in zip(batched, mas, names):
        df_s, s_s = ensemble_kalman_smoother_singlecam(ma, ns, smooth_param=None)
        # equivalent to f32 reduction ulp: batch width can change XLA's
        # reduction tiling, perturbing the Adam trajectory in the last bit
        np.testing.assert_allclose(
            np.asarray(s_b), np.asarray(s_s), rtol=1e-5
        )
        np.testing.assert_allclose(
            df_b.to_numpy(), df_s.to_numpy(), rtol=1e-4, atol=1e-4
        )
        assert list(df_b.columns) == list(df_s.columns)


def test_sessions_unequal_shapes_fall_back(rng):
    from eks_tpu.models.singlecam import (
        ensemble_kalman_smoother_singlecam_sessions,
    )

    mas = [
        make_marker_array(rng, M=4, T=60, K=2),
        make_marker_array(rng, M=4, T=80, K=2),
    ]
    results = ensemble_kalman_smoother_singlecam_sessions(
        mas, [KPS[:2], KPS[:2]], smooth_param=1.5
    )
    assert len(results) == 2
    assert results[0][0].shape[0] == 60 and results[1][0].shape[0] == 80
    for _, s in results:
        np.testing.assert_array_equal(np.asarray(s), [1.5, 1.5])


def test_sessions_per_session_params_and_blocks(rng):
    """Per-session smooth_param lists and block structures shift correctly
    into the merged lane space."""
    from eks_tpu.models.singlecam import (
        ensemble_kalman_smoother_singlecam_sessions,
    )

    mas = [make_marker_array(rng, M=4, T=70, K=2) for _ in range(2)]
    names = [KPS[:2]] * 2
    results = ensemble_kalman_smoother_singlecam_sessions(
        mas, names, smooth_param=[2.0, [1.0, 3.0]]
    )
    np.testing.assert_array_equal(np.asarray(results[0][1]), [2.0, 2.0])
    np.testing.assert_array_equal(np.asarray(results[1][1]), [1.0, 3.0])

    # blocks: session 1's [0, 1] block must share one s, independent of
    # session 0's singleton lanes
    blocked = ensemble_kalman_smoother_singlecam_sessions(
        mas, names, smooth_param=None, blocks=[None, [[0, 1]]]
    )
    s1 = np.asarray(blocked[1][1])
    assert s1[0] == s1[1]
    seq = ensemble_kalman_smoother_singlecam(
        mas[1], names[1], smooth_param=None, blocks=[[0, 1]]
    )
    np.testing.assert_allclose(s1, np.asarray(seq[1]), rtol=1e-5)
    # session 0 declared no blocks: its lanes must still be optimized
    s0 = np.asarray(blocked[0][1])
    assert np.isfinite(s0).all() and (s0 > 0).all()


def test_fit_eks_singlecam_sessions_e2e(tmp_path, rng):
    """File-level wrapper: per-session CSVs in, per-session CSVs out."""
    from eks_tpu.models.singlecam import fit_eks_singlecam_sessions
    from eks_tpu.utils import make_dlc_pandas_index

    sources, saves = [], []
    for s in range(2):
        d = tmp_path / f"session{s}"
        d.mkdir()
        for m in range(3):
            arr = rng.normal(size=(50, 2 * 3)) + 40
            cols = make_dlc_pandas_index(KPS[:2], labels=["x", "y", "likelihood"])
            df = pd.DataFrame(
                np.concatenate(
                    [arr, rng.uniform(0.8, 1.0, size=(50, 2))], axis=1
                )[:, [0, 1, 4, 2, 3, 5]],
                columns=cols,
            )
            df.to_csv(d / f"seed{m}.csv")
        sources.append(str(d))
        saves.append(str(tmp_path / f"out{s}.csv"))

    results = fit_eks_singlecam_sessions(sources, saves, smooth_param=2.0)
    assert len(results) == 2
    for (df, s_finals, input_dfs, names), save in zip(results, saves):
        import os

        assert os.path.exists(save)
        assert df.shape == (50, 2 * 9)
        assert len(input_dfs) == 3 and len(names) == 2
        np.testing.assert_array_equal(np.asarray(s_finals), [2.0, 2.0])


def test_sessions_empty_input_returns_empty():
    """An empty session list returns [] instead of crashing in np.stack
    with an opaque numpy error (ADVICE r4)."""
    from eks_tpu.models.singlecam import (
        ensemble_kalman_smoother_singlecam_sessions,
    )

    assert ensemble_kalman_smoother_singlecam_sessions([], []) == []
