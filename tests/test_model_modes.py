"""Cross-cutting mode coverage: avg/var modes, blocks, CLI input-files."""

import sys
from unittest import mock

import numpy as np
import pytest

import eks_tpu
from eks_tpu.marker_array import MarkerArray
from eks_tpu.models.singlecam import ensemble_kalman_smoother_singlecam


def _ma(rng, M=4, T=60, K=3):
    arr = np.zeros((M, 1, T, K, 3))
    walk = rng.normal(size=(1, 1, T, K, 2)).cumsum(axis=2) + 50
    arr[..., :2] = walk + rng.normal(size=(M, 1, T, K, 2)) * 0.3
    arr[..., 2] = rng.uniform(0.7, 1.0, size=(M, 1, T, K))
    return MarkerArray(arr, data_fields=["x", "y", "likelihood"])


KPS = ["a", "b", "c"]


@pytest.mark.parametrize("avg_mode", ["mean", "median"])
@pytest.mark.parametrize("var_mode", ["var", "confidence_weighted_var"])
def test_singlecam_mode_combinations(rng, avg_mode, var_mode):
    df, s = ensemble_kalman_smoother_singlecam(
        _ma(rng), KPS, smooth_param=2.0, avg_mode=avg_mode, var_mode=var_mode
    )
    assert np.isfinite(df.to_numpy()).all()


def test_singlecam_blocks_share_s(rng):
    df, s = ensemble_kalman_smoother_singlecam(_ma(rng), KPS, blocks=[[0, 1], [2]])
    assert s[0] == s[1]
    assert np.isfinite(df.to_numpy()).all()


def test_version_attributes():
    assert isinstance(eks_tpu.__version__, str)
    assert eks_tpu.version == eks_tpu.__version__
    with pytest.raises(AttributeError):
        eks_tpu.nonexistent_attribute


def test_public_api_surface():
    # the five entry points + MarkerArray, matching the reference's exports
    for name in [
        "MarkerArray",
        "fit_eks_singlecam",
        "fit_eks_multicam",
        "fit_eks_mirrored_multicam",
        "fit_eks_pupil",
        "fit_eks_multicam_ibl_paw",
    ]:
        assert callable(getattr(eks_tpu, name)) or name == "MarkerArray"


def test_cli_input_files_list(tmp_path, rng):
    import pandas as pd

    cols = pd.MultiIndex.from_product(
        [["m"], KPS, ["x", "y", "likelihood"]],
        names=["scorer", "bodyparts", "coords"],
    )
    paths = []
    for i in range(2):
        p = tmp_path / f"preds{i}.csv"
        pd.DataFrame(rng.random((20, 9)), columns=cols).to_csv(p)
        paths.append(str(p))

    from eks_tpu.cli.main import main

    argv = [
        "eks-tpu", "singlecam",
        "--input-files", *paths,
        "--save-dir", str(tmp_path / "out"),
        "--s", "1.0",
        "--blocks", "0,1;2",
    ]
    with mock.patch.object(sys, "argv", argv):
        main()
    assert (tmp_path / "out" / "eks_singlecam.csv").exists()
