"""Bundled example data drives every smoother family end-to-end."""

import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="bundled example data missing"
)


def test_singlecam_example(tmp_path):
    from eks_tpu import fit_eks_singlecam

    df, s, _, kps = fit_eks_singlecam(
        input_source=f"{DATA}/singlecam",
        save_file=str(tmp_path / "out.csv"),
        smooth_param=2.0,
    )
    assert kps == ["nose", "left_ear", "tail_base"]
    assert np.isfinite(df.to_numpy()).all()


def test_mirrored_example(tmp_path):
    from eks_tpu import fit_eks_mirrored_multicam

    df, s, _, bps = fit_eks_mirrored_multicam(
        input_source=f"{DATA}/mirrored",
        save_file=str(tmp_path / "out.csv"),
        camera_names=["top", "bot"],
        smooth_param=2.0,
    )
    assert bps == ["paw1", "paw2"]
    assert np.isfinite(df.to_numpy()).all()


def test_multicam_calibrated_example(tmp_path):
    from eks_tpu import fit_eks_multicam

    dfs, s, _, bps, df3d = fit_eks_multicam(
        input_source=f"{DATA}/multicam",
        save_dir=str(tmp_path),
        calibration=f"{DATA}/multicam/calibration.toml",
        smooth_param=5.0,
    )
    assert len(dfs) == 2
    assert np.isfinite(df3d.to_numpy()).all()


def test_pupil_example(tmp_path):
    from eks_tpu import fit_eks_pupil

    df, s, _, kps = fit_eks_pupil(
        input_source=f"{DATA}/pupil",
        save_file=str(tmp_path / "out.csv"),
        smooth_params=[0.99, 0.99],
    )
    assert np.isfinite(df.to_numpy()).all()
    # the generated session has a known ~10px pupil: the smoothed diameter
    # (top-bottom span) should land near it
    top_y = df[("ensemble-kalman_tracker", "pupil_top_r", "y")].to_numpy()
    # quirk: 'pupil_right_r' block carries bottom's data
    bottom_y = df[("ensemble-kalman_tracker", "pupil_right_r", "y")].to_numpy()
    diam = np.abs(bottom_y - top_y).mean()
    assert 8.0 < diam < 12.0


def test_paw_example(tmp_path):
    from eks_tpu import fit_eks_multicam_ibl_paw

    dfs, s, _, bps = fit_eks_multicam_ibl_paw(
        input_source=f"{DATA}/paw",
        save_dir=str(tmp_path),
        smooth_param=2.0,
        var_mode="var",
    )
    assert len(dfs) == 2
    assert dfs[0].shape[0] == 400  # all left frames inside right range
    assert np.isfinite(dfs[0].to_numpy()).all()


def test_public_api_discoverable_and_superset_of_reference():
    """Every public entry point is importable AND visible in dir() despite
    lazy imports; the five reference entry points are all present."""
    import eks_tpu

    for name in eks_tpu.__all__:
        assert getattr(eks_tpu, name) is not None
        assert name in dir(eks_tpu), f"{name} missing from dir()"
    for ref_name in (
        "MarkerArray", "fit_eks_singlecam", "fit_eks_multicam",
        "fit_eks_mirrored_multicam", "fit_eks_pupil",
        "fit_eks_multicam_ibl_paw",
    ):
        assert ref_name in eks_tpu.__all__
