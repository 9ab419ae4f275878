"""End-to-end TRUE-reference parity for all five smoother families on the
bundled example sessions.

Goldens are outputs of the actual reference implementation run through the
dependency shims (scripts/make_reference_goldens.py); each test asserts this
package matches them at the reference's own contract (atol=1e-4). Two
variants per family where the reference does the same: auto-tuned s (pins
the optimizer trajectory too) and fixed s.
"""

import os

import pytest

from tests.integration.conftest import DATA

# slow tier: full-length end-to-end runs (inner gate: -m 'not slow')
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(DATA), reason="bundled example data missing"
)]


def test_singlecam_fixed_s(tmp_path, golden):
    from eks_tpu import fit_eks_singlecam

    df, _, _, _ = fit_eks_singlecam(
        input_source=f"{DATA}/singlecam",
        save_file=str(tmp_path / "o.csv"),
        smooth_param=2.0,
    )
    golden("singlecam_fixed", df)


def test_singlecam_auto_s(tmp_path, golden):
    from eks_tpu import fit_eks_singlecam

    df, s, _, _ = fit_eks_singlecam(
        input_source=f"{DATA}/singlecam",
        save_file=str(tmp_path / "o.csv"),
        s_frames=[(0, 250)],
    )
    golden("singlecam_auto", df)


def test_mirrored_fixed_s(tmp_path, golden):
    from eks_tpu import fit_eks_mirrored_multicam

    df, _, _, _ = fit_eks_mirrored_multicam(
        input_source=f"{DATA}/mirrored",
        save_file=str(tmp_path / "o.csv"),
        camera_names=["top", "bot"],
        smooth_param=3.0,
    )
    golden("mirrored_fixed", df)


def test_mirrored_auto_s_inflate(tmp_path, golden):
    from eks_tpu import fit_eks_mirrored_multicam

    df, _, _, _ = fit_eks_mirrored_multicam(
        input_source=f"{DATA}/mirrored",
        save_file=str(tmp_path / "o.csv"),
        camera_names=["top", "bot"],
        inflate_vars=True,
    )
    golden("mirrored_auto_inflate", df)


def test_multicam_calibrated_auto_s(tmp_path, golden):
    from eks_tpu import fit_eks_multicam

    dfs, _, _, _, df3d = fit_eks_multicam(
        input_source=f"{DATA}/multicam",
        save_dir=str(tmp_path),
        calibration=f"{DATA}/multicam/calibration.toml",
    )
    # camera df at atol 5e-4: f32 state drift amplified by the projection
    # focal lengths (see test_ref_fly_calibrated_fixed_s; measured 2.1e-4)
    golden("multicam_cal_cam0", dfs[0], atol=5e-4)
    golden("multicam_cal_3d", df3d)


def test_pupil_auto_s(tmp_path, golden):
    from eks_tpu import fit_eks_pupil

    df, _, _, _ = fit_eks_pupil(
        input_source=f"{DATA}/pupil",
        save_file=str(tmp_path / "o.csv"),
    )
    golden("pupil_auto", df)


def test_pupil_fixed_s(tmp_path, golden):
    from eks_tpu import fit_eks_pupil

    df, _, _, _ = fit_eks_pupil(
        input_source=f"{DATA}/pupil",
        save_file=str(tmp_path / "o.csv"),
        smooth_params=[0.99, 0.98],
    )
    golden("pupil_fixed", df)


def test_paw_auto_s(tmp_path, golden):
    from eks_tpu import fit_eks_multicam_ibl_paw

    dfs, _, _, _ = fit_eks_multicam_ibl_paw(
        input_source=f"{DATA}/paw",
        save_dir=str(tmp_path),
        var_mode="var",
    )
    golden("paw_left", dfs[0])
    golden("paw_right", dfs[1])
