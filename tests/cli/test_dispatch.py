"""Per-subcommand dispatch: every handler forwards its flags to its fit_*.

The model layer is mocked out, so these tests pin only the argparse -> kwarg
wiring (the reference's CLI tier does the same across all five commands)."""

import sys
from unittest import mock

import pytest

from eks_tpu.cli.main import main


def _run(argv):
    with mock.patch.object(sys, "argv", ["eks-tpu"] + argv):
        main()


def _capture(target, returns):
    """Patch `target` with a recorder returning `returns`."""
    seen = {}

    def fake(**kwargs):
        seen.update(kwargs)
        return returns

    return seen, mock.patch(target, side_effect=fake)


DF = mock.MagicMock()


def test_cmd_singlecam_forwards_args(tmp_path):
    seen, patcher = _capture(
        "eks_tpu.cli.cmd_singlecam.fit_eks_singlecam", (DF, [1.0], [], ["bp"])
    )
    with patcher:
        _run([
            "singlecam",
            "--input-dir", str(tmp_path),
            "--save-dir", str(tmp_path),
            "--save-filename", "out.csv",
            "--s", "1.5", "2.5",
            "--blocks", "0,1;2",
            "--s-frames", "(0,100)",
            "--bodypart-list", "nose", "paw",
            "--devices", "4",
            "--partition", "time",
        ])
    assert seen["input_source"] == str(tmp_path)
    assert seen["save_file"] == str(tmp_path / "out.csv")
    assert seen["smooth_param"] == [1.5, 2.5]
    assert seen["blocks"] == [[0, 1], [2]]
    assert seen["s_frames"] == [(0, 100)]
    assert seen["bodypart_list"] == ["nose", "paw"]
    assert seen["devices"] == 4
    assert seen["partition"] == "time"


def test_cmd_multicam_forwards_args(tmp_path):
    seen, patcher = _capture(
        "eks_tpu.cli.cmd_multicam.fit_eks_multicam",
        ([DF], [1.0], [[]], ["bp"], DF),
    )
    with patcher:
        _run([
            "multicam",
            "--input-dir", str(tmp_path),
            "--save-dir", str(tmp_path),
            "--camera-names", "top", "bot",
            "--quantile-keep-pca", "80",
            "--n-latent", "2",
            "--no-inflate-vars",
            "--s", "3.0",
            "--devices", "4",
            "--partition", "time",
        ])
    assert seen["camera_names"] == ["top", "bot"]
    assert seen["quantile_keep_pca"] == 80
    assert seen["n_latent"] == 2
    assert seen["inflate_vars"] is False
    assert seen["smooth_param"] == [3.0]
    assert seen["devices"] == 4
    assert seen["partition"] == "time"
    assert seen["calibration"] is None


def test_cmd_multicam_calibration_exclusivity(tmp_path, caplog):
    # no camera names and no calibration -> hard error
    with pytest.raises(ValueError):
        _run(["multicam", "--input-dir", str(tmp_path)])

    # calibration + camera names -> warn, calibration wins
    seen, patcher = _capture(
        "eks_tpu.cli.cmd_multicam.fit_eks_multicam",
        ([DF], [1.0], [[]], ["bp"], DF),
    )
    with patcher, caplog.at_level("WARNING"):
        _run([
            "multicam",
            "--input-dir", str(tmp_path),
            "--camera-names", "a", "b",
            "--calibration", str(tmp_path / "cal.toml"),
        ])
    assert seen["calibration"] == str(tmp_path / "cal.toml")
    assert any("--calibration" in r.message for r in caplog.records)


def test_cmd_mirrored_multicam_forwards_args(tmp_path):
    seen, patcher = _capture(
        "eks_tpu.cli.cmd_mirrored_multicam.fit_eks_mirrored_multicam",
        (DF, [1.0], [], ["bp"]),
    )
    with patcher:
        _run([
            "mirrored-multicam",
            "--input-dir", str(tmp_path),
            "--save-dir", str(tmp_path),
            "--camera-names", "top", "bot",
            "--quantile-keep-pca", "60",
            "--n-latent", "3",
            "--devices", "2",
        ])
    assert seen["camera_names"] == ["top", "bot"]
    assert seen["quantile_keep_pca"] == 60
    assert seen["n_latent"] == 3
    assert seen["inflate_vars"] is True  # default on
    assert seen["save_file"] == str(tmp_path / "eks_mirrored_multicam.csv")
    assert seen["devices"] == 2
    assert seen["partition"] == "keypoint"  # default


def test_cmd_ibl_pupil_forwards_args(tmp_path):
    seen, patcher = _capture(
        "eks_tpu.cli.cmd_ibl_pupil.fit_eks_pupil", (DF, (0.9, 0.9), [], ["kp"])
    )
    with patcher:
        _run([
            "ibl-pupil",
            "--input-dir", str(tmp_path),
            "--save-dir", str(tmp_path),
            "--diameter-s", "0.99",
            "--com-s", "0.98",
            "--s-frames", "100",
            "--devices", "8",
        ])
    assert seen["smooth_params"] == [0.99, 0.98]
    assert seen["s_frames"] == [(1, 100)]
    assert seen["save_file"] == str(tmp_path / "eks_ibl_pupil.csv")
    assert seen["devices"] == 8


def test_cmd_ibl_paw_forwards_args(tmp_path):
    seen, patcher = _capture(
        "eks_tpu.cli.cmd_ibl_paw.fit_eks_multicam_ibl_paw",
        ([DF], [1.0], [[]], ["paw_l"]),
    )
    with patcher:
        _run([
            "ibl-paw",
            "--input-dir", str(tmp_path),
            "--save-dir", str(tmp_path),
            "--s", "4.0",
            "--quantile-keep-pca", "70",
            "--no-inflate-vars",
            "--devices", "4",
        ])
    assert seen["smooth_param"] == [4.0]
    assert seen["quantile_keep_pca"] == 70
    assert seen["inflate_vars"] is False
    assert seen["var_mode"] == "var"  # paw family pins plain variance
    assert seen["devices"] == 4


def test_cmd_singlecam_sessions_forwards_args(tmp_path):
    d1 = tmp_path / "sessA"
    d2 = tmp_path / "sessB"
    d1.mkdir(); d2.mkdir()
    seen, patcher = _capture(
        "eks_tpu.cli.cmd_singlecam.fit_eks_singlecam_sessions",
        [(DF, [1.0], [], ["bp"]), (DF, [1.0], [], ["bp"])],
    )
    with patcher:
        _run([
            "singlecam",
            "--sessions", str(d1), str(d2),
            "--save-dir", str(tmp_path),
            "--s", "2.0",
            "--blocks", "0,1",
            "--bodypart-list", "nose", "paw",
        ])
    assert seen["input_sources"] == [str(d1), str(d2)]
    assert seen["save_files"] == [
        str(tmp_path / "eks_singlecam_sessA.csv"),
        str(tmp_path / "eks_singlecam_sessB.csv"),
    ]
    assert seen["smooth_param"] == [[2.0], [2.0]]
    assert seen["blocks"] == [[[0, 1]], [[0, 1]]]
    assert seen["bodypart_list"] == ["nose", "paw"]


def test_cmd_ibl_pupil_sessions_forwards_args(tmp_path):
    d1 = tmp_path / "pupilA"
    d2 = tmp_path / "pupilB"
    d1.mkdir(); d2.mkdir()
    seen, patcher = _capture(
        "eks_tpu.cli.cmd_ibl_pupil.fit_eks_pupil_sessions",
        [(DF, [0.9, 0.95], [], ["bp"]), (DF, [0.9, 0.95], [], ["bp"])],
    )
    with patcher:
        _run([
            "ibl-pupil",
            "--sessions", str(d1), str(d2),
            "--save-dir", str(tmp_path),
            "--diameter-s", "0.9",
            "--com-s", "0.95",
        ])
    assert seen["input_sources"] == [str(d1), str(d2)]
    assert seen["save_files"] == [
        str(tmp_path / "eks_ibl_pupil_pupilA.csv"),
        str(tmp_path / "eks_ibl_pupil_pupilB.csv"),
    ]
    assert seen["smooth_params"] == [0.9, 0.95]


def test_cmd_singlecam_sessions_default_save_next_to_inputs(tmp_path):
    """Without --save-dir each session's CSV lands next to its own input
    directory (ADVICE r4: a shared default dir keyed by basename collides
    when two sessions share a directory name)."""
    d1 = tmp_path / "a" / "session"
    d2 = tmp_path / "b" / "session"  # same basename, different session
    d1.mkdir(parents=True); d2.mkdir(parents=True)
    seen, patcher = _capture(
        "eks_tpu.cli.cmd_singlecam.fit_eks_singlecam_sessions",
        [(DF, [1.0], [], ["bp"]), (DF, [1.0], [], ["bp"])],
    )
    with patcher:
        _run(["singlecam", "--sessions", str(d1), str(d2), "--s", "2.0"])
    assert seen["save_files"] == [
        str(d1 / "outputs" / "eks_singlecam.csv"),
        str(d2 / "outputs" / "eks_singlecam.csv"),
    ]
    assert len(set(seen["save_files"])) == 2


def test_cmd_ibl_pupil_sessions_default_save_next_to_inputs(tmp_path):
    d1 = tmp_path / "x" / "sess"
    d2 = tmp_path / "y" / "sess"
    d1.mkdir(parents=True); d2.mkdir(parents=True)
    seen, patcher = _capture(
        "eks_tpu.cli.cmd_ibl_pupil.fit_eks_pupil_sessions",
        [(DF, [0.9, 0.95], [], ["bp"]), (DF, [0.9, 0.95], [], ["bp"])],
    )
    with patcher:
        _run(["ibl-pupil", "--sessions", str(d1), str(d2)])
    assert seen["save_files"] == [
        str(d1 / "outputs" / "eks_ibl_pupil.csv"),
        str(d2 / "outputs" / "eks_ibl_pupil.csv"),
    ]


def test_cmd_sessions_rejects_missing_directory(tmp_path):
    with pytest.raises(ValueError, match="not a directory"):
        _run(["singlecam", "--sessions", str(tmp_path / "missing")])


@pytest.mark.parametrize("flags", [["--diameter-s", "0.9"], ["--com-s", "0.95"]])
def test_cmd_ibl_pupil_warns_on_half_specified_s(tmp_path, caplog, flags):
    """Giving only one of --diameter-s/--com-s silently meant fully-auto;
    the CLI now says so (ADVICE r4). Applies to solo and sessions paths."""
    import logging

    seen, patcher = _capture(
        "eks_tpu.cli.cmd_ibl_pupil.fit_eks_pupil", (DF, [0.9, 0.95], [], ["bp"])
    )
    with patcher, caplog.at_level(logging.WARNING, logger="eks_tpu.cli"):
        _run(["ibl-pupil", "--input-dir", str(tmp_path),
              "--save-dir", str(tmp_path)] + flags)
    assert any("unsupported" in r.message for r in caplog.records)

    d1 = tmp_path / "s1"
    d1.mkdir()
    caplog.clear()
    seen, patcher = _capture(
        "eks_tpu.cli.cmd_ibl_pupil.fit_eks_pupil_sessions",
        [(DF, [0.9, 0.95], [], ["bp"])],
    )
    with patcher, caplog.at_level(logging.WARNING, logger="eks_tpu.cli"):
        _run(["ibl-pupil", "--sessions", str(d1)] + flags)
    assert any("unsupported" in r.message for r in caplog.records)


def test_cmd_ibl_pupil_no_warning_when_both_or_neither(tmp_path, caplog):
    import logging

    seen, patcher = _capture(
        "eks_tpu.cli.cmd_ibl_pupil.fit_eks_pupil", (DF, [0.9, 0.95], [], ["bp"])
    )
    with patcher, caplog.at_level(logging.WARNING, logger="eks_tpu.cli"):
        _run(["ibl-pupil", "--input-dir", str(tmp_path),
              "--save-dir", str(tmp_path),
              "--diameter-s", "0.9", "--com-s", "0.95"])
        _run(["ibl-pupil", "--input-dir", str(tmp_path),
              "--save-dir", str(tmp_path)])
    assert not any("unsupported" in r.message for r in caplog.records)


def test_cmd_sessions_save_dir_disambiguates_basename_collisions(tmp_path):
    """With --save-dir, two sessions sharing a directory basename must not
    map to the same output CSV (the second write would silently clobber the
    first); colliding batches gain the session index in every filename."""
    d1 = tmp_path / "a" / "session"
    d2 = tmp_path / "b" / "session"
    d1.mkdir(parents=True); d2.mkdir(parents=True)
    seen, patcher = _capture(
        "eks_tpu.cli.cmd_singlecam.fit_eks_singlecam_sessions",
        [(DF, [1.0], [], ["bp"]), (DF, [1.0], [], ["bp"])],
    )
    with patcher:
        _run(["singlecam", "--sessions", str(d1), str(d2),
              "--save-dir", str(tmp_path), "--s", "2.0"])
    assert seen["save_files"] == [
        str(tmp_path / "eks_singlecam_0_session.csv"),
        str(tmp_path / "eks_singlecam_1_session.csv"),
    ]
    assert len(set(seen["save_files"])) == 2


def test_resolve_input_empty_file_list_clear_error():
    """An empty --input-files list (argparse rejects it on the CLI, but
    library callers can build such a Namespace) used to raise IndexError
    deep in the handler; resolve_input gives an actionable message."""
    import argparse

    from eks_tpu.cli._utils import resolve_input

    ns = argparse.Namespace(input_dir=None, input_files=[])
    with pytest.raises(ValueError, match="no input given"):
        resolve_input(ns)
    src, d = resolve_input(
        argparse.Namespace(input_dir="/tmp", input_files=None)
    )
    assert src == "/tmp" and str(d) == "/tmp"
