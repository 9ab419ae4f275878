"""CLI root: version, registration, dispatch."""

import sys
from unittest import mock

import pytest

from eks_tpu.cli.main import main


def _run(argv):
    with mock.patch.object(sys, "argv", ["eks-tpu"] + argv):
        main()


def test_version(capsys):
    with pytest.raises(SystemExit) as exc:
        _run(["--version"])
    assert exc.value.code == 0
    assert "eks-tpu" in capsys.readouterr().out


def test_no_subcommand_errors():
    with pytest.raises(SystemExit) as exc:
        _run([])
    assert exc.value.code != 0


def test_all_subcommands_registered(capsys):
    with pytest.raises(SystemExit):
        _run(["--help"])
    out = capsys.readouterr().out
    for sub in ["singlecam", "multicam", "mirrored-multicam", "ibl-pupil", "ibl-paw"]:
        assert sub in out


def test_dispatch_calls_handler(tmp_path):
    called = {}

    def fake_fit(**kwargs):
        called.update(kwargs)
        return (mock.MagicMock(), [1.0], [], ["bp"])

    with mock.patch(
        "eks_tpu.cli.cmd_singlecam.fit_eks_singlecam", side_effect=fake_fit
    ):
        _run(
            [
                "singlecam",
                "--input-dir", str(tmp_path),
                "--save-dir", str(tmp_path),
                "--s", "2.0",
            ]
        )
    assert called["input_source"] == str(tmp_path)
    assert called["smooth_param"] == [2.0]
