"""CLI helpers: parsers, IO validation, plotting."""

import argparse

import numpy as np
import pandas as pd
import pytest

from eks_tpu.cli._utils import handle_io, parse_blocks, parse_s_frames, plot_results
from eks_tpu.utils import make_dlc_pandas_index


def test_parse_s_frames_bare_int():
    assert parse_s_frames("100") == [(1, 100)]


def test_parse_s_frames_tuples():
    assert parse_s_frames("[(0,100),(200,300)]") == [(0, 100), (200, 300)]
    assert parse_s_frames("(0,100)") == [(0, 100)]
    assert parse_s_frames("[(,100),(250,)]") == [(None, 100), (250, None)]
    assert parse_s_frames(" ( 0 , 50 ) ") == [(0, 50)]


def test_parse_s_frames_errors():
    with pytest.raises(argparse.ArgumentTypeError):
        parse_s_frames("nonsense")
    with pytest.raises(argparse.ArgumentTypeError):
        parse_s_frames("[(100,50)]")


def test_parse_blocks():
    assert parse_blocks("0,1;2") == [[0, 1], [2]]
    assert parse_blocks("3") == [[3]]
    with pytest.raises(argparse.ArgumentTypeError):
        parse_blocks("a,b")


def test_handle_io(tmp_path):
    out = handle_io(tmp_path, tmp_path / "save")
    assert str(out) == str(tmp_path / "save")
    with pytest.raises(ValueError):
        handle_io(tmp_path / "missing", None)


def test_handle_io_default(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = handle_io(tmp_path, None)
    assert out.name == "outputs" and out.is_dir()


def test_plot_results_writes_pdf(tmp_path, rng):
    T = 50
    idx = make_dlc_pandas_index(["kp"], labels=["x", "y", "likelihood"])
    output_df = pd.DataFrame(rng.random((T, 3)), columns=idx)
    input_df = pd.DataFrame(
        rng.random((T, 3)), columns=["kp_x", "kp_y", "kp_likelihood"]
    )
    plot_results(
        output_df=output_df,
        input_dfs_list=[input_df],
        key="kp",
        s_final=1.5,
        nll_values=None,
        idxs=(0, T),
        save_dir=str(tmp_path),
        smoother_type="singlecam",
    )
    assert (tmp_path / "singlecam_kp.pdf").exists()
