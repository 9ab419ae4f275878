"""IO/frames utils: crop semantics, format_data inputs, centering, R builders."""

import numpy as np
import pandas as pd
import pytest

from eks_tpu.core import ensemble
from eks_tpu.marker_array import MarkerArray
from eks_tpu.utils import (
    build_R_from_vars,
    center_predictions,
    convert_lp_dlc,
    crop_frames,
    crop_R,
    format_data,
    make_dlc_pandas_index,
)


def _make_dlc_csv(path, kps, T=10, scorer="model0", seed=0):
    rng = np.random.default_rng(seed)
    cols = pd.MultiIndex.from_product(
        [[scorer], kps, ["x", "y", "likelihood"]],
        names=["scorer", "bodyparts", "coords"],
    )
    df = pd.DataFrame(rng.random((T, len(kps) * 3)), columns=cols)
    df.to_csv(path)
    return df


# ------------------------- crop_frames ------------------------- #
def test_crop_frames_semantics():
    y = np.arange(100)
    np.testing.assert_array_equal(crop_frames(y, None), y)
    np.testing.assert_array_equal(crop_frames(y, [(None, None)]), y)
    np.testing.assert_array_equal(crop_frames(y, []), y)
    np.testing.assert_array_equal(crop_frames(y, [(0, 10)]), np.arange(10))
    np.testing.assert_array_equal(crop_frames(y, [(None, 10)]), np.arange(10))
    np.testing.assert_array_equal(crop_frames(y, [(90, None)]), np.arange(90, 100))
    np.testing.assert_array_equal(
        crop_frames(y, [(0, 5), (10, 15)]),
        np.concatenate([np.arange(5), np.arange(10, 15)]),
    )
    # spans get sorted
    np.testing.assert_array_equal(
        crop_frames(y, [(10, 15), (0, 5)]),
        np.concatenate([np.arange(5), np.arange(10, 15)]),
    )


def test_crop_frames_errors():
    y = np.arange(10)
    with pytest.raises(TypeError):
        crop_frames(y, "not-a-list")
    with pytest.raises(ValueError):
        crop_frames(y, [(0, 5, 7)])
    with pytest.raises(ValueError):
        crop_frames(y, [(0.5, 5)])
    with pytest.raises(ValueError):
        crop_frames(y, [(5, 5)])
    with pytest.raises(ValueError):
        crop_frames(y, [(-1, 5)])
    with pytest.raises(ValueError):
        crop_frames(y, [(0, 11)])
    with pytest.raises(ValueError):
        crop_frames(y, [(0, 6), (5, 9)])


def test_crop_R():
    R = build_R_from_vars(np.abs(np.random.default_rng(0).normal(size=(20, 2))))
    out = crop_R(R, [(0, 5), (10, 12)])
    assert out.shape == (7, 2, 2)
    np.testing.assert_array_equal(out[:5], R[:5])
    np.testing.assert_array_equal(out[5:], R[10:12])
    np.testing.assert_array_equal(crop_R(R, None), R)


def test_build_R_from_vars():
    ev = np.array([[0.5, 2.0], [0.0, 1e-20]])
    R = build_R_from_vars(ev)
    assert R.shape == (2, 2, 2)
    assert R[0, 0, 0] == 0.5 and R[0, 1, 1] == 2.0
    assert R[1, 0, 0] == 1e-12 and R[1, 1, 1] == 1e-12  # floor
    assert (R[:, 0, 1] == 0).all()


# ------------------------- format_data ------------------------- #
def test_format_data_directory(tmp_path):
    kps = ["nose", "paw"]
    for i in range(3):
        _make_dlc_csv(tmp_path / f"preds.rng={i}.csv", kps, seed=i)
    dfs, names = format_data(str(tmp_path))
    assert len(dfs) == 3 and names == kps
    assert f"{kps[0]}_x" in dfs[0].columns


def test_format_data_file_list(tmp_path):
    kps = ["a", "b"]
    paths = []
    for i in range(2):
        p = tmp_path / f"m{i}.csv"
        _make_dlc_csv(p, kps, seed=i)
        paths.append(str(p))
    dfs, names = format_data(paths)
    assert len(dfs) == 2 and names == kps


def test_format_data_camera_matching(tmp_path):
    kps = ["a"]
    for cam in ["top", "bot"]:
        for i in range(2):
            _make_dlc_csv(tmp_path / f"sess.{cam}.rng={i}.csv", kps, seed=i)
    dfs, names = format_data(str(tmp_path), camera_names=["top", "bot"])
    assert len(dfs) == 2 and all(len(d) == 2 for d in dfs)
    with pytest.raises(FileNotFoundError):
        format_data(str(tmp_path), camera_names=["left"])


def test_format_data_dict_input(tmp_path):
    kps = ["a"]
    source = {}
    for cam in ["c0", "c1"]:
        paths = []
        for i in range(2):
            p = tmp_path / f"{cam}.rng={i}.csv"
            _make_dlc_csv(p, kps, seed=i)
            paths.append(str(p))
        source[cam] = paths
    dfs, _ = format_data(source, camera_names=["c0", "c1"])
    assert len(dfs) == 2 and all(len(d) == 2 for d in dfs)


def test_format_data_invalid():
    with pytest.raises(ValueError):
        format_data(42)
    with pytest.raises(FileNotFoundError):
        format_data([])


def test_convert_lp_dlc(tmp_path):
    kps = ["nose"]
    df = _make_dlc_csv(tmp_path / "x.csv", kps)
    flat = convert_lp_dlc(df, kps)
    assert list(flat.columns) == ["nose_x", "nose_y", "nose_likelihood"]
    np.testing.assert_array_equal(flat["nose_x"], df[("model0", "nose", "x")])


def test_make_dlc_pandas_index():
    idx = make_dlc_pandas_index(["a", "b"], labels=["x", "y"])
    assert idx.names == ["scorer", "bodyparts", "coords"]
    assert idx[0] == ("ensemble-kalman_tracker", "a", "x")
    assert len(idx) == 4


# --------------------- center_predictions ---------------------- #
def test_center_predictions_quantile_and_truncation(rng):
    M, C, T, K = 1, 2, 40, 2
    arr = np.zeros((M, C, T, K, 5))
    arr[..., :2] = rng.normal(size=(M, C, T, K, 2)) + 10
    arr[..., 2:4] = 0.1
    # keypoint 0: 8 high-variance frames; keypoint 1: 4
    arr[0, 0, :8, 0, 2] = 100.0
    arr[0, 1, 10:14, 1, 3] = 100.0
    ma = MarkerArray(arr, data_fields=["x", "y", "var_x", "var_y", "likelihood"])
    mask, centered, good_centered, means = center_predictions(ma, 50.0)
    assert mask.shape == (T, K)
    assert not mask[:8, 0].any() and not mask[10:14, 1].any()
    # all keypoints truncated to the min number of good frames
    n_good = good_centered.shape[2]
    assert n_good == min(mask[:, 0].sum(), mask[:, 1].sum())
    # centering: good frames have ~zero mean
    assert abs(good_centered.array.mean()) < 1e-6
    assert centered.shape == (1, C, T, K, 2)
    assert means.shape == (1, C, 1, K, 2)


# ------------------------- .slp reader ------------------------- #
def _make_slp(path, node_names, xy, scores):
    """Write a minimal SLEAP .slp container: one predicted instance per frame.

    xy: (T, K, 2) float; scores: (T, K) float.
    """
    import json

    import h5py

    T, K, _ = xy.shape
    frames_dt = np.dtype(
        [
            ("frame_id", "u8"),
            ("video", "u4"),
            ("frame_idx", "u8"),
            ("instance_id_start", "u8"),
            ("instance_id_end", "u8"),
        ]
    )
    inst_dt = np.dtype(
        [
            ("instance_id", "u8"),
            ("instance_type", "u1"),
            ("frame_id", "u8"),
            ("skeleton", "u4"),
            ("track", "i4"),
            ("from_predicted", "i8"),
            ("score", "f4"),
            ("point_id_start", "u8"),
            ("point_id_end", "u8"),
        ]
    )
    pred_dt = np.dtype(
        [("x", "f8"), ("y", "f8"), ("visible", "?"), ("complete", "?"), ("score", "f8")]
    )
    frames = np.zeros(T, dtype=frames_dt)
    insts = np.zeros(T, dtype=inst_dt)
    pts = np.zeros(T * K, dtype=pred_dt)
    for t in range(T):
        frames[t] = (t, 0, t, t, t + 1)
        insts[t] = (t, 1, t, 0, -1, -1, 0.9, t * K, (t + 1) * K)
        for k in range(K):
            pts[t * K + k] = (xy[t, k, 0], xy[t, k, 1], True, False, scores[t, k])
    meta = {"nodes": [{"name": n, "weight": 1.0} for n in node_names]}
    with h5py.File(path, "w") as f:
        f.create_dataset("frames", data=frames)
        f.create_dataset("instances", data=insts)
        f.create_dataset("pred_points", data=pts)
        f.create_group("metadata").attrs["json"] = json.dumps(meta)


def test_read_slp_predictions(tmp_path):
    from eks_tpu.utils.io import read_slp_predictions

    rng = np.random.default_rng(3)
    xy = rng.normal(size=(4, 2, 2))
    xy[2, 1, 0] = np.nan  # NaN coordinates are zeroed
    scores = rng.uniform(size=(4, 2))
    path = tmp_path / "sess.slp"
    _make_slp(path, ["nose", "tail"], xy, scores)

    dense, names = read_slp_predictions(str(path))
    assert names == ["nose", "tail"]
    assert dense.shape == (4, 1, 2, 3)
    np.testing.assert_allclose(dense[0, 0, :, 0], xy[0, :, 0])
    assert dense[2, 0, 1, 0] == 0.0  # NaN -> 0
    np.testing.assert_allclose(dense[..., 2], scores[:, None, :] + 1e-6)


def test_format_data_slp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # convert_slp_dlc drops a CSV copy in cwd
    rng = np.random.default_rng(4)
    _make_slp(
        tmp_path / "preds.slp",
        ["a", "b"],
        rng.normal(size=(5, 2, 2)),
        rng.uniform(size=(5, 2)),
    )
    dfs, names = format_data([str(tmp_path / "preds.slp")])
    assert names == ["a", "b"]
    assert list(dfs[0].columns) == [
        "1_a_x", "1_a_y", "1_a_likelihood", "1_b_x", "1_b_y", "1_b_likelihood",
    ]
    assert dfs[0].shape == (5, 6)


def test_center_predictions_quantile_100_keeps_all(rng):
    ma_in = MarkerArray(
        np.concatenate(
            [
                rng.normal(size=(1, 1, 30, 2, 2)),
                np.abs(rng.normal(size=(1, 1, 30, 2, 2))),
                rng.uniform(size=(1, 1, 30, 2, 1)),
            ],
            axis=-1,
        ),
        data_fields=["x", "y", "var_x", "var_y", "likelihood"],
    )
    mask, centered, good, _ = center_predictions(ma_in, 100)
    assert mask.all()
    assert good.shape[2] == 30
