"""MarkerArray container: slicing, stacking, reordering, converters."""

import numpy as np
import pandas as pd
import pytest

from eks_tpu.marker_array import (
    MarkerArray,
    input_dfs_to_markerArray,
    mA_to_stacked_array,
    stacked_array_to_mA,
)


def structured(M=2, C=3, T=5, K=4, F=3):
    """Value encodes its own coordinates: v = m*10000 + c*1000 + t*100 + k*10 + f."""
    arr = np.zeros((M, C, T, K, F), dtype=np.float32)
    for m in range(M):
        for c in range(C):
            for t in range(T):
                for k in range(K):
                    for f in range(F):
                        arr[m, c, t, k, f] = m * 10000 + c * 1000 + t * 100 + k * 10 + f
    return MarkerArray(arr, data_fields=["x", "y", "likelihood"][:F])


def test_construction_modes():
    ma = structured()
    assert ma.shape == (2, 3, 5, 4, 3)
    assert (ma.n_models, ma.n_cameras, ma.n_frames, ma.n_keypoints, ma.n_fields) == ma.shape
    empty = MarkerArray(shape=(1, 2, 5, 4, 2), data_fields=["x", "y"])
    assert empty.array.sum() == 0 and empty.array.dtype == np.float32
    clone = MarkerArray(marker_array=ma)
    assert clone.data_fields == ma.data_fields
    np.testing.assert_array_equal(clone.array, ma.array)
    clone.array[0, 0, 0, 0, 0] = -1  # clone is a copy
    assert ma.array[0, 0, 0, 0, 0] != -1
    with pytest.raises(AssertionError):
        MarkerArray()


def test_slice_named_axes():
    ma = structured()
    s = ma.slice("cameras", 1)
    assert s.shape == (2, 1, 5, 4, 3)
    assert (s.array[:, 0] == ma.array[:, 1]).all()
    s2 = ma.slice("keypoints", [0, 2])
    assert s2.shape == (2, 3, 5, 2, 3)
    assert (s2.array[..., 1, :] == ma.array[..., 2, :]).all()
    with pytest.raises(AssertionError):
        ma.slice("bogus", 0)


def test_slice_fields_and_reorder():
    ma = structured()
    xy = ma.slice_fields("x", "y")
    assert xy.data_fields == ["x", "y"] and xy.shape[-1] == 2
    yl = ma.slice_fields("likelihood", "x")
    assert (yl.array[..., 0] % 10 == 2).all()
    re = ma.reorder_data_fields(["likelihood", "x", "y"])
    assert re.data_fields == ["likelihood", "x", "y"]
    assert (re.array[..., 0] == ma.array[..., 2]).all()
    with pytest.raises(AssertionError):
        ma.slice_fields("nope")
    with pytest.raises(AssertionError):
        ma.reorder_data_fields(["x", "y"])


def test_stack_and_stack_fields():
    a, b = structured(), structured()
    st = MarkerArray.stack([a, b], "models")
    assert st.shape == (4, 3, 5, 4, 3)
    x = a.slice_fields("x")
    y = a.slice_fields("y")
    sf = MarkerArray.stack_fields(x, y)
    assert sf.data_fields == ["x", "y"]
    np.testing.assert_array_equal(sf.array, a.slice_fields("x", "y").array)
    # shape mismatch errors
    small = MarkerArray(shape=(2, 3, 4, 4, 1), data_fields=["z"])
    with pytest.raises(AssertionError):
        MarkerArray.stack_fields(x, small)
    with pytest.raises(AssertionError):
        MarkerArray.stack([a, small], "models")


def test_input_dfs_to_markerArray():
    T = 6
    kps = ["nose", "paw"]
    dfs = []
    for m in range(2):
        cols = {}
        for k, kp in enumerate(kps):
            cols[f"{kp}_x"] = np.arange(T) + 100 * m + 10 * k
            cols[f"{kp}_y"] = np.arange(T) + 0.5
            cols[f"{kp}_likelihood"] = np.full(T, 0.9)
        dfs.append(pd.DataFrame(cols))
    ma = input_dfs_to_markerArray([dfs], kps, [""])
    assert ma.shape == (2, 1, T, 2, 3)
    np.testing.assert_array_equal(ma.array[1, 0, :, 1, 0], np.arange(T) + 110)


def test_stacked_array_roundtrip():
    ma = structured(M=1, C=2, T=5, K=3, F=2)
    ma.data_fields = ["x", "y"]
    flat = mA_to_stacked_array(ma, 1)
    assert flat.shape == (5, 4)  # (T, C*F)
    # layout: [cam0_x, cam0_y, cam1_x, cam1_y]
    np.testing.assert_array_equal(flat[:, 0], ma.array[0, 0, :, 1, 0])
    np.testing.assert_array_equal(flat[:, 2], ma.array[0, 1, :, 1, 0])
    back = stacked_array_to_mA(flat, n_cameras=2, data_fields=["x", "y"])
    assert back.shape == (1, 2, 5, 1, 2)
    np.testing.assert_array_equal(
        back.array[0, :, :, 0, :], ma.array[0, :, :, 1, :]
    )
    with pytest.raises(AssertionError):
        mA_to_stacked_array(ma, 7)
