"""Native C++ CSV loader: build, parse, and pandas parity."""

import os
import time

import numpy as np
import pandas as pd
import pytest

from eks_tpu.native import load_dlc_csv_fast, native_available
from eks_tpu.utils.io import _load_one, _load_one_native, convert_lp_dlc
from tests.conftest import REFERENCE_DATA, reference_data_available

needs_native = pytest.mark.skipif(
    not native_available(), reason="native loader unavailable (no g++?)"
)


def _write_csv(path, rng, kps=("nose", "paw"), T=30, scorer="m0"):
    cols = pd.MultiIndex.from_product(
        [[scorer], list(kps), ["x", "y", "likelihood"]],
        names=["scorer", "bodyparts", "coords"],
    )
    df = pd.DataFrame(rng.random((T, len(kps) * 3)), columns=cols)
    df.to_csv(path)
    return df


@needs_native
def test_parse_shapes_and_values(tmp_path, rng):
    p = tmp_path / "a.csv"
    df = _write_csv(p, rng)
    data, headers = load_dlc_csv_fast(str(p))
    assert data.shape == (30, 6)
    np.testing.assert_allclose(data, df.to_numpy(), rtol=0, atol=0)
    assert headers[1][1:] == ["nose"] * 3 + ["paw"] * 3
    assert headers[2][1:] == ["x", "y", "likelihood"] * 2


@needs_native
def test_load_one_native_matches_pandas(tmp_path, rng):
    p = tmp_path / "b.csv"
    _write_csv(p, rng, kps=("a", "b", "c"), T=50)
    fast, kps_fast = _load_one_native(str(p))
    raw = pd.read_csv(p, header=[0, 1, 2], index_col=0)
    from eks_tpu.utils.io import get_keypoint_names

    kps = get_keypoint_names(raw)
    slow = convert_lp_dlc(raw, kps)
    assert kps_fast == kps
    assert list(fast.columns) == list(slow.columns)
    # pandas' xstrtod and C strtod may differ in the last ulp
    np.testing.assert_allclose(fast.to_numpy(), slow.to_numpy(), rtol=1e-13)


@needs_native
@pytest.mark.skipif(not reference_data_available(), reason="reference data missing")
def test_native_matches_pandas_on_real_data():
    d = f"{REFERENCE_DATA}/ibl-pupil"
    for fname in sorted(os.listdir(d))[:2]:
        path = os.path.join(d, fname)
        fast, kps_fast = _load_one_native(path)
        raw = pd.read_csv(path, header=[0, 1, 2], index_col=0)
        from eks_tpu.utils.io import get_keypoint_names

        kps = get_keypoint_names(raw)
        slow = convert_lp_dlc(raw, kps)
        assert kps_fast == kps
        np.testing.assert_allclose(fast.to_numpy(), slow.to_numpy(), rtol=1e-13)


@needs_native
def test_fallback_env_var(tmp_path, rng, monkeypatch):
    p = tmp_path / "c.csv"
    _write_csv(p, rng)
    monkeypatch.setenv("EKS_TPU_NATIVE_CSV", "0")
    df0, _ = _load_one(str(p))
    monkeypatch.setenv("EKS_TPU_NATIVE_CSV", "1")
    df1, _ = _load_one(str(p))
    np.testing.assert_allclose(df0.to_numpy(), df1.to_numpy(), rtol=1e-13)


@needs_native
def test_malformed_file_returns_none(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("just,one,line\n")
    assert load_dlc_csv_fast(str(p)) is None
    assert load_dlc_csv_fast(str(tmp_path / "missing.csv")) is None
