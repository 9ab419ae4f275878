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


class TestNativeCsvWriter:
    """The native writer must be byte-identical to df.to_csv for every
    table shape the smoothers emit."""

    def _frame(self, dtype, T=97, K=3):
        rng = np.random.default_rng(0)
        cols = pd.MultiIndex.from_product(
            [["ensemble-kalman_tracker"], [f"kp{i}" for i in range(K)],
             ["x", "y", "likelihood"]],
            names=["scorer", "bodyparts", "coords"],
        )
        vals = rng.normal(size=(T, K * 3)).astype(dtype)
        # exercise the formatter's branches: integral, tiny, huge, special
        vals[0, 0] = 2.0
        vals[1, 0] = 1e-8
        vals[2, 0] = 1.5e16
        vals[3, 0] = -0.0
        vals[4, 0] = np.nan
        vals[5, 0] = 123456.789
        vals[6, 0] = np.inf
        vals[7, 0] = 0.1
        return pd.DataFrame(vals, columns=cols)

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_byte_identical_to_pandas(self, tmp_path, dtype):
        from eks_tpu.native import write_dlc_csv_fast

        df = self._frame(dtype)
        fast, ref = tmp_path / "fast.csv", tmp_path / "ref.csv"
        if not write_dlc_csv_fast(df, str(fast)):
            pytest.skip("native writer unavailable (no compiler)")
        df.to_csv(ref)
        assert fast.read_bytes() == ref.read_bytes()

    def test_save_dlc_csv_falls_back(self, tmp_path):
        """Non-float tables must round-trip through the pandas fallback."""
        from eks_tpu.utils import save_dlc_csv

        df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
        p = tmp_path / "mixed.csv"
        save_dlc_csv(df, str(p))
        assert p.read_text() == df.to_csv()

    def test_random_values_byte_identical(self, tmp_path):
        """Fuzz the formatter across magnitudes (1e-40..1e20, f32)."""
        from eks_tpu.native import write_dlc_csv_fast

        rng = np.random.default_rng(1)
        exps = rng.uniform(-40, 20, size=(500, 4))
        vals = (rng.choice([-1.0, 1.0], size=exps.shape)
                * rng.uniform(1, 10, size=exps.shape)
                * 10.0 ** exps).astype(np.float32)
        df = pd.DataFrame(vals)
        fast, ref = tmp_path / "f.csv", tmp_path / "r.csv"
        if not write_dlc_csv_fast(df, str(fast)):
            pytest.skip("native writer unavailable (no compiler)")
        df.to_csv(ref)
        assert fast.read_bytes() == ref.read_bytes()
