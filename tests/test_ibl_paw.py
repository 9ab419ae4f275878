"""IBL paw smoother: camera-mean helpers, alignment prologue, e2e."""

import numpy as np
import pandas as pd
import pytest

from eks_tpu.models.ibl_paw import (
    add_camera_means,
    fit_eks_multicam_ibl_paw,
    remove_camera_means,
)
from tests.conftest import REFERENCE_DATA, reference_data_available


def test_camera_means_roundtrip(rng):
    stacks = [rng.normal(size=(20, 4)) for _ in range(2)]
    means = [5.0, -3.0]
    centered = remove_camera_means([s.copy() for s in stacks], means)
    np.testing.assert_allclose(centered[0][:, 0], stacks[0][:, 0] - 5.0)
    np.testing.assert_allclose(centered[1][:, 1], stacks[1][:, 1] + 3.0)
    restored = add_camera_means([c.copy() for c in centered], means)
    for orig, rest in zip(stacks, restored):
        np.testing.assert_allclose(rest[:, :2], orig[:, :2], rtol=1e-10)


def _write_paw_dir(tmp_path, rng, T_left=100, T_right=120, n_models=2):
    cols = pd.MultiIndex.from_product(
        [["model"], ["paw_l", "paw_r"], ["x", "y", "likelihood"]],
        names=["scorer", "bodyparts", "coords"],
    )
    ts_left = np.linspace(0.0, 10.0, T_left)
    ts_right = np.linspace(-0.5, 10.5, T_right)
    np.save(tmp_path / "sess.timestamps.left.npy", ts_left)
    np.save(tmp_path / "sess.timestamps.right.npy", ts_right)
    for m in range(n_models):
        dl = rng.normal(size=(T_left, 6)) * 2 + 60
        dl[:, [2, 5]] = 0.9
        pd.DataFrame(dl, columns=cols).to_csv(tmp_path / f"sess.left.rng={m}.csv")
        dr = rng.normal(size=(T_right, 6)) * 2 + 60
        dr[:, [2, 5]] = 0.9
        pd.DataFrame(dr, columns=cols).to_csv(tmp_path / f"sess.right.rng={m}.csv")
    return ts_left, ts_right


def test_fit_paw_synthetic(tmp_path, rng):
    _write_paw_dir(tmp_path, rng)
    out = tmp_path / "out"
    dfs, s, input_dfs, bps = fit_eks_multicam_ibl_paw(
        input_source=str(tmp_path),
        save_dir=str(out),
        smooth_param=3.0,
        var_mode="var",
    )
    assert bps == ["paw_l", "paw_r"]
    assert (out / "multicam_left_results.csv").exists()
    assert (out / "multicam_right_results.csv").exists()
    # all left frames fall inside the right camera's range -> none dropped
    assert dfs[0].shape[0] == 100
    assert np.isfinite(dfs[0].to_numpy()).all()


def test_fit_paw_drops_out_of_range_frames(tmp_path, rng):
    # right camera covers only part of the left camera's range
    ts_left, _ = _write_paw_dir(tmp_path, rng, T_left=100, T_right=50)
    ts_right = np.linspace(2.0, 8.0, 50)
    np.save(tmp_path / "sess.timestamps.right.npy", ts_right)
    dfs, _, _, _ = fit_eks_multicam_ibl_paw(
        input_source=str(tmp_path), save_dir=str(tmp_path / "o"),
        smooth_param=3.0, var_mode="var",
    )
    expected = int(((ts_left >= 2.0) & (ts_left <= 8.0)).sum())
    assert dfs[0].shape[0] == expected


def test_fit_paw_missing_timestamps(tmp_path, rng):
    _write_paw_dir(tmp_path, rng)
    (tmp_path / "sess.timestamps.right.npy").unlink()
    with pytest.raises(ValueError, match="timestamps"):
        fit_eks_multicam_ibl_paw(str(tmp_path), str(tmp_path / "o"))


@pytest.mark.skipif(not reference_data_available(), reason="reference data missing")
@pytest.mark.slow  # ~37s real-data run; golden suites pin this path
def test_fit_paw_e2e(tmp_path):
    dfs, s, input_dfs, bps = fit_eks_multicam_ibl_paw(
        input_source=f"{REFERENCE_DATA}/ibl-paw",
        save_dir=str(tmp_path),
        s_frames=[(0, 200)],
        var_mode="var",
    )
    assert len(dfs) == 2
    assert (tmp_path / "multicam_left_results.csv").exists()
    assert len(s) == 2 and np.isfinite(s).all()
    for df in dfs:
        assert np.isfinite(df.to_numpy()).all()


def test_camera_means_helpers_do_not_mutate_inputs(rng):
    """remove/add_camera_means return NEW arrays; the shallow list.copy()
    previously wrote through to the caller's ndarrays (round-5 self-review)."""
    from eks_tpu.models.ibl_paw import add_camera_means, remove_camera_means

    stacks = [rng.normal(size=(20, 2)) for _ in range(3)]
    originals = [s.copy() for s in stacks]
    means = [1.5, -2.0]
    removed = remove_camera_means(stacks, means)
    for s, o in zip(stacks, originals):
        np.testing.assert_array_equal(s, o)
    added = add_camera_means(removed, means)
    for s, o in zip(stacks, originals):
        np.testing.assert_array_equal(s, o)
    for a, o in zip(added, originals):
        np.testing.assert_allclose(a, o, atol=1e-12)
