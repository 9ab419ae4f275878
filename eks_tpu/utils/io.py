"""CSV/SLP loading and DLC-format conversion.

Input contract (reference: eks/utils.py:138-232): a directory, list of files,
or {camera: [files]} dict of prediction CSVs in the DeepLabCut/Lightning-Pose
3-row-header format (scorer / bodyparts / coords). Output CSVs use scorer
``ensemble-kalman_tracker``.
"""

from __future__ import annotations

import logging
import os

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

__all__ = [
    "make_dlc_pandas_index",
    "convert_lp_dlc",
    "convert_slp_dlc",
    "get_keypoint_names",
    "format_data",
]


def make_dlc_pandas_index(
    keypoint_names: list,
    labels: list = ["x", "y", "likelihood"],
) -> pd.MultiIndex:
    """Three-level (scorer, bodyparts, coords) MultiIndex for output CSVs."""
    return pd.MultiIndex.from_product(
        [["ensemble-kalman_tracker"], keypoint_names, labels],
        names=["scorer", "bodyparts", "coords"],
    )


def convert_lp_dlc(
    df_lp: pd.DataFrame,
    keypoint_names: list,
    model_name: str | None = None,
) -> pd.DataFrame:
    """Flatten a (scorer, bodypart, coord) MultiIndex DataFrame into
    ``{keypoint}_{coord}`` columns; missing or unnamed columns are skipped.
    """
    out = {}
    for kp in keypoint_names:
        for coord in ["x", "y", "likelihood"]:
            if model_name is None:
                model_name = str(df_lp.columns[0][0])
            col = (model_name, kp, coord)
            if any(
                isinstance(level, str) and level.startswith("Unnamed")
                for level in col
            ):
                continue
            try:
                out[f"{kp}_{coord}"] = df_lp.loc[:, col]
            except KeyError:
                continue
    return pd.DataFrame(out, index=df_lp.index)


def convert_slp_dlc(base_dir: str, slp_file: str) -> tuple:
    """Read a SLEAP ``.slp`` file into a flat DLC-style DataFrame.

    Requires the optional ``sleap_io`` dependency; raises ImportError with a
    clear message if unavailable (reference: eks/utils.py:72-122).
    """
    try:
        from sleap_io.io.slp import read_labels
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "reading .slp files requires the optional dependency 'sleap_io'"
        ) from e

    labels = read_labels(os.path.join(base_dir, slp_file))
    max_instances = len(labels[0].instances)
    keypoint_names = [node.name for node in labels[0].instances[0].points.keys()]
    n_kp = len(keypoint_names)
    n_frames = len(labels.labeled_frames)

    data = np.zeros((n_frames, max_instances, n_kp, 3))
    for i, frame in enumerate(labels.labeled_frames):
        for j, instance in enumerate(frame.instances):
            if j >= max_instances:
                break
            for k, node in enumerate(instance.points.keys()):
                pt = instance.points[node]
                data[i, j, k, 0] = 0 if np.isnan(pt.x) else pt.x
                data[i, j, k, 1] = 0 if np.isnan(pt.y) else pt.y
                data[i, j, k, 2] = getattr(pt, "score", 0) + 1e-6

    columns = []
    for j in range(max_instances):
        for kp in keypoint_names:
            columns.extend(
                [f"{j + 1}_{kp}_x", f"{j + 1}_{kp}_y", f"{j + 1}_{kp}_likelihood"]
            )
    df = pd.DataFrame(data.reshape(n_frames, -1), columns=columns)
    df.to_csv(f"{slp_file}.csv", index=False)
    logger.info(f"file read. see read-in data at {slp_file}.csv")
    return df, keypoint_names


def get_keypoint_names(df: pd.DataFrame) -> list:
    """Bodypart names, in column order, from a DLC MultiIndex DataFrame."""
    kps = df.columns[
        df.columns.get_level_values("coords") == "x"
    ].get_level_values("bodyparts")
    return kps.tolist()


def _load_one_native(file_path: str) -> tuple[pd.DataFrame, list] | None:
    """Load a DLC CSV through the native C++ parser (eks_tpu.native).

    Produces the exact flat-column DataFrame `convert_lp_dlc` builds from the
    pandas path; returns None when the native loader is unavailable so the
    caller falls back."""
    try:
        from eks_tpu.native import load_dlc_csv_fast
    except Exception:  # pragma: no cover
        return None
    parsed = load_dlc_csv_fast(file_path)
    if parsed is None:
        return None
    data, headers = parsed
    scorers, bodyparts, coords = (h[1:] for h in headers)  # drop index cells
    if len(bodyparts) != data.shape[1] or len(coords) != data.shape[1]:
        return None
    keypoint_names = [bp for bp, c in zip(bodyparts, coords) if c == "x"]
    model_name = scorers[0] if scorers else ""
    col_index: dict[tuple, int] = {}
    for i, key in enumerate(zip(scorers, bodyparts, coords)):
        col_index.setdefault(key, i)
    out = {}
    for kp in keypoint_names:
        for coord in ["x", "y", "likelihood"]:
            key = (model_name, kp, coord)
            if any(level.startswith("Unnamed") for level in key):
                continue
            idx = col_index.get(key)
            if idx is not None:
                out[f"{kp}_{coord}"] = data[:, idx]
    return pd.DataFrame(out), keypoint_names


def _load_one(file_path: str) -> tuple[pd.DataFrame, list] | None:
    """Load one prediction file; None for unsupported extensions."""
    if file_path.endswith(".slp"):
        df, keypoint_names = convert_slp_dlc(
            os.path.dirname(file_path), os.path.basename(file_path)
        )
        return df, keypoint_names
    if file_path.endswith(".csv"):
        if os.environ.get("EKS_TPU_NATIVE_CSV", "1") != "0":
            loaded = _load_one_native(file_path)
            if loaded is not None:
                return loaded
        raw = pd.read_csv(file_path, header=[0, 1, 2], index_col=0)
        keypoint_names = get_keypoint_names(raw)
        return convert_lp_dlc(raw, keypoint_names), keypoint_names
    return None


def format_data(
    input_source: str | list | dict,
    camera_names: list | None = None,
) -> tuple[list, list]:
    """Load prediction files into DataFrames.

    Args:
        input_source: a directory path, a list of file paths, or a dict
            mapping camera names to lists of file paths.
        camera_names: if given, files are matched to cameras by filename
            substring and the result is a list (per camera) of lists (per
            model); if None, the result is a flat list of model DataFrames.

    Returns:
        (input_dfs_list, keypoint_names)
    """
    if isinstance(input_source, str) and os.path.isdir(input_source):
        file_paths: list | dict = sorted(
            os.path.join(input_source, f) for f in os.listdir(input_source)
        )
    elif isinstance(input_source, list):
        file_paths = sorted(input_source)
    elif isinstance(input_source, dict):
        file_paths = input_source
    else:
        raise ValueError(
            "input_source must be a directory path, "
            "a list of file paths, or a map from camera names to list of file paths"
        )

    input_dfs_list: list = []
    keypoint_names = None

    if camera_names is None:
        for fp in file_paths:
            loaded = _load_one(fp)
            if loaded is None:
                continue
            df, keypoint_names = loaded
            input_dfs_list.append(df)
    else:
        for camera in camera_names:
            files = (
                file_paths
                if isinstance(file_paths, list)
                else file_paths.get(camera, [])
            )
            matched = [fp for fp in files if camera in os.path.basename(fp)]
            valid = [
                fp for fp in matched if fp.endswith(".csv") or fp.endswith(".slp")
            ]
            if len(valid) == 0:
                raise FileNotFoundError(
                    f"no files matching camera '{camera}' found in {input_source}. "
                    f"ensure the camera name appears as a substring of each filename."
                )
            dfs_this_cam = []
            for fp in valid:
                loaded = _load_one(fp)
                if loaded is None:
                    raise ValueError(f"unsupported file format: {fp}")
                df, keypoint_names = loaded
                dfs_this_cam.append(df)
            input_dfs_list.append(dfs_this_cam)

        seed_counts = [len(dfs) for dfs in input_dfs_list]
        if len(set(seed_counts)) > 1:
            counts = ", ".join(
                f"{cam}: {n}" for cam, n in zip(camera_names, seed_counts, strict=True)
            )
            logger.warning(f"unequal number of seed files per camera ({counts})")

    if len(input_dfs_list) == 0:
        raise FileNotFoundError(f"no valid marker input files found in {input_source}")
    assert keypoint_names is not None
    return input_dfs_list, keypoint_names
