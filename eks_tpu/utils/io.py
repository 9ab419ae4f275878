"""CSV/SLP loading and DLC-format conversion.

Input contract (same as reference eks/utils.py:138-232): a directory, list of
files, or {camera: [files]} dict of prediction CSVs in the
DeepLabCut/Lightning-Pose 3-row-header format (scorer / bodyparts / coords),
or SLEAP ``.slp`` files. Output CSVs use scorer ``ensemble-kalman_tracker``.

Unlike the reference (which requires the sleap_io package), ``.slp`` files are
read first-party via h5py (see :func:`read_slp_predictions`).
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

__all__ = [
    "make_dlc_pandas_index",
    "convert_lp_dlc",
    "convert_slp_dlc",
    "read_slp_predictions",
    "get_keypoint_names",
    "format_data",
]

_COORDS = ("x", "y", "likelihood")


def make_dlc_pandas_index(
    keypoint_names: list,
    labels: list = ["x", "y", "likelihood"],
) -> pd.MultiIndex:
    """Three-level (scorer, bodyparts, coords) MultiIndex for output CSVs."""
    return pd.MultiIndex.from_product(
        [["ensemble-kalman_tracker"], keypoint_names, labels],
        names=["scorer", "bodyparts", "coords"],
    )


def save_dlc_csv(df: pd.DataFrame, path: str) -> None:
    """Write an output DataFrame as CSV through the native writer when it
    applies (homogeneous float table, unit-step integer index — every
    smoother output qualifies), byte-identical to ``df.to_csv(path)`` and
    ~7x faster; falls back to pandas otherwise. The CSV write was the
    single largest cost of a CLI run after the smoothing itself
    (~2.1 s via pandas for a 10k-frame x 20-keypoint table)."""
    from eks_tpu.native import write_dlc_csv_fast

    if not write_dlc_csv_fast(df, path):
        df.to_csv(path)


def convert_lp_dlc(
    df_lp: pd.DataFrame,
    keypoint_names: list,
    model_name: str | None = None,
) -> pd.DataFrame:
    """Flatten a (scorer, bodypart, coord) MultiIndex DataFrame into
    ``{keypoint}_{coord}`` columns; missing or unnamed columns are skipped.

    Same contract as reference eks/utils.py:35-69.
    """
    scorer = str(df_lp.columns[0][0]) if model_name is None else model_name
    present = set(map(tuple, df_lp.columns))

    def _usable(key: tuple) -> bool:
        if key not in present:
            return False
        return not any(
            isinstance(part, str) and part.startswith("Unnamed") for part in key
        )

    flat = {}
    for kp in keypoint_names:
        for coord in _COORDS:
            key = (scorer, kp, coord)
            if _usable(key):
                flat[f"{kp}_{coord}"] = df_lp[key]
    return pd.DataFrame(flat, index=df_lp.index)


# ---------------------------------------------------------------------- #
# first-party SLEAP .slp ingestion (HDF5 via h5py)
# ---------------------------------------------------------------------- #
def _slp_node_names(h5file) -> list[str]:
    """Skeleton node names from the .slp metadata JSON blob.

    The .slp container stores a jsonpickle document under
    ``/metadata@json``; its top-level ``nodes`` list carries the node names in
    skeleton order (SLEAP's default serialization).
    """
    blob = h5file["metadata"].attrs["json"]
    if isinstance(blob, bytes):
        blob = blob.decode("utf-8")
    meta = json.loads(blob)
    return [node["name"] for node in meta["nodes"]]


def read_slp_predictions(file_path: str) -> tuple[np.ndarray, list[str]]:
    """Read a SLEAP ``.slp`` file into a dense (frames, instances, nodes, 3)
    array of (x, y, score) plus the node-name list — no sleap_io needed.

    The .slp layout (HDF5): ``frames`` rows point at a span of ``instances``
    rows, which point at spans of ``points`` (user labels) or ``pred_points``
    (predictions, carrying a per-point score). Instance rows with
    ``instance_type == 1`` are predictions. Replaces the reference's
    sleap_io dependency (reference behavior: eks/utils.py:72-122).
    """
    import h5py

    with h5py.File(file_path, "r") as f:
        node_names = _slp_node_names(f)
        frames = f["frames"][:]
        instances = f["instances"][:]
        points = f["points"][:] if "points" in f else np.empty((0,))
        pred_points = f["pred_points"][:] if "pred_points" in f else np.empty((0,))

    n_nodes = len(node_names)
    n_frames = len(frames)
    if n_frames == 0:
        return np.zeros((0, 0, n_nodes, 3)), node_names

    spans = [
        (int(row["instance_id_start"]), int(row["instance_id_end"]))
        for row in frames
    ]
    # the reference caps the instance count at the FIRST frame's count
    max_instances = spans[0][1] - spans[0][0]

    dense = np.zeros((n_frames, max_instances, n_nodes, 3))
    for fi, (lo, hi) in enumerate(spans):
        for slot, inst in enumerate(instances[lo:hi][:max_instances]):
            predicted = int(inst["instance_type"]) == 1
            table = pred_points if predicted else points
            p0, p1 = int(inst["point_id_start"]), int(inst["point_id_end"])
            rows = table[p0:p1]
            for k in range(min(n_nodes, len(rows))):
                x, y = float(rows[k]["x"]), float(rows[k]["y"])
                dense[fi, slot, k, 0] = 0.0 if np.isnan(x) else x
                dense[fi, slot, k, 1] = 0.0 if np.isnan(y) else y
                score = float(rows[k]["score"]) if predicted else 0.0
                dense[fi, slot, k, 2] = score + 1e-6
    return dense, node_names


def convert_slp_dlc(base_dir: str, slp_file: str) -> tuple:
    """Read a SLEAP ``.slp`` file into a flat DLC-style DataFrame with
    ``{instance}_{keypoint}_{coord}`` columns (instances are 1-indexed),
    and drop a ``.csv`` copy next to the working directory.

    Same exterior contract as reference eks/utils.py:72-122, built on the
    first-party :func:`read_slp_predictions` instead of sleap_io.
    """
    dense, keypoint_names = read_slp_predictions(os.path.join(base_dir, slp_file))
    n_frames, max_instances = dense.shape[:2]
    columns = [
        f"{j + 1}_{kp}_{coord}"
        for j in range(max_instances)
        for kp in keypoint_names
        for coord in _COORDS
    ]
    df = pd.DataFrame(dense.reshape(n_frames, -1), columns=columns)
    df.to_csv(f"{slp_file}.csv", index=False)
    logger.info(f"converted {slp_file}; flat copy written to {slp_file}.csv")
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
        for coord in _COORDS:
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


def _candidate_paths(input_source) -> list | dict:
    """Normalize the input_source forms to either a sorted path list or a
    {camera: [paths]} dict."""
    if isinstance(input_source, str) and os.path.isdir(input_source):
        return sorted(
            os.path.join(input_source, f) for f in os.listdir(input_source)
        )
    if isinstance(input_source, list):
        return sorted(input_source)
    if isinstance(input_source, dict):
        return input_source
    raise ValueError(
        f"cannot interpret input_source of type {type(input_source).__name__}; "
        "pass a directory, a list of prediction files, or a "
        "{camera: [files]} mapping"
    )


def _paths_for_camera(file_paths, camera: str) -> list[str]:
    """Loadable files belonging to one camera (by filename substring for a
    flat list, by key for a dict)."""
    pool = file_paths if isinstance(file_paths, list) else file_paths.get(camera, [])
    return [
        fp
        for fp in pool
        if camera in os.path.basename(fp) and fp.endswith((".csv", ".slp"))
    ]


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

    Same exterior contract as reference eks/utils.py:138-232.
    """
    file_paths = _candidate_paths(input_source)

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
            cam_paths = _paths_for_camera(file_paths, camera)
            if not cam_paths:
                raise FileNotFoundError(
                    f"camera '{camera}' matched nothing under {input_source}; "
                    "each prediction filename must contain its camera's name"
                )
            dfs_this_cam = []
            for fp in cam_paths:
                loaded = _load_one(fp)
                if loaded is None:
                    raise ValueError(f"cannot load predictions from {fp!r}")
                df, keypoint_names = loaded
                dfs_this_cam.append(df)
            input_dfs_list.append(dfs_this_cam)

        seed_counts = {len(dfs) for dfs in input_dfs_list}
        if len(seed_counts) > 1:
            detail = ", ".join(
                f"{cam}={len(dfs)}"
                for cam, dfs in zip(camera_names, input_dfs_list, strict=True)
            )
            logger.warning(f"cameras carry different ensemble sizes: {detail}")

    if len(input_dfs_list) == 0:
        raise FileNotFoundError(
            f"found no loadable prediction files in {input_source}"
        )
    assert keypoint_names is not None
    return input_dfs_list, keypoint_names
