"""Frame-span cropping, observation-noise builders, and centering.

Span semantics (reference: eks/utils.py:235-290): 0-based half-open
``(start, end)`` tuples, None = open end, multiple non-overlapping spans are
concatenated in ascending order.
"""

from __future__ import annotations

import numpy as np

from eks_tpu.marker_array import MarkerArray

__all__ = [
    "crop_frames",
    "crop_R",
    "build_R_from_vars",
    "center_predictions",
]


def _validate_spans(s_frames, n: int) -> list[tuple[int, int]]:
    if not isinstance(s_frames, list):
        raise TypeError("s_frames must be a list of (start, end) tuples or None.")
    spans = []
    for i, frame in enumerate(s_frames):
        if not (isinstance(frame, tuple) and len(frame) == 2):
            raise ValueError(f"s_frames[{i}] must be a (start, end) tuple, got {frame!r}")
        start, end = frame
        if start is not None and not isinstance(start, int):
            raise ValueError(f"s_frames[{i}].start must be int or None, got {start!r}")
        if end is not None and not isinstance(end, int):
            raise ValueError(f"s_frames[{i}].end must be int or None, got {end!r}")
        lo = 0 if start is None else start
        hi = n if end is None else end
        if lo < 0 or hi > n:
            raise ValueError(f"Range ({lo}, {hi}) out of bounds for length {n}.")
        if lo >= hi:
            raise ValueError(f"Invalid range ({lo}, {hi}).")
        spans.append((lo, hi))
    spans.sort(key=lambda s: s[0])
    for i in range(1, len(spans)):
        if spans[i][0] < spans[i - 1][1]:
            raise ValueError(
                f"Overlapping or out-of-order intervals: {spans[i - 1]} and {spans[i]}"
            )
    return spans


def crop_frames(y: np.ndarray, s_frames) -> np.ndarray:
    """Concatenate the frame spans of ``y`` selected by ``s_frames`` (axis 0)."""
    n = len(y)
    if s_frames is None or len(s_frames) == 0:
        return y
    if len(s_frames) == 1 and s_frames[0] == (None, None):
        return y
    spans = _validate_spans(s_frames, n)
    if len(spans) == 1:
        lo, hi = spans[0]
        return y[lo:hi]
    return np.concatenate([y[lo:hi] for lo, hi in spans], axis=0)


def crop_R(R: np.ndarray, s_frames) -> np.ndarray:
    """Crop a (..., T, O, O) time-varying covariance along its time axis."""
    if not s_frames:
        return np.asarray(R)
    R_np = np.asarray(R)
    leading = R_np.shape[:-3]
    T, o1, o2 = R_np.shape[-3:]
    assert o1 == o2, "R_tv must be square in its last two dims"
    flat = R_np.reshape((-1, T, o1, o1))
    cropped = np.stack([crop_frames(block, s_frames) for block in flat], axis=0)
    return cropped.reshape((*leading, -1, o1, o1))


def build_R_from_vars(ev: np.ndarray) -> np.ndarray:
    """(..., T, O) per-dim variances -> (..., T, O, O) diagonal covariances,
    floored at 1e-12 (reference: eks/utils.py:368-377)."""
    ev_np = np.clip(np.asarray(ev), 1e-12, None)
    o = ev_np.shape[-1]
    return ev_np[..., :, None] * np.eye(o, dtype=ev_np.dtype)


def center_predictions(
    ensemble_marker_array: MarkerArray,
    quantile_keep_pca: float,
) -> tuple[np.ndarray, MarkerArray, MarkerArray, MarkerArray]:
    """Variance-quantile frame filter + per-camera/per-keypoint mean centering.

    Per keypoint, frames whose max-over-cameras ensemble variance exceeds the
    per-keypoint ``quantile_keep_pca`` percentile are marked invalid; all
    keypoints are truncated to the global minimum count of valid frames, and
    predictions are centered by the mean over those valid frames
    (reference: eks/utils.py:293-365).

    Returns:
        (valid_frames_mask (T, K) bool,
         emA_centered_preds (1, C, T, K, 2),
         emA_good_centered_preds (1, C, T_good, K, 2),
         emA_means (1, C, 1, K, 2))
    """
    n_models, n_cameras, n_frames, n_keypoints, _ = ensemble_marker_array.shape
    assert n_models == 1, "MarkerArray should have n_models = 1 after ensembling."

    preds = ensemble_marker_array.slice_fields("x", "y").array  # (1,C,T,K,2)
    variances = ensemble_marker_array.slice_fields("var_x", "var_y").array

    # per-frame max variance over cameras and x/y -> (T, K)
    max_vars = np.max(variances, axis=(0, 1, 4))
    thresholds = np.percentile(max_vars, quantile_keep_pca, axis=0)
    valid_frames_mask = max_vars <= thresholds  # (T, K)

    good_idx_per_kp = [np.where(valid_frames_mask[:, k])[0] for k in range(n_keypoints)]
    min_frames = min(len(idx) for idx in good_idx_per_kp)

    centered_list, good_centered_list, means_list = [], [], []
    for k in range(n_keypoints):
        idx = good_idx_per_kp[k][:min_frames]
        good_k = preds[:, :, idx, k, :][:, :, :, None, :]  # (1,C,Tg,1,2)
        means_k = np.mean(good_k, axis=2)[:, :, None, :, :]  # (1,C,1,1,2)
        centered_k = preds[:, :, :, k: k + 1, :] - means_k
        good_centered_k = good_k - means_k

        centered_list.append(MarkerArray(centered_k, data_fields=["x", "y"]))
        good_centered_list.append(MarkerArray(good_centered_k, data_fields=["x", "y"]))
        means_list.append(MarkerArray(means_k, data_fields=["x", "y"]))

    return (
        valid_frames_mask,
        MarkerArray.stack(centered_list, "keypoints"),
        MarkerArray.stack(good_centered_list, "keypoints"),
        MarkerArray.stack(means_list, "keypoints"),
    )
