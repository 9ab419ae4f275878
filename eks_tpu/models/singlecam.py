"""Single-camera EKS: per-keypoint 2-D random-walk smoothing.

Model (reference: eks/singlecam_smoother.py:105-284): state = (x, y) with
``A = C = Q = I_2``, initial covariance from the variance of the centered
ensemble trajectory, observation noise = per-frame ensemble variance. One
smoothing scale ``s`` per keypoint (or per user-specified block).

Output CSV carries 9 labels per keypoint:
``x, y, likelihood, x_ens_median, y_ens_median, x_ens_var, y_ens_var,
x_posterior_var, y_posterior_var``.
"""

from __future__ import annotations

import logging
import os
from typing import Literal

import jax.numpy as jnp
import numpy as np
import pandas as pd

from eks_tpu.core import ensemble, run_kalman_smoother
from eks_tpu.marker_array import MarkerArray, input_dfs_to_markerArray
from eks_tpu.utils import center_predictions, format_data, make_dlc_pandas_index

logger = logging.getLogger(__name__)

__all__ = [
    "fit_eks_singlecam",
    "ensemble_kalman_smoother_singlecam",
    "initialize_kalman_filter",
]

OUTPUT_LABELS = [
    "x",
    "y",
    "likelihood",
    "x_ens_median",
    "y_ens_median",
    "x_ens_var",
    "y_ens_var",
    "x_posterior_var",
    "y_posterior_var",
]


def fit_eks_singlecam(
    input_source: str | list,
    save_file: str,
    bodypart_list: list | None = None,
    smooth_param: float | list | None = None,
    s_frames: list | None = None,
    blocks: list = [],
    avg_mode: Literal["mean", "median"] = "median",
    var_mode: Literal["var", "confidence_weighted_var"] = "confidence_weighted_var",
) -> tuple:
    """Load ensemble CSVs, run the single-camera smoother, save the result.

    Args:
        input_source: directory or list of prediction CSV paths (one per
            ensemble seed).
        save_file: output CSV path.
        bodypart_list: keypoints to smooth; default = all found in the files.
        smooth_param: fixed ``s`` (scalar or per-keypoint list) to bypass
            optimization.
        s_frames: (start, end) 0-based half-open spans used for the NLL loss
            only; final smoothing always covers all frames.
        blocks: groups of keypoint indices sharing one ``s``.
        avg_mode / var_mode: ensemble consensus and variance modes.

    Returns:
        (df_smoothed, s_finals, input_dfs_list, bodypart_list)
    """
    input_dfs_list, keypoint_names = format_data(input_source)
    if bodypart_list is None:
        bodypart_list = keypoint_names
        logger.info(f"ensemble predictions loaded; keypoints: {bodypart_list}")

    marker_array = input_dfs_to_markerArray([input_dfs_list], bodypart_list, [""])
    df_smoothed, s_finals = ensemble_kalman_smoother_singlecam(
        marker_array=marker_array,
        keypoint_names=bodypart_list,
        smooth_param=smooth_param,
        s_frames=s_frames,
        blocks=blocks,
        avg_mode=avg_mode,
        var_mode=var_mode,
    )

    save_dir = os.path.dirname(save_file)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    df_smoothed.to_csv(save_file)
    logger.info("results packaged into output CSV frames")
    return df_smoothed, s_finals, input_dfs_list, bodypart_list


def ensemble_kalman_smoother_singlecam(
    marker_array: MarkerArray,
    keypoint_names: list,
    smooth_param: float | list | None = None,
    s_frames: list | None = None,
    blocks: list = [],
    avg_mode: Literal["mean", "median"] = "median",
    var_mode: Literal["var", "confidence_weighted_var"] = "confidence_weighted_var",
) -> tuple:
    """Array-level single-camera smoother.

    Args:
        marker_array: (n_models, 1, T, K, 3) with fields [x, y, likelihood].

    Returns:
        (markers_df, s_finals) — DataFrame with 9 labels per keypoint.
    """
    _, _, n_frames, n_keypoints, _ = marker_array.shape

    emA = ensemble(marker_array, avg_mode=avg_mode, var_mode=var_mode)
    # ensemble consensus/vars/likes as (T, K, ...) arrays
    ens_preds = emA.slice_fields("x", "y").array[0, 0]  # (T, K, 2)
    ens_vars = emA.slice_fields("var_x", "var_y").array[0, 0]  # (T, K, 2)
    ens_likes = emA.slice_fields("likelihood").array[0, 0, :, :, 0]  # (T, K)

    # center (quantile=100: no frame filtering, pure mean subtraction)
    _, emA_centered, _, emA_means = center_predictions(emA, quantile_keep_pca=100)
    centered = emA_centered.array[0, 0]  # (T, K, 2)
    means = emA_means.array[0, 0, 0]  # (K, 2)

    ys = np.transpose(centered, (1, 0, 2))  # (K, T, 2)
    m0s, S0s, As, Qs, Cs = initialize_kalman_filter(emA_centered)

    s_finals, ms, Vs = run_kalman_smoother(
        ys=ys,  # host array: core crops host-side and uploads once
        m0s=m0s,
        S0s=S0s,
        As=As,
        Cs=Cs,
        Qs=Qs,
        ensemble_vars=ens_vars,  # (T, K, 2)
        s_frames=s_frames,
        smooth_param=smooth_param,
        blocks=blocks,
    )

    # reproject to observation space: y = C m, var = diag(C V Cᵀ); C = I here
    # but keep the general form for parity with arbitrary C
    Cs_np = np.asarray(Cs)  # (K, 2, 2)
    y_m = np.einsum("kij,ktj->kti", Cs_np, ms)  # (K, T, 2)
    y_v = np.einsum("kij,ktjl,kml->ktim", Cs_np, Vs, Cs_np)  # (K, T, 2, 2)

    smoothed = np.transpose(y_m, (1, 0, 2)) + means[None]  # (T, K, 2)
    postvar = np.stack(
        [y_v[:, :, 0, 0], y_v[:, :, 1, 1]], axis=-1
    ).transpose(1, 0, 2)  # (T, K, 2)

    # final per-keypoint label block, order pinned by OUTPUT_LABELS
    final = np.concatenate(
        [
            smoothed,  # x, y
            ens_likes[..., None],  # likelihood
            ens_preds,  # x_ens_median, y_ens_median
            ens_vars,  # x_ens_var, y_ens_var
            postvar,  # x_posterior_var, y_posterior_var
        ],
        axis=-1,
    )  # (T, K, 9)

    pdindex = make_dlc_pandas_index(keypoint_names, labels=OUTPUT_LABELS)
    markers_df = pd.DataFrame(
        final.reshape(n_frames, n_keypoints * len(OUTPUT_LABELS)), columns=pdindex
    )
    return markers_df, s_finals


def initialize_kalman_filter(emA_centered_preds: MarkerArray) -> tuple:
    """Random-walk init: m0 = 0, S0 = diag(nanvar of centered preds),
    A = C = Q = I_2 (reference: eks/singlecam_smoother.py:246-284)."""
    _, _, _, n_keypoints, _ = emA_centered_preds.shape
    centered = emA_centered_preds.slice_fields("x", "y").array[0, 0]  # (T, K, 2)

    m0s = np.zeros((n_keypoints, 2))
    var_xy = np.nanvar(centered, axis=0)  # (K, 2)
    S0s = np.zeros((n_keypoints, 2, 2))
    S0s[:, 0, 0] = var_xy[:, 0]
    S0s[:, 1, 1] = var_xy[:, 1]

    eye = np.tile(np.eye(2), (n_keypoints, 1, 1))
    return (
        jnp.array(m0s),
        jnp.array(S0s),
        jnp.array(eye),  # As
        jnp.array(eye),  # Qs
        jnp.array(eye),  # Cs
    )
