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
from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from eks_tpu.core import _ensemble_kernel, run_kalman_smoother
from eks_tpu.marker_array import MarkerArray, input_dfs_to_markerArray
from eks_tpu.utils import format_data, make_dlc_pandas_index, save_dlc_csv

logger = logging.getLogger(__name__)

__all__ = [
    "fit_eks_singlecam",
    "fit_eks_singlecam_sessions",
    "ensemble_kalman_smoother_singlecam",
    "ensemble_kalman_smoother_singlecam_sessions",
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
    devices: int | None = None,
    partition: Literal["keypoint", "time"] = "keypoint",
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
        devices: shard the smoothing step over this many devices (a 1-D
            mesh); None/1 = single device.
        partition: mesh axis for ``devices``: "keypoint" (data parallelism,
            default) or "time" (sequence parallelism over the frame axis).

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
        devices=devices,
        partition=partition,
    )

    save_dir = os.path.dirname(save_file)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    save_dlc_csv(df_smoothed, save_file)
    logger.info("results packaged into output CSV frames")
    return df_smoothed, s_finals, input_dfs_list, bodypart_list


def fit_eks_singlecam_sessions(
    input_sources: list,
    save_files: list,
    bodypart_list: list | None = None,
    smooth_param: float | list | None = None,
    s_frames: list | None = None,
    blocks: list | None = None,
    avg_mode: Literal["mean", "median"] = "median",
    var_mode: Literal["var", "confidence_weighted_var"] = "confidence_weighted_var",
    devices: int | None = None,
    partition: Literal["keypoint", "time"] = "keypoint",
) -> list[tuple]:
    """Smooth SEVERAL sessions in one batched device program.

    Each session is an independent recording (its own ensemble CSV set);
    per-keypoint independence means sessions stack as extra lanes of the one
    jitted optimizer/smoother — one upload, one compile, one pull, instead of
    per-session dispatch over the (slow) host-device link. The reference
    processes sessions strictly one at a time (eks/cli/cmd_singlecam.py runs
    one ``fit_eks_singlecam`` per invocation); batching across sessions is a
    capability it does not have.

    Args:
        input_sources: one input source (directory or CSV list) per session.
        save_files: one output CSV path per session.
        bodypart_list: keypoints to smooth, shared across sessions;
            default = each session's own detected keypoints.
        smooth_param: fixed ``s`` — scalar (all sessions) or a per-session
            list of scalars/lists.
        blocks: per-session block structure (list of block lists), or None.
        Other args as in :func:`fit_eks_singlecam`.

    Returns:
        list of (df_smoothed, s_finals, input_dfs_list, bodypart_list),
        one per session.
    """
    n_sessions = len(input_sources)
    assert len(save_files) == n_sessions, "one save_file per session"

    marker_arrays, names_per_session, dfs_per_session = [], [], []
    for src in input_sources:
        input_dfs_list, keypoint_names = format_data(src)
        names = bodypart_list if bodypart_list is not None else keypoint_names
        marker_arrays.append(
            input_dfs_to_markerArray([input_dfs_list], names, [""])
        )
        names_per_session.append(names)
        dfs_per_session.append(input_dfs_list)

    results = ensemble_kalman_smoother_singlecam_sessions(
        marker_arrays=marker_arrays,
        keypoint_names=names_per_session,
        smooth_param=smooth_param,
        s_frames=s_frames,
        blocks=blocks,
        avg_mode=avg_mode,
        var_mode=var_mode,
        devices=devices,
        partition=partition,
    )

    out = []
    for (df_smoothed, s_finals), save_file, dfs, names in zip(
        results, save_files, dfs_per_session, names_per_session
    ):
        save_dir = os.path.dirname(save_file)
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
        save_dlc_csv(df_smoothed, save_file)
        out.append((df_smoothed, s_finals, dfs, names))
    return out


def ensemble_kalman_smoother_singlecam_sessions(
    marker_arrays: list,
    keypoint_names: list,
    smooth_param: float | list | None = None,
    s_frames: list | None = None,
    blocks: list | None = None,
    avg_mode: Literal["mean", "median"] = "median",
    var_mode: Literal["var", "confidence_weighted_var"] = "confidence_weighted_var",
    devices: int | None = None,
    partition: Literal["keypoint", "time"] = "keypoint",
    prep: Literal["host", "device"] = "host",
) -> list[tuple]:
    """Array-level multi-session single-camera smoother.

    Sessions with equal frame counts and equal ensemble sizes are
    concatenated along the keypoint axis and smoothed as ONE batched
    program — equivalent to per-session runs because every stage
    (ensemble stats, centering, KF init, the per-block s-optimizer, the
    smoother) is independent per keypoint lane. (Equivalent to f32
    reduction-order ulp: XLA may tile reductions differently at different
    batch widths, which can perturb auto-tuned ``s`` in the last float32
    bit.) Sessions with mismatched shapes fall back to sequential
    :func:`ensemble_kalman_smoother_singlecam` calls.

    Args:
        marker_arrays: one (M, 1, T, K_s, 3) MarkerArray per session.
        keypoint_names: per-session keypoint-name lists.
        smooth_param: scalar (broadcast) or per-session list.
        blocks: per-session lists of keypoint-index blocks, or None.

    Returns:
        list of (markers_df, s_finals) per session.
    """
    if not marker_arrays:
        return []  # nothing to smooth; would otherwise crash in np.stack
    n_sessions = len(marker_arrays)
    assert len(keypoint_names) == n_sessions, "one name list per session"
    per_session_param = isinstance(smooth_param, (list, tuple))
    if per_session_param:
        assert len(smooth_param) == n_sessions, (
            "per-session smooth_param list must match the session count"
        )
    if blocks is not None and len(blocks) > 0:
        assert len(blocks) == n_sessions, "one block list per session"

    shapes = {ma.shape[:3] for ma in marker_arrays}
    if len(shapes) > 1 or n_sessions == 1:
        if len(shapes) > 1:
            logger.info(
                "sessions differ in (models, frames) shape; falling back to "
                "sequential per-session smoothing"
            )
        return [
            ensemble_kalman_smoother_singlecam(
                marker_array=ma,
                keypoint_names=names,
                smooth_param=(smooth_param[i] if per_session_param else smooth_param),
                s_frames=s_frames,
                blocks=(blocks[i] if blocks else []),
                avg_mode=avg_mode,
                var_mode=var_mode,
                devices=devices,
                partition=partition,
                prep=prep,
            )
            for i, (ma, names) in enumerate(zip(marker_arrays, keypoint_names))
        ]

    # stack sessions along the keypoint axis: (M, 1, T, sum(K_s), 3)
    k_counts = [ma.shape[3] for ma in marker_arrays]
    offsets = np.concatenate([[0], np.cumsum(k_counts)])
    stacked = MarkerArray(
        np.concatenate([np.asarray(ma.array) for ma in marker_arrays], axis=3),
        data_fields=list(marker_arrays[0].data_fields),
    )

    # per-session block structures shift by each session's keypoint offset;
    # once ANY session declares blocks, block-less sessions contribute
    # singletons (optimize_smooth_param treats an empty list as
    # "one block per keypoint" globally, so partial coverage must be filled
    # explicitly or unlisted lanes would never be optimized)
    merged_blocks: list = []
    if blocks and any(blocks):
        for i, session_blocks in enumerate(blocks):
            if session_blocks:
                for b in session_blocks:
                    merged_blocks.append([int(offsets[i]) + k for k in b])
            else:
                merged_blocks.extend(
                    [[int(offsets[i]) + k] for k in range(k_counts[i])]
                )

    # scalar smooth_param broadcasts; per-session entries expand per keypoint
    merged_param: float | list | None = smooth_param
    if per_session_param:
        merged_param = []
        for i, p in enumerate(smooth_param):
            if p is None:
                # mixed fixed/auto sessions would need a partial optimizer
                # run; keep semantics simple and fall back
                logger.info(
                    "mixed fixed/auto smooth_param across sessions; falling "
                    "back to sequential per-session smoothing"
                )
                return [
                    ensemble_kalman_smoother_singlecam(
                        marker_array=ma,
                        keypoint_names=names,
                        smooth_param=smooth_param[j],
                        s_frames=s_frames,
                        blocks=(blocks[j] if blocks else []),
                        avg_mode=avg_mode,
                        var_mode=var_mode,
                        devices=devices,
                        partition=partition,
                        prep=prep,
                    )
                    for j, (ma, names) in enumerate(
                        zip(marker_arrays, keypoint_names)
                    )
                ]
            if isinstance(p, (list, tuple, np.ndarray)):
                vals = [float(v) for v in p]
                if len(vals) == 1:  # length-1 lists broadcast, like the core
                    merged_param.extend(vals * k_counts[i])
                else:
                    assert len(vals) == k_counts[i], (
                        f"session {i}: smooth_param list must have one entry "
                        f"per keypoint ({k_counts[i]}), got {len(vals)}"
                    )
                    merged_param.extend(vals)
            else:
                merged_param.extend([float(p)] * k_counts[i])

    # one merged (T, sum(K_s), 9) table; per-session DataFrames slice the
    # numpy array directly (building a merged wide DataFrame and .iloc-
    # copying per session measured ~0.3s of pandas overhead at 4 stacked
    # headline sessions — most of what the batched optimizer saved)
    final_np, s_all = _singlecam_smooth_table(
        marker_array=stacked,
        smooth_param=merged_param,
        s_frames=s_frames,
        blocks=merged_blocks,
        avg_mode=avg_mode,
        var_mode=var_mode,
        devices=devices,
        partition=partition,
        prep=prep,
    )

    n_frames = final_np.shape[0]
    n_labels = len(OUTPUT_LABELS)
    results = []
    s_all = np.asarray(s_all)
    for i, names in enumerate(keypoint_names):
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        sub = pd.DataFrame(
            final_np[:, lo:hi, :].reshape(n_frames, (hi - lo) * n_labels),
            columns=make_dlc_pandas_index(names, labels=OUTPUT_LABELS),
        )
        results.append((sub, s_all[lo:hi]))
    return results


def ensemble_kalman_smoother_singlecam(
    marker_array: MarkerArray,
    keypoint_names: list,
    smooth_param: float | list | None = None,
    s_frames: list | None = None,
    blocks: list = [],
    avg_mode: Literal["mean", "median"] = "median",
    var_mode: Literal["var", "confidence_weighted_var"] = "confidence_weighted_var",
    devices: int | None = None,
    partition: Literal["keypoint", "time"] = "keypoint",
    prep: Literal["host", "device"] = "host",
) -> tuple:
    """Array-level single-camera smoother.

    ``prep="host"`` (default) runs the fused prep program (ensemble stats,
    centering, KF init) on the host CPU backend and ships only what the
    accelerator consumes — centered observations + ensemble variances,
    (T, K, 4) floats — pulling back just the smoother-dependent output block.
    That is 2.5x fewer bytes each way than uploading the raw M-model
    predictions, and transfers dominate on remote-attached accelerators
    (the reference preps on host too: eks/singlecam_smoother.py:105-284).
    ``prep="device"`` uploads the raw planes once and runs the same program
    on the accelerator — the right choice when the host is the bottleneck
    and the device link is fast. Either way the optimizer and smoother
    consume device-resident arrays and results ship as one batched pull.

    Args:
        marker_array: (n_models, 1, T, K, 3) with fields [x, y, likelihood].

    Returns:
        (markers_df, s_finals) — DataFrame with 9 labels per keypoint.
    """
    import time as _time

    final_np, s_finals = _singlecam_smooth_table(
        marker_array, smooth_param, s_frames, blocks, avg_mode, var_mode,
        devices, partition, prep,
    )
    n_frames, n_keypoints = final_np.shape[:2]

    _t0 = _time.perf_counter()
    pdindex = make_dlc_pandas_index(keypoint_names, labels=OUTPUT_LABELS)
    markers_df = pd.DataFrame(
        final_np.reshape(n_frames, n_keypoints * len(OUTPUT_LABELS)),
        columns=pdindex,
    )
    logger.debug(f"[timing] host table assembly (singlecam): {_time.perf_counter() - _t0:.3f}s")
    return markers_df, s_finals


def _singlecam_smooth_table(
    marker_array: MarkerArray,
    smooth_param: float | list | None = None,
    s_frames: list | None = None,
    blocks: list = [],
    avg_mode: Literal["mean", "median"] = "median",
    var_mode: Literal["var", "confidence_weighted_var"] = "confidence_weighted_var",
    devices: int | None = None,
    partition: Literal["keypoint", "time"] = "keypoint",
    prep: Literal["host", "device"] = "host",
) -> tuple:
    """The full singlecam pipeline up to (but not including) the pandas
    table: returns ``(final_np (T, K, 9) in OUTPUT_LABELS order, s_finals)``.

    Split out so the multi-session path can slice per-session blocks
    directly from the numpy table — building one merged wide DataFrame and
    ``.iloc``-copying per session measured ~0.3s of pure pandas overhead at
    4 stacked headline sessions, most of what the batched optimizer saved.
    """
    import time as _time

    n_models, _, n_frames, n_keypoints, _ = marker_array.shape

    _t0 = _time.perf_counter()
    arr = np.asarray(marker_array.array)  # (M, 1, T, K, 3) host
    if prep == "host":
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            prep_out = _prep_singlecam(
                arr[:, 0, :, :, 0], arr[:, 0, :, :, 1], arr[:, 0, :, :, 2],
                n_models, avg_mode, var_mode,
            )
        stats_host, ys_np, means_np, S0s_np = jax.device_get(prep_out)
        logger.debug(
            f"[timing] host prep (singlecam): {_time.perf_counter() - _t0:.3f}s"
        )
    else:
        stats, ys_dev, means_dev, S0s_dev = _prep_singlecam(
            jnp.asarray(arr[:, 0, :, :, 0]),
            jnp.asarray(arr[:, 0, :, :, 1]),
            jnp.asarray(arr[:, 0, :, :, 2]),
            n_models, avg_mode, var_mode,
        )
        logger.debug(
            f"[timing] fused device prep (singlecam): {_time.perf_counter() - _t0:.3f}s"
        )

    eye = np.tile(np.eye(2), (n_keypoints, 1, 1))
    m0s = np.zeros((n_keypoints, 2))

    if prep == "host":
        if s_frames or (devices is not None and devices > 1):
            # cropping is host-side; the mesh path shards host arrays
            # straight onto its devices — keep EVERYTHING on host here,
            # including the means (the packaging jit places them where the
            # smoothed moments live; an eager upload would commit them to
            # the ambient default device instead)
            ys, ens_vars_in, S0s = ys_np, stats_host[..., 2:4], S0s_np
            means_dev = means_np
        else:
            # exactly two uploads feed the whole device pipeline
            ys = jnp.asarray(ys_np)
            ens_vars_in = jnp.asarray(
                np.ascontiguousarray(stats_host[..., 2:4])
            )
            S0s = jnp.asarray(S0s_np)
            means_dev = jnp.asarray(means_np)
    elif s_frames:
        # loss-frame cropping happens host-side; one batched pull of the
        # prep results (per-array pulls each pay a transfer round-trip)
        ys, stats_host, S0s = jax.device_get((ys_dev, stats, S0s_dev))
        ens_vars_in = stats_host[..., 2:4]
    else:
        ys, ens_vars_in, S0s = ys_dev, stats[..., 2:4], S0s_dev
        stats_host = None

    s_finals, ms, Vs = run_kalman_smoother(
        ys=ys,
        m0s=m0s,
        S0s=S0s,
        As=eye,
        Cs=eye,
        Qs=eye,
        ensemble_vars=ens_vars_in,  # (T, K, 2)
        s_frames=s_frames,
        smooth_param=smooth_param,
        blocks=blocks,
        devices=devices,
        partition=partition,
    )

    # device-side packaging of the smoother-dependent block only
    # (reprojection + posterior variance, (T, K, 4)); the ensemble-stat block
    # is pulled alongside it. An overlapped copy_to_host_async of the stats
    # under the optimizer was measured SLOWER on this remote-attached chip
    # (the tunnel serializes the "async" transfer against dispatches), so
    # both blocks ship at the end as one batched pull.
    _t0 = _time.perf_counter()
    if stats_host is None:
        # one fused (T, K, 9) table in final column order -> ONE contiguous
        # pull, and the host side reduces to a reshape (no concat copy)
        final_np = np.asarray(_package_singlecam_full(
            stats, means_dev, jnp.asarray(ms), jnp.asarray(Vs), jnp.asarray(eye)
        ))
        logger.debug(
            f"[timing] packaging + pull (singlecam): {_time.perf_counter() - _t0:.3f}s"
        )
    else:
        sm4_np = np.asarray(_package_singlecam_smoothed(
            means_dev, jnp.asarray(ms), jnp.asarray(Vs), jnp.asarray(eye)
        ))
        logger.debug(
            f"[timing] packaging + pull (singlecam): {_time.perf_counter() - _t0:.3f}s"
        )
        final_np = np.concatenate(
            [
                sm4_np[..., :2],  # x, y
                stats_host[..., 4:5],  # likelihood
                stats_host[..., 0:2],  # x_ens_median, y_ens_median
                stats_host[..., 2:4],  # x_ens_var, y_ens_var
                sm4_np[..., 2:4],  # x_posterior_var, y_posterior_var
            ],
            axis=-1,
        )  # (T, K, 9)

    return final_np, s_finals


@jax.jit
def _package_singlecam_full(stats, means, ms, Vs, Cs):
    """Assemble the COMPLETE (T, K, 9) output table on device in final column
    order [x, y, likelihood, x_ens_median, y_ens_median, x_ens_var, y_ens_var,
    x_posterior_var, y_posterior_var], so results ship as one contiguous
    pull (two smaller pulls + a host concat each cost a tunnel round-trip)."""
    sm4 = _package_singlecam_smoothed(means, ms, Vs, Cs)  # (T, K, 4)
    return jnp.concatenate(
        [
            sm4[..., :2],
            stats[..., 4:5],
            stats[..., 0:2],
            stats[..., 2:4],
            sm4[..., 2:4],
        ],
        axis=-1,
    )


@jax.jit
def _package_singlecam_smoothed(means, ms, Vs, Cs):
    """Device assembly of the smoother-dependent output block: reproject
    y = C m / var = diag(C V Cᵀ) (C = I for this family; general form kept
    for parity) and re-add centering means -> (T, K, 4) as
    [x, y, x_posterior_var, y_posterior_var]. The five ensemble-stat columns
    ship to host separately (overlapped with the optimizer)."""
    y_m = jnp.einsum("kij,ktj->kti", Cs, ms)  # (K, T, 2)
    y_v = jnp.einsum("kij,ktjl,kml->ktim", Cs, Vs, Cs)  # (K, T, 2, 2)
    smoothed = jnp.transpose(y_m, (1, 0, 2)) + means[None]  # (T, K, 2)
    postvar = jnp.stack(
        [y_v[:, :, 0, 0], y_v[:, :, 1, 1]], axis=-1
    ).transpose(1, 0, 2)  # (T, K, 2)
    return jnp.concatenate([smoothed, postvar], axis=-1)  # (T, K, 4)


@partial(jax.jit, static_argnums=(3, 4, 5))
def _prep_singlecam(data_x, data_y, data_lh, n_models, avg_mode, var_mode):
    """Fused device prep: ensemble stats + quantile-100 centering + KF init.

    Inputs are the raw (M, T, K) prediction planes; returns
    (stats (T, K, 5), ys (K, T, 2), means (K, 2), S0s (K, 2, 2)) — all
    device-resident. Semantics identical to ensemble() +
    center_predictions(quantile=100) + initialize_kalman_filter
    (reference: eks/singlecam_smoother.py:105-284), with zero intermediate
    host transfers.
    """
    stats = _ensemble_kernel(
        data_x, data_y, data_lh, n_models, avg_mode, var_mode, 1000.0
    )  # (T, K, 5)
    preds = stats[..., :2]
    means = jnp.mean(preds, axis=0)  # (K, 2); quantile=100 keeps every frame
    centered = preds - means
    ys = jnp.transpose(centered, (1, 0, 2))  # (K, T, 2)
    var_xy = jnp.nanvar(centered, axis=0)  # (K, 2)
    S0s = var_xy[:, :, None] * jnp.eye(2, dtype=var_xy.dtype)
    return stats, ys, means, S0s


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
