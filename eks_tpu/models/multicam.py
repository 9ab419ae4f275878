"""Multi-camera EKS: PCA-latent (linear) and calibrated-projection (nonlinear).

Two observation models, selected by the presence of a calibration
(reference: eks/multicam_smoother.py:279-551):

  * Linear path — per-keypoint PCA of the centered (T, 2C) multi-view stack
    builds the emission matrix ``C = components.T``; random-walk latent with
    Q from the normalized covariance of PC lag-1 diffs.
  * Nonlinear path — triangulate each model's 2D predictions to 3D (batched
    DLT, replacing the reference's joblib thread pool), average over models,
    and smooth a 3-D latent with the calibrated multi-view projection as the
    EKF emission function.

Variance inflation: per keypoint, a Factor-Analysis/Mahalanobis screen
multiplies ensemble variances by 10 wherever the distance exceeds 5, repeated
to a fixed point (reference: eks/multicam_smoother.py:653-764).

Output parity quirks preserved deliberately: the linear path ADDS the ensemble
variance to the posterior variance in the per-camera outputs
(eks/multicam_smoother.py:509-510), as does the nonlinear covariance
projection (:943-944).
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from jax import vmap

from eks_tpu.core import _ensemble_kernel, ensemble, run_kalman_smoother
from eks_tpu.ops.linalg import highest_precision
from eks_tpu.geometry import (
    CameraGroup,
    make_projection_from_camgroup,
    project_point,
    stack_camera_params,
    undistort_points,
)
from eks_tpu.geometry.triangulate import triangulate_dlt
from eks_tpu.marker_array import (
    MarkerArray,
    input_dfs_to_markerArray,
    mA_to_stacked_array,
    stacked_array_to_mA,
)
from eks_tpu.stats import PCA, compute_mahalanobis, compute_pca
from eks_tpu.utils import (
    center_predictions,
    format_data,
    make_dlc_pandas_index,
    save_dlc_csv,
)

logger = logging.getLogger(__name__)

__all__ = [
    "fit_eks_multicam",
    "fit_eks_mirrored_multicam",
    "ensemble_kalman_smoother_multicam",
    "initialize_kalman_filter_pca",
    "initialize_kalman_filter_geometric",
    "inflate_variance",
    "mA_compute_maha",
    "triangulate_3d_models",
    "project_3d_covariance_to_2d",
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


# --------------------------------------------------------------------------- #
# public fit wrappers
# --------------------------------------------------------------------------- #
def fit_eks_mirrored_multicam(
    input_source: str | list,
    save_file: str,
    bodypart_list: list | None = None,
    smooth_param: float | list | None = None,
    s_frames: list | None = None,
    camera_names: list = [],
    quantile_keep_pca: float = 50.0,
    avg_mode: Literal["mean", "median"] = "median",
    var_mode: Literal["var", "confidence_weighted_var"] = "confidence_weighted_var",
    inflate_vars: bool = False,
    n_latent: int = 3,
    devices: int | None = None,
    partition: Literal["keypoint", "time"] = "keypoint",
) -> tuple:
    """Mirrored multi-camera fit: one CSV per seed holds all views as
    ``{kp}_{camera}`` columns; views are split out, smoothed jointly, and the
    per-camera outputs merged back into a single CSV
    (reference: eks/multicam_smoother.py:37-153). ``devices``/``partition``
    shard the smoothing step over a 1-D device mesh (see
    :func:`fit_eks_multicam`).
    """
    input_dfs_list, keypoint_names = format_data(input_source)
    if bodypart_list is None:
        # deduped prefix before the first underscore
        seen: set = set()
        bodypart_list = []
        for name in keypoint_names:
            base = name.split("_")[0]
            if base not in seen:
                seen.add(base)
                bodypart_list.append(base)

    n_models = len(input_dfs_list)
    n_cameras = len(camera_names)

    camera_model_dfs = [[None] * n_models for _ in range(n_cameras)]
    for m, df in enumerate(input_dfs_list):
        for c, camera in enumerate(camera_names):
            # replace-ALL is deliberate: it is the reference's own column
            # transform (eks/multicam_smoother.py:117-119), including its
            # behavior on bodyparts whose names contain the camera substring
            # ('nose_top' + camera 'top' -> 'nose') — goldens pin it
            cols = {
                col: col.replace(f"_{camera}", "")
                for col in df.columns
                if f"_{camera}_" in col
            }
            camera_model_dfs[c][m] = df[list(cols.keys())].rename(columns=cols)

    marker_array = input_dfs_to_markerArray(
        camera_model_dfs, bodypart_list, camera_names
    )
    camera_dfs, s_finals, _df_3d = ensemble_kalman_smoother_multicam(
        marker_array=marker_array,
        keypoint_names=bodypart_list,
        camera_names=camera_names,
        smooth_param=smooth_param,
        quantile_keep_pca=quantile_keep_pca,
        s_frames=s_frames,
        avg_mode=avg_mode,
        var_mode=var_mode,
        inflate_vars=inflate_vars,
        n_latent=n_latent,
        devices=devices,
        partition=partition,
    )

    # merge per-camera frames back into one mirrored CSV
    final_df = None
    for c, camera_df in enumerate(camera_dfs):
        renamed = [
            (scorer, f"{kp}_{camera_names[c]}", attr)
            for scorer, kp, attr in camera_df.columns
        ]
        camera_df.columns = pd.MultiIndex.from_tuples(
            renamed, names=camera_df.columns.names
        )
        final_df = camera_df if final_df is None else pd.concat(
            [final_df, camera_df], axis=1
        )

    assert final_df is not None
    save_dir = os.path.dirname(save_file)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    save_dlc_csv(final_df, save_file)
    return final_df, s_finals, input_dfs_list, bodypart_list


def fit_eks_multicam(
    input_source: str | list | dict,
    save_dir: str,
    bodypart_list: list | None = None,
    smooth_param: float | list | None = None,
    s_frames: list | None = None,
    camera_names: list | None = None,
    quantile_keep_pca: float = 50.0,
    avg_mode: Literal["mean", "median"] = "median",
    var_mode: Literal["var", "confidence_weighted_var"] = "confidence_weighted_var",
    inflate_vars: bool = False,
    n_latent: int = 3,
    calibration: str | None = None,
    save_3d_outputs: bool = True,
    devices: int | None = None,
    partition: Literal["keypoint", "time"] = "keypoint",
) -> tuple:
    """Un-mirrored multi-camera fit: one CSV per (camera, seed).

    With ``calibration`` (Anipose TOML), the nonlinear calibrated-projection
    path is used and camera names come from the file
    (reference: eks/multicam_smoother.py:156-276).

    ``devices`` > 1 shards the smoothing step over a 1-D device mesh along
    ``partition`` ("keypoint" = data parallelism over independent lanes,
    "time" = sequence parallelism over the frame axis); applies to the
    linear AND calibrated (nonlinear EKF) paths.

    Returns:
        (camera_dfs, s_finals, input_dfs_list, bodypart_list, df_3d)
    """
    if calibration is not None:
        camgroup = CameraGroup.load(calibration)
        if camera_names is not None:
            logger.warning(
                "calibration file supplies its own camera names; the camera_names argument is dropped — "
                "names are taken from the TOML"
            )
        camera_names = [cam.name for cam in camgroup.cameras]
    else:
        camgroup = None
        if camera_names is None:
            raise ValueError(
                "without a calibration file, pass camera_names explicitly"
            )

    _t0 = time.perf_counter()
    input_dfs_list, keypoint_names = format_data(input_source, camera_names=camera_names)
    logger.debug(f"[timing] format_data: {time.perf_counter() - _t0:.3f}s")
    if bodypart_list is None:
        bodypart_list = keypoint_names

    _t0 = time.perf_counter()
    marker_array = input_dfs_to_markerArray(input_dfs_list, bodypart_list, camera_names)
    logger.debug(f"[timing] input_dfs_to_markerArray: {time.perf_counter() - _t0:.3f}s")

    camera_dfs, s_finals, df_3d = ensemble_kalman_smoother_multicam(
        marker_array=marker_array,
        keypoint_names=bodypart_list,
        camera_names=camera_names,
        smooth_param=smooth_param,
        quantile_keep_pca=quantile_keep_pca,
        s_frames=s_frames,
        avg_mode=avg_mode,
        var_mode=var_mode,
        inflate_vars=inflate_vars,
        n_latent=n_latent,
        camgroup=camgroup,
        devices=devices,
        partition=partition,
    )

    os.makedirs(save_dir, exist_ok=True)
    for c, camera in enumerate(camera_names):
        save_dlc_csv(
            camera_dfs[c], os.path.join(save_dir, f"multicam_{camera}_results.csv")
        )
    if save_3d_outputs and calibration is not None:
        save_dlc_csv(df_3d, os.path.join(save_dir, "multicam_3d_results.csv"))
    return camera_dfs, s_finals, input_dfs_list, bodypart_list, df_3d


# --------------------------------------------------------------------------- #
# array-level smoother
# --------------------------------------------------------------------------- #
def ensemble_kalman_smoother_multicam(
    marker_array: MarkerArray,
    keypoint_names: list,
    camera_names: list,
    smooth_param: float | list | None = None,
    quantile_keep_pca: float = 50.0,
    s_frames: list | None = None,
    avg_mode: Literal["mean", "median"] = "median",
    var_mode: Literal["var", "confidence_weighted_var"] = "confidence_weighted_var",
    inflate_vars: bool = False,
    inflate_vars_kwargs: dict = {},
    pca_object: Optional[PCA] = None,
    n_latent: int = 3,
    camgroup: Optional[CameraGroup] = None,
    devices: int | None = None,
    partition: Literal["keypoint", "time"] = "keypoint",
) -> tuple:
    """Multi-view smoother over a (M, C, T, K, 3) MarkerArray.

    ``devices`` > 1 shards the smoothing step (optimizer + final pass) over
    a 1-D device mesh on the ``partition`` axis; prep and packaging stay on
    the host in that case so operands upload exactly once, sharded straight
    onto the mesh devices.

    Returns:
        (camera_dfs, s_finals, df_3d)
    """
    if camera_names is None or len(camera_names) == 0:
        raise ValueError("camera_names must be provided")

    M, V, T, K, _ = marker_array.shape
    _t0_total = time.perf_counter()

    # hot-path shortcut: the plain linear family (no calibration, no
    # inflation, no injected PCA, no loss-frame cropping) runs prep +
    # smoothing + packaging as three fused device programs with exactly one
    # upload (raw predictions) and one download (the packaged tables) — the
    # host-side ensemble->center->PCA round-trip of the general path below
    # is the multicam family's residual transfer cost
    if (
        camgroup is None
        and not inflate_vars
        and pca_object is None
        and not s_frames
    ):
        return _smoother_multicam_linear_fused(
            marker_array, keypoint_names, smooth_param=smooth_param,
            quantile_keep_pca=quantile_keep_pca, avg_mode=avg_mode,
            var_mode=var_mode, n_latent=n_latent, total_t0=_t0_total,
            devices=devices, partition=partition,
        )

    # same idea for the calibrated family: undistort + DLT + geometric init
    # run as one device program batched over cameras (the general path below
    # pays C separate undistort round-trips), and the reprojection epilogue
    # is one batched program instead of per-camera Jacobian dispatches
    if camgroup is not None and not inflate_vars and not s_frames:
        return _smoother_multicam_nonlinear_fused(
            marker_array, keypoint_names, camgroup, smooth_param=smooth_param,
            avg_mode=avg_mode, var_mode=var_mode, total_t0=_t0_total,
            devices=devices, partition=partition,
        )

    # ensemble + centering. The ensemble kernel runs on the host CPU backend:
    # the general path consumes its outputs host-side (centering, inflation,
    # PCA), so running it on a remote-attached accelerator would pay an
    # upload of the raw (M, C, T, K, 3) planes plus a pull of the stats for
    # zero downstream device work (the fused paths already prep host-side).
    _t0 = time.perf_counter()
    with jax.default_device(jax.devices("cpu")[0]):
        emA = ensemble(marker_array, avg_mode=avg_mode, var_mode=var_mode)
    emA_unsm = emA.slice_fields("x", "y")
    emA_vars = emA.slice_fields("var_x", "var_y")
    emA_likes = emA.slice_fields("likelihood")
    valid_mask, emA_centered, emA_good_centered, emA_means = center_predictions(
        emA, quantile_keep_pca
    )
    logger.debug(f"[timing] ensemble + centering: {time.perf_counter() - _t0:.3f}s")

    # optional Mahalanobis variance inflation
    _t0 = time.perf_counter()
    if inflate_vars:
        # never mutate the caller's kwargs dict (a reused dict would find
        # its fitted 'mean' silently zeroed on the next call)
        inflate_vars_kwargs = dict(inflate_vars_kwargs)
        if inflate_vars_kwargs.get("mean", None) is not None:
            # centered predictions are passed in, so the latent mean is zero
            inflate_vars_kwargs["mean"] = np.zeros_like(inflate_vars_kwargs["mean"])
        emA_inflated_vars = mA_compute_maha(
            emA_centered, emA_vars, emA_likes, n_latent,
            inflate_vars_kwargs=inflate_vars_kwargs,
        )
    else:
        emA_inflated_vars = emA_vars
    label = "mahalanobis variance inflation" if inflate_vars else "variance inflation skipped"
    logger.debug(f"[timing] {label}: {time.perf_counter() - _t0:.3f}s")

    using_nonlinear = camgroup is not None
    h_cams: list = []

    if using_nonlinear:
        logger.debug("[EKS] nonlinear path: triangulate + geometric init + projection")
        _t0 = time.perf_counter()
        tri_models = triangulate_3d_models(marker_array, camgroup)  # (M, K, T, 3)
        ys_3d = tri_models.mean(axis=0)  # (K, T, 3)
        logger.debug(f"[timing] triangulation: {time.perf_counter() - _t0:.3f}s")

        m0s, S0s, As, Qs, Cs = initialize_kalman_filter_geometric(ys_3d)
        h_fn, h_cams = make_projection_from_camgroup(camgroup)

        # raw (uncentered) 2D observations + variances, (K, T, 2C)
        unsm = emA_unsm.array[0]  # (C, T, K, 2)
        infl = emA_inflated_vars.array[0]
        ys = np.moveaxis(unsm, 2, 0).transpose(0, 2, 1, 3).reshape(K, T, 2 * V)
        ensemble_vars = (
            np.moveaxis(infl, 2, 0).transpose(0, 2, 1, 3).reshape(K, T, 2 * V)
        )
    else:
        logger.debug("[EKS] linear path: PCA subspace + linear emissions")
        _t0 = time.perf_counter()
        ensemble_pca, good_pcs_list = compute_pca(
            valid_mask, emA_centered, emA_good_centered,
            n_components=n_latent, pca_object=pca_object,
        )
        logger.debug(f"[timing] PCA: {time.perf_counter() - _t0:.3f}s")

        m0s, S0s, As, Qs, Cs = initialize_kalman_filter_pca(
            good_pcs_list=good_pcs_list, ensemble_pca=ensemble_pca, n_latent=n_latent
        )
        h_fn = None

        cen = emA_centered.array[0]  # (C, T, K, 2)
        infl = emA_inflated_vars.array[0]
        ys = np.moveaxis(cen, 2, 0).transpose(0, 2, 1, 3).reshape(K, T, 2 * V)
        ensemble_vars = (
            np.moveaxis(infl, 2, 0).transpose(0, 2, 1, 3).reshape(K, T, 2 * V)
        )

    # smoother
    _t0 = time.perf_counter()
    s_finals, ms, Vs = run_kalman_smoother(
        ys=ys,  # host array: core crops host-side and uploads once
        m0s=m0s, S0s=S0s, As=As, Qs=Qs, Cs=Cs,
        ensemble_vars=np.swapaxes(ensemble_vars, 0, 1),  # (T, K, 2C)
        s_frames=s_frames,
        smooth_param=smooth_param,
        h_fn=h_fn,
        x_init=ys_3d if using_nonlinear else None,
        devices=devices,
        partition=partition,
    )
    logger.debug(f"[timing] run_kalman_smoother: {time.perf_counter() - _t0:.3f}s")
    # one batched pull of the device-resident results (packaging below mixes
    # many small numpy slices; per-slice implicit D2H over a remote chip
    # would be pathological)
    ms, Vs = np.asarray(ms), np.asarray(Vs)

    # reprojection + packaging
    _t0 = time.perf_counter()
    likes = emA_likes.array[0, :, :, :, 0]  # (C, T, K)
    unsm = emA_unsm.array[0]  # (C, T, K, 2)
    raw_vars = emA_vars.array[0]  # (C, T, K, 2)
    infl_vars = emA_inflated_vars.array[0]
    means = emA_means.array[0, :, 0, :, :]  # (C, K, 2)

    camera_dfs = []
    if using_nonlinear:
        # project means and covariances through each camera head
        proj_xy = np.zeros((V, K, T, 2))
        proj_var = np.zeros((V, K, T, 2))
        ms_j = jnp.asarray(ms)  # (K, T, 3)
        Vs_j = jnp.asarray(Vs)
        for c in range(V):
            h_c = h_cams[c]
            proj_xy[c] = np.asarray(vmap(vmap(h_c))(ms_j))
            vx, vy = project_3d_covariance_to_2d(ms, Vs, h_c, ensemble_vars)
            proj_var[c, :, :, 0] = vx
            proj_var[c, :, :, 1] = vy

        for c in range(V):
            blocks = []
            for k in range(K):
                blocks.append(
                    np.stack(
                        [
                            proj_xy[c, k, :, 0],
                            proj_xy[c, k, :, 1],
                            likes[c, :, k],
                            unsm[c, :, k, 0],
                            unsm[c, :, k, 1],
                            raw_vars[c, :, k, 0],
                            raw_vars[c, :, k, 1],
                            proj_var[c, k, :, 0],
                            proj_var[c, k, :, 1],
                        ],
                        axis=-1,
                    )
                )
            arr = np.concatenate(blocks, axis=-1)  # (T, K*9)
            camera_dfs.append(
                pd.DataFrame(
                    arr, columns=make_dlc_pandas_index(keypoint_names, OUTPUT_LABELS)
                )
            )
    else:
        Cs_np = np.asarray(Cs)  # (K, 2C, L)
        y_m = np.einsum("koj,ktj->kto", Cs_np, ms)  # (K, T, 2C)
        y_v_diag = np.einsum("koj,ktjl,kol->kto", Cs_np, Vs, Cs_np)  # (K, T, 2C)

        for c in range(V):
            xi, yi = 2 * c, 2 * c + 1
            blocks = []
            for k in range(K):
                blocks.append(
                    np.stack(
                        [
                            y_m[k, :, xi] + means[c, k, 0],
                            y_m[k, :, yi] + means[c, k, 1],
                            likes[c, :, k],
                            unsm[c, :, k, 0],
                            unsm[c, :, k, 1],
                            infl_vars[c, :, k, 0],
                            infl_vars[c, :, k, 1],
                            # posterior var + ensemble var (deliberate quirk,
                            # reference eks/multicam_smoother.py:509-510)
                            y_v_diag[k, :, xi] + ensemble_vars[k, :, xi],
                            y_v_diag[k, :, yi] + ensemble_vars[k, :, yi],
                        ],
                        axis=-1,
                    )
                )
            arr = np.concatenate(blocks, axis=-1)
            camera_dfs.append(
                pd.DataFrame(
                    arr, columns=make_dlc_pandas_index(keypoint_names, OUTPUT_LABELS)
                )
            )
    logger.debug(f"[timing] reprojection + packaging: {time.perf_counter() - _t0:.3f}s")

    # 3-D latent dataframe
    labels_3d = ["x", "y", "z", "x_posterior_var", "y_posterior_var", "z_posterior_var"]
    arr_3d = np.concatenate(
        [
            np.concatenate(
                [ms[k], np.stack([Vs[k, :, i, i] for i in range(3)], axis=-1)],
                axis=-1,
            )
            for k in range(K)
        ],
        axis=-1,
    ) if ms.shape[-1] == 3 else np.zeros((T, K * 6))
    df_3d = pd.DataFrame(
        arr_3d, columns=make_dlc_pandas_index(keypoint_names, labels_3d)
    )

    logger.debug(
        f"[timing] ensemble_kalman_smoother_multicam total: "
        f"{time.perf_counter() - _t0_total:.3f}s"
    )
    return camera_dfs, s_finals, df_3d


# --------------------------------------------------------------------------- #
# Kalman initialisation
# --------------------------------------------------------------------------- #
def initialize_kalman_filter_pca(
    good_pcs_list: list[np.ndarray],
    ensemble_pca: list,
    n_latent: int,
) -> tuple:
    """PCA-latent init: C = componentsᵀ, Q = normalized covariance of PC
    lag-1 diffs, S0 = diag(var of good PCs)
    (reference: eks/multicam_smoother.py:554-597)."""
    K = len(good_pcs_list)
    m0s = np.zeros((K, n_latent))
    # per-column np.var calls, not an axis-reduction: the reference computes
    # each diagonal with its own 1-D np.var and the f32 summation order
    # differs enough to show up in the parity goldens
    S0s = np.stack(
        [
            np.diag(
                [np.var(good_pcs_list[k][:, i]) for i in range(n_latent)]
            )
            for k in range(K)
        ]
    )
    As = np.tile(np.eye(n_latent), (K, 1, 1))
    Cs = np.stack([pca.components_.T for pca in ensemble_pca])  # (K, 2C, L)

    Qs = []
    for k in range(K):
        d = np.diff(good_pcs_list[k], axis=0)
        cov = np.atleast_2d(np.cov(d.T))  # np.cov of 1-D diffs is a scalar
        peak = np.max(np.abs(cov))
        Qs.append(cov / peak if peak > 0 else cov)
    Qs = np.stack(Qs)

    return (
        jnp.array(m0s),
        jnp.array(S0s),
        jnp.array(As),
        jnp.array(Qs),
        jnp.array(Cs),
    )


def initialize_kalman_filter_geometric(ys: np.ndarray) -> tuple:
    """3-D geometric init from triangulated trajectories: m0 = mean of the
    first 10 frames, S0 = diag(nanvar)+1e-4, Q from the MAD of lag-1 diffs
    (reference: eks/multicam_smoother.py:600-650)."""
    K, T, D = ys.shape
    m0s = ys[:, :10].mean(axis=1)  # (K, 3)
    var = np.nanvar(ys, axis=1) + 1e-4  # (K, 3)
    S0s = np.zeros((K, D, D))
    for d in range(D):
        S0s[:, d, d] = var[:, d]

    eye = np.tile(np.eye(D), (K, 1, 1))

    dx = np.diff(ys, axis=1)  # (K, T-1, 3)
    med = np.median(dx, axis=1, keepdims=True)
    mad = np.median(np.abs(dx - med), axis=1) + 1e-12  # (K, 3)
    qvar = np.maximum((1.4826 * mad) ** 2, 1e-8)
    Qs = np.zeros((K, D, D))
    for d in range(D):
        Qs[:, d, d] = qvar[:, d]

    return (
        jnp.array(m0s),
        jnp.array(S0s),
        jnp.array(eye),
        jnp.array(Qs),
        jnp.array(eye),
    )


# --------------------------------------------------------------------------- #
# fused linear path (device-resident prep + packaging)
# --------------------------------------------------------------------------- #
@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
@highest_precision
def _prep_multicam_linear(
    data_x, data_y, data_lh, n_models, avg_mode, var_mode, n_latent, quantile
):
    """Device twin of ensemble() + center_predictions + compute_pca +
    initialize_kalman_filter_pca for the linear multicam family, with no
    intermediate host transfer.

    The variance-quantile frame filter has data-dependent good-frame counts,
    which would be dynamic shapes under jit; instead the good-row selection is
    a {0,1} weight plane. The PCA fit stays an exact SVD because rows zeroed
    AFTER centering contribute nothing to XᵀX — the right singular vectors and
    singular values match the gathered submatrix exactly, so no dynamic-shape
    gather is needed. Good-frame counts enter every mean/variance as traced
    scalars (never static: they differ per session and would recompile).

    Inputs (M, C, T, K) prediction planes; returns
    (stats (C,T,K,5), ys (K,T,2C), evars (K,T,2C), m0s, S0s, As, Qs,
    Cs (K,2C,L), means (C,K,2)).
    """
    stats = _ensemble_kernel(
        data_x, data_y, data_lh, n_models, avg_mode, var_mode, 1000.0
    )  # (C, T, K, 5)
    preds = stats[..., :2]
    variances = stats[..., 2:4]
    C, T, K, _ = stats.shape
    dt = preds.dtype

    # frame filter: per-keypoint variance-quantile threshold on the max over
    # cameras and x/y (reference: eks/utils.py:293-365)
    max_vars = jnp.max(variances, axis=(0, 3))  # (T, K)
    thresholds = jnp.percentile(max_vars, quantile, axis=0)  # (K,)
    mask = max_vars <= thresholds  # (T, K)
    counts = jnp.sum(mask, axis=0)  # (K,)
    n_good = jnp.min(counts)
    # every keypoint keeps its FIRST n_good valid frames (min-count
    # truncation quirk); cumsum rank reproduces the stable-argsort selection
    rank = jnp.cumsum(mask, axis=0)
    w = (mask & (rank <= n_good)).astype(dt)  # (T, K)
    denom = n_good.astype(dt)

    means = jnp.einsum("tk,ctko->cko", w, preds) / denom  # (C, K, 2)
    centered = preds - means[:, None]  # (C, T, K, 2)
    X = jnp.transpose(centered, (2, 1, 0, 3)).reshape(K, T, 2 * C)  # ys
    evars = jnp.transpose(variances, (2, 1, 0, 3)).reshape(K, T, 2 * C)

    # PCA on the truncated good rows (sklearn PCA re-centers internally, so
    # subtract the good-row column mean before masking). Covariance-eigh
    # route — the formulation sklearn's covariance_eigh solver uses and the
    # bit-exact host fit (stats._pca_fit_sklearn_exact) replicates; rows
    # zeroed AFTER centering contribute nothing to XᵀX, so no dynamic-shape
    # gather is needed, and an (F, F) eigh per keypoint beats an (T, F) SVD
    # on TPU by a wide margin.
    wK = w.T[:, :, None]  # (K, T, 1)
    col_mean = jnp.sum(X * wK, axis=1) / denom  # (K, 2C)
    Xg_c = (X - col_mean[:, None, :]) * wK
    cov = jnp.einsum("ktf,ktg->kfg", Xg_c, Xg_c)  # (K, 2C, 2C)
    _, V = jnp.linalg.eigh(cov)  # ascending eigenvalues
    vt = jnp.flip(V, axis=-1).swapaxes(-1, -2)  # rows = descending components
    # sklearn svd_flip (v-based): max-|v| loading of each component positive
    max_idx = jnp.argmax(jnp.abs(vt), axis=-1)
    signs = jnp.sign(jnp.take_along_axis(vt, max_idx[..., None], axis=-1)[..., 0])
    vt = vt * signs[:, :, None]
    comps = vt[:, :n_latent, :]  # (K, L, 2C)
    pcs_all = jnp.einsum("ktf,klf->ktl", X - col_mean[:, None, :], comps)

    # KF init from each keypoint's own UNtruncated valid set
    # (initialize_kalman_filter_pca semantics)
    fmask = mask.T.astype(dt)  # (K, T)
    cnt = counts.astype(dt)
    mean_pc = jnp.einsum("kt,ktl->kl", fmask, pcs_all) / cnt[:, None]
    dev = (pcs_all - mean_pc[:, None, :]) * fmask[:, :, None]
    var_pc = jnp.einsum("ktl,ktl->kl", dev, dev) / cnt[:, None]  # ddof=0
    S0s = var_pc[:, :, None] * jnp.eye(n_latent, dtype=dt)

    def q_one(pcs_k, mask_k, cnt_k):
        # np.cov (ddof=1) of lag-1 diffs over the COMPACTED good sequence:
        # stable argsort pulls the valid rows to the front in time order
        perm = jnp.argsort(~mask_k, stable=True)
        ps = pcs_k[perm]
        d = ps[1:] - ps[:-1]  # (T-1, L)
        wd = (jnp.arange(d.shape[0], dtype=dt) < (cnt_k - 1)).astype(dt)[:, None]
        n_d = cnt_k - 1.0
        mu = jnp.sum(d * wd, axis=0) / n_d
        dc = (d - mu) * wd
        cov = dc.T @ dc / (n_d - 1.0)
        peak = jnp.max(jnp.abs(cov))
        return jnp.where(peak > 0, cov / peak, cov)

    Qs = vmap(q_one)(pcs_all, mask.T, cnt)
    m0s = jnp.zeros((K, n_latent), dtype=dt)
    As = jnp.broadcast_to(jnp.eye(n_latent, dtype=dt), (K, n_latent, n_latent))
    Cs = jnp.swapaxes(comps, 1, 2)  # (K, 2C, L)
    return stats, X, evars, m0s, S0s, As, Qs, Cs, means


@jax.jit
def _package_multicam_smoothed(means, Cs, ms, Vs, evars):
    """Device packaging of the smoother-dependent per-camera block:
    reproject the latent through C, re-add centering means, and apply the
    posterior-var + ensemble-var quirk. Returns (C, T, K, 4) as
    [x, y, x_posterior_var, y_posterior_var]; the five ensemble-stat
    columns ship to host separately (overlapped with the optimizer)."""
    y_m = jnp.einsum("koj,ktj->kto", Cs, ms)  # (K, T, 2C)
    y_v = jnp.einsum("koj,ktjl,kol->kto", Cs, Vs, Cs)
    post = y_v + evars  # posterior var + ensemble var (reference quirk)

    def cam(c):
        xi, yi = 2 * c, 2 * c + 1
        return jnp.stack(
            [
                y_m[:, :, xi].T + means[c, :, 0][None],
                y_m[:, :, yi].T + means[c, :, 1][None],
                post[:, :, xi].T,
                post[:, :, yi].T,
            ],
            axis=-1,
        )  # (T, K, 4)

    return jnp.stack([cam(c) for c in range(means.shape[0])])


@jax.jit
def _package_3d(ms, Vs):
    """(K, T, L) latents + (K, T, L, L) covs -> (T, K*(2L)) layout of the
    3-D output dataframe: per keypoint [x, y, z, *_posterior_var]."""
    diag = jnp.diagonal(Vs, axis1=-2, axis2=-1)  # (K, T, L)
    arr = jnp.concatenate([ms, diag], axis=-1)  # (K, T, 2L)
    K, T, F = arr.shape
    return jnp.transpose(arr, (1, 0, 2)).reshape(T, K * F)


def _smoother_multicam_linear_fused(
    marker_array, keypoint_names, smooth_param, quantile_keep_pca,
    avg_mode, var_mode, n_latent, total_t0,
    devices=None, partition="keypoint",
):
    """Linear multicam smoother with fused prep and packaging. The prep
    program runs on the host CPU backend by default (transfer-lean: only the
    observations + variances the accelerator consumes are uploaded, and the
    ensemble-stat columns never round-trip — same rationale as the singlecam
    ``prep='host'`` path). Output contract identical to the general path
    (same columns, quirks).

    With ``devices`` > 1 the smoothing step shards over a 1-D mesh: operands
    stay host-side here (the core pads and device-puts them straight onto
    the mesh devices, never through the ambient default backend) and the
    packaging runs on the host CPU backend from one batched pull of the
    mesh-sharded moments."""
    M, V, T, K, _ = marker_array.shape
    arr = np.asarray(marker_array.array)  # (M, C, T, K, 3)
    mesh_run = devices is not None and devices > 1

    _t0 = time.perf_counter()
    with jax.default_device(jax.devices("cpu")[0]):
        prep_out = _prep_multicam_linear(
            arr[..., 0], arr[..., 1], arr[..., 2],
            M, avg_mode, var_mode, int(n_latent), float(quantile_keep_pca),
        )
    (
        stats_np, ys_np, evars_np, m0s_np, S0s_np, As_np, Qs_np, Cs_np,
        means_np,
    ) = jax.device_get(prep_out)
    if mesh_run:
        # mesh path: keep host arrays — run_kalman_smoother shards them onto
        # the mesh devices directly
        ys, evars = ys_np, evars_np
        m0s, S0s, As, Qs, Cs = m0s_np, S0s_np, As_np, Qs_np, Cs_np
        means = means_np
    else:
        # exactly two big uploads feed the device pipeline; stats stay on host
        ys = jnp.asarray(ys_np)
        evars = jnp.asarray(evars_np)
        m0s, S0s, As, Qs, Cs, means = map(
            jnp.asarray, (m0s_np, S0s_np, As_np, Qs_np, Cs_np, means_np)
        )
    logger.debug(f"[timing] host prep: {time.perf_counter() - _t0:.3f}s")

    _t0 = time.perf_counter()
    s_finals, ms, Vs = run_kalman_smoother(
        ys=ys,
        m0s=m0s, S0s=S0s, As=As, Qs=Qs, Cs=Cs,
        ensemble_vars=np.swapaxes(evars, 0, 1) if mesh_run
        else jnp.swapaxes(evars, 0, 1),  # (T, K, 2C)
        smooth_param=smooth_param,
        devices=devices,
        partition=partition,
    )
    logger.debug(f"[timing] run_kalman_smoother: {time.perf_counter() - _t0:.3f}s")

    _t0 = time.perf_counter()
    if mesh_run:
        # one batched pull of the mesh-sharded moments; packaging runs on the
        # host CPU backend (mixing mesh-committed and default-device arrays
        # in one jit is not legal)
        ms_np, Vs_np = jax.device_get((ms, Vs))
        with jax.default_device(jax.devices("cpu")[0]):
            sm4 = _package_multicam_smoothed(means, Cs, ms_np, Vs_np, evars)
            arr_3d = (
                _package_3d(ms_np, Vs_np)
                if n_latent == 3
                else jnp.zeros((T, K * 6), dtype=sm4.dtype)
            )
        sm4_np, arr_3d_np = np.asarray(sm4), np.asarray(arr_3d)
    else:
        sm4 = _package_multicam_smoothed(means, Cs, ms, Vs, evars)
        arr_3d = (
            _package_3d(ms, Vs)
            if n_latent == 3
            else jnp.zeros((T, K * 6), dtype=sm4.dtype)
        )
        # ONE batched pull of the smoother-dependent blocks; the ensemble
        # stats never left the host
        sm4_np, arr_3d_np = jax.device_get((sm4, arr_3d))

    camera_dfs = _assemble_camera_dfs(sm4_np, stats_np, keypoint_names)
    labels_3d = ["x", "y", "z", "x_posterior_var", "y_posterior_var", "z_posterior_var"]
    df_3d = pd.DataFrame(
        arr_3d_np, columns=make_dlc_pandas_index(keypoint_names, labels_3d)
    )
    logger.debug(
        f"[timing] fused packaging + pull: {time.perf_counter() - _t0:.3f}s"
    )
    logger.debug(
        f"[timing] ensemble_kalman_smoother_multicam total: "
        f"{time.perf_counter() - total_t0:.3f}s"
    )
    return camera_dfs, s_finals, df_3d


def _assemble_camera_dfs(sm4_np, stats_np, keypoint_names) -> list:
    """Interleave the smoother-dependent block (C, T, K, 4) with the ensemble
    stats (C, T, K, 5) into one 9-column-per-keypoint DataFrame per camera."""
    V, T, K, _ = sm4_np.shape
    cols = make_dlc_pandas_index(keypoint_names, OUTPUT_LABELS)
    camera_dfs = []
    for c in range(V):
        block = np.concatenate(
            [
                sm4_np[c][..., :2],  # x, y
                stats_np[c][..., 4:5],  # likelihood
                stats_np[c][..., 0:2],  # x_ens_median, y_ens_median
                stats_np[c][..., 2:4],  # x_ens_var, y_ens_var
                sm4_np[c][..., 2:4],  # x/y posterior var
            ],
            axis=-1,
        )  # (T, K, 9)
        camera_dfs.append(
            pd.DataFrame(block.reshape(T, K * len(OUTPUT_LABELS)), columns=cols)
        )
    return camera_dfs


# --------------------------------------------------------------------------- #
# fused nonlinear (calibrated) path
# --------------------------------------------------------------------------- #
@partial(jax.jit, static_argnums=(3, 4, 5))
@highest_precision
def _prep_multicam_nonlinear(
    data_x, data_y, data_lh, n_models, avg_mode, var_mode, Ks, dists, extr
):
    """Device twin of ensemble() + triangulate_3d_models +
    initialize_kalman_filter_geometric for the calibrated family: one program,
    no intermediate host transfer, the per-camera undistort vmapped over a
    stacked camera axis instead of C separate dispatches.

    Inputs: (M, C, T, K) prediction planes + stacked camera params
    (Ks (C,3,3), dists (C,14), extr (C,3,4)). Returns
    (ys (K,T,2C) raw pixel obs, evars (K,T,2C),
    m0s, S0s, As, Qs, Cs, ys_3d) with a 3-D identity emission placeholder —
    the actual emission is the nonlinear projection h_fn. ``ys_3d``
    (K, T, 3) is the triangulated trajectory: the s-optimizer's EKF
    linearization init (core.py:optimize_smooth_param x_init).
    """
    stats = _ensemble_kernel(
        data_x, data_y, data_lh, n_models, avg_mode, var_mode, 1000.0
    )  # (C, T, K, 5)
    preds = stats[..., :2]
    variances = stats[..., 2:4]
    C, T, K, _ = stats.shape
    dt = preds.dtype
    M = data_x.shape[0]

    ys = jnp.transpose(preds, (2, 1, 0, 3)).reshape(K, T, 2 * C)
    evars = jnp.transpose(variances, (2, 1, 0, 3)).reshape(K, T, 2 * C)

    # triangulate every (model, keypoint, frame) in one batched DLT; flat
    # point index is (m, k, t) to match triangulate_3d_models
    pts = jnp.stack([data_x, data_y], axis=-1)  # (M, C, T, K, 2)
    pts = jnp.transpose(pts, (1, 0, 3, 2, 4)).reshape(C, M * K * T, 2)
    und = vmap(undistort_points)(pts, Ks, dists)  # (C, N, 2)
    xyz = triangulate_dlt(und, extr)  # (N, 3)
    ys_3d = xyz.reshape(M, K, T, 3).mean(axis=0)  # (K, T, 3)

    # geometric init (initialize_kalman_filter_geometric semantics)
    eye3 = jnp.eye(3, dtype=dt)
    m0s = ys_3d[:, :10].mean(axis=1)
    S0s = (jnp.nanvar(ys_3d, axis=1) + 1e-4)[:, :, None] * eye3
    dxs = ys_3d[:, 1:] - ys_3d[:, :-1]
    med = jnp.median(dxs, axis=1, keepdims=True)
    mad = jnp.median(jnp.abs(dxs - med), axis=1) + 1e-12
    qvar = jnp.maximum((1.4826 * mad) ** 2, 1e-8)
    Qs = qvar[:, :, None] * eye3
    As = jnp.broadcast_to(eye3, (K, 3, 3))
    # the ensemble-stat table is NOT returned: the caller recomputes the
    # output columns on the host (the raw planes are host-resident anyway),
    # and a jit output cannot be dead-code-eliminated by XLA
    return ys, evars, m0s, S0s, As, Qs, As, ys_3d


@jax.jit
@highest_precision
def _package_multicam_nonlinear(ms, Vs, evars, Ks, dists, extr):
    """Device reprojection epilogue for the calibrated family: project the
    smoothed 3-D latents and their covariances through every camera in one
    batched program. Returns (C, T, K, 4) as
    [x, y, x_posterior_var, y_posterior_var]."""
    K_, T, _ = ms.shape
    Rs = extr[:, :, :3]
    ts = extr[:, :, 3]
    flat = ms.reshape(-1, 3)  # (N, 3), flat index (k, t)
    Vflat = Vs.reshape(-1, 3, 3)

    def cam_all(R, t, Km, d):
        proj = vmap(lambda p: project_point(p, R, t, Km, d))(flat)  # (N, 2)
        J = vmap(lambda p: jax.jacfwd(project_point)(p, R, t, Km, d))(flat)
        pvar = jnp.einsum("nij,njl,nil->ni", J, Vflat, J)  # (N, 2)
        return proj, pvar

    proj, pvar = vmap(cam_all)(Rs, ts, Ks, dists)  # (C, N, 2) each

    # reference quirk: EVERY camera's projected variance gets camera 0's
    # x/y ensemble variance added — the reference passes the full (T, 2C)
    # slab per keypoint and reads columns 0/1
    # (eks/multicam_smoother.py:459-460, :944-945)
    ev0 = evars[..., :2].reshape(-1, 2)  # (N, 2)
    post = pvar + ev0[None]

    out = jnp.concatenate([proj, post], axis=-1).reshape(-1, K_, T, 4)
    return jnp.transpose(out, (0, 2, 1, 3))  # (C, T, K, 4)


def _smoother_multicam_nonlinear_fused(
    marker_array, keypoint_names, camgroup, smooth_param,
    avg_mode, var_mode, total_t0,
    devices=None, partition="keypoint",
):
    """Calibrated multicam smoother with device-resident prep and packaging.
    Output contract identical to the general nonlinear path (same columns,
    same cam-0 variance quirk); only the staging differs.

    With ``devices`` > 1 the nonlinear-EKF smoothing step shards over a 1-D
    mesh (the iterated parallel EKF runs per-lane under shard_map with the
    projection h_fn closed over); prep and the reprojection epilogue run on
    the host CPU backend so operands ship straight onto the mesh devices."""
    M, V, T, K, _ = marker_array.shape
    arr = np.asarray(marker_array.array)  # (M, C, T, K, 3)
    mesh_run = devices is not None and devices > 1
    Ks_np, dists_np, extr_np = stack_camera_params(camgroup)

    _t0 = time.perf_counter()
    if mesh_run:
        # host prep: the mesh path shards host arrays straight onto its
        # devices; an eager upload here would commit them to the ambient
        # default backend instead
        with jax.default_device(jax.devices("cpu")[0]):
            prep_out = _prep_multicam_nonlinear(
                arr[..., 0], arr[..., 1], arr[..., 2],
                M, avg_mode, var_mode,
                Ks_np, dists_np, extr_np,
            )
        ys, evars, m0s, S0s, As, Qs, Cs, ys_3d = jax.device_get(prep_out)
    else:
        Ks_j = jnp.asarray(Ks_np)
        dists_j = jnp.asarray(dists_np)
        extr_j = jnp.asarray(extr_np)
        ys, evars, m0s, S0s, As, Qs, Cs, ys_3d = _prep_multicam_nonlinear(
            jnp.asarray(arr[..., 0]),
            jnp.asarray(arr[..., 1]),
            jnp.asarray(arr[..., 2]),
            M, avg_mode, var_mode, Ks_j, dists_j, extr_j,
        )
    logger.debug(f"[timing] fused prep (nonlinear): {time.perf_counter() - _t0:.3f}s")

    h_fn, _ = make_projection_from_camgroup(camgroup)
    _t0 = time.perf_counter()
    s_finals, ms, Vs = run_kalman_smoother(
        ys=ys,
        m0s=m0s, S0s=S0s, As=As, Qs=Qs, Cs=Cs,
        ensemble_vars=np.swapaxes(evars, 0, 1) if mesh_run
        else jnp.swapaxes(evars, 0, 1),  # (T, K, 2C)
        smooth_param=smooth_param,
        h_fn=h_fn,
        x_init=ys_3d,  # triangulated trajectory: EKF linearization init
        devices=devices,
        partition=partition,
    )
    logger.debug(f"[timing] run_kalman_smoother: {time.perf_counter() - _t0:.3f}s")

    _t0 = time.perf_counter()
    # the ensemble-stat output columns are recomputed on the host CPU
    # backend from the raw planes (already host-resident) while the device
    # finishes smoothing + reprojection — the (C, T, K, 5) stats block then
    # never rides the device link, shrinking the one batched pull to the
    # smoother-dependent outputs
    with jax.default_device(jax.devices("cpu")[0]):
        stats_host = _ensemble_kernel(
            arr[..., 0], arr[..., 1], arr[..., 2], M, avg_mode, var_mode,
            1000.0,
        )
    stats_np = np.asarray(stats_host)
    if mesh_run:
        ms_np, Vs_np = jax.device_get((ms, Vs))
        with jax.default_device(jax.devices("cpu")[0]):
            sm4 = _package_multicam_nonlinear(
                ms_np, Vs_np, evars, Ks_np, dists_np, extr_np
            )
            arr_3d = _package_3d(ms_np, Vs_np)
        sm4_np, arr_3d_np = np.asarray(sm4), np.asarray(arr_3d)
    else:
        sm4 = _package_multicam_nonlinear(ms, Vs, evars, Ks_j, dists_j, extr_j)
        arr_3d = _package_3d(ms, Vs)
        sm4_np, arr_3d_np = jax.device_get((sm4, arr_3d))

    camera_dfs = _assemble_camera_dfs(sm4_np, stats_np, keypoint_names)
    labels_3d = ["x", "y", "z", "x_posterior_var", "y_posterior_var", "z_posterior_var"]
    df_3d = pd.DataFrame(
        arr_3d_np, columns=make_dlc_pandas_index(keypoint_names, labels_3d)
    )
    logger.debug(
        f"[timing] fused packaging + pull (nonlinear): {time.perf_counter() - _t0:.3f}s"
    )
    logger.debug(
        f"[timing] ensemble_kalman_smoother_multicam total: "
        f"{time.perf_counter() - total_t0:.3f}s"
    )
    return camera_dfs, s_finals, df_3d


# --------------------------------------------------------------------------- #
# variance inflation
# --------------------------------------------------------------------------- #
def mA_compute_maha(
    centered_emA_preds: MarkerArray,
    emA_vars: MarkerArray,
    emA_likes: MarkerArray,
    n_latent: int,
    inflate_vars_kwargs: dict | None = None,
    threshold: float = 5.0,
    scalar: float = 10.0,
) -> MarkerArray:
    """Fixed-point variance inflation: per keypoint, compute Mahalanobis
    distances and multiply variances by ``scalar`` where the distance exceeds
    ``threshold``; repeat until nothing inflates
    (reference: eks/multicam_smoother.py:653-721)."""
    _, n_cameras, _, n_keypoints, _ = centered_emA_preds.shape

    # copy so neither a shared default nor the caller's dict is mutated
    inflate_vars_kwargs = dict(inflate_vars_kwargs or {})
    inflate_vars_kwargs.setdefault("likelihood_threshold", 0.9)
    inflate_vars_kwargs.setdefault("v_quantile_threshold", 50.0)

    out_list = []
    for k in range(n_keypoints):
        preds = mA_to_stacked_array(centered_emA_preds, k)
        variances = mA_to_stacked_array(emA_vars, k)
        likes = mA_to_stacked_array(emA_likes, k)

        logger.info(f"variance-inflation pass for keypoint {k}")
        inflated = True
        tmp = variances
        while inflated:
            if inflate_vars_kwargs.get("likelihoods", None) is None:
                maha = compute_mahalanobis(
                    preds, tmp, n_latent=n_latent, **inflate_vars_kwargs
                )
            else:
                maha = compute_mahalanobis(
                    preds, tmp, n_latent=n_latent, likelihoods=likes,
                    **inflate_vars_kwargs,
                )
            tmp, inflated = inflate_variance(
                tmp, maha["mahalanobis"], threshold, scalar
            )

        out_list.append(
            stacked_array_to_mA(tmp, n_cameras, data_fields=["var_x", "var_y"])
        )
    return MarkerArray.stack(out_list, "keypoints")


def inflate_variance(
    v: np.ndarray,
    maha_dict: dict,
    threshold: float = 5.0,
    scalar: float = 10.0,
) -> tuple:
    """Multiply variances by ``scalar`` for (frame, view) cells whose
    Mahalanobis distance exceeds ``threshold``. With exactly 2 views, any
    flagged view inflates the whole row (reference:
    eks/multicam_smoother.py:724-764).

    Returns (updated_v, anything_inflated).
    """
    assert len(maha_dict) >= 2, "variance inflation needs at least two camera views"
    updated = v.copy()
    N, _ = v.shape
    C = len(maha_dict)

    mask = np.zeros((N, C), dtype=bool)
    for view, dist in maha_dict.items():
        mask[:, view] = dist[:, 0] > threshold

    full = np.repeat(mask, 2, axis=1)
    if C == 2:
        full |= full.any(axis=1, keepdims=True)

    updated[full] *= scalar
    return updated, bool(full.any())


# --------------------------------------------------------------------------- #
# nonlinear-path helpers
# --------------------------------------------------------------------------- #
def triangulate_3d_models(marker_array: MarkerArray, camgroup: CameraGroup) -> np.ndarray:
    """Triangulate every (model, keypoint, frame) in one batched call:
    (M, C, T, K, >=2) marker array -> (M, K, T, 3).

    Replaces the reference's M*K joblib-threaded aniposelib calls
    (eks/multicam_smoother.py:888-911) with a single vectorized undistort +
    DLT over all M*K*T points.
    """
    M, C, T, K, _ = marker_array.shape
    raw = np.asarray(marker_array.get_array()[..., :2], dtype=np.float64)
    # (C, M*K*T, 2) with flat index (m, k, t)
    pts = raw.transpose(1, 0, 3, 2, 4).reshape(C, M * K * T, 2)

    und = np.stack(
        [
            np.asarray(cam.undistort(jnp.asarray(pts[c])))
            for c, cam in enumerate(camgroup.cameras)
        ]
    )
    extr = np.stack([cam.extrinsics() for cam in camgroup.cameras])
    xyz = np.asarray(triangulate_dlt(jnp.asarray(und), jnp.asarray(extr)))
    return xyz.reshape(M, K, T, 3)


def project_3d_covariance_to_2d(
    ms: np.ndarray,  # (K, T, 3) or (T, 3)
    Vs: np.ndarray,  # (K, T, 3, 3) or (T, 3, 3)
    h_cam,
    ensemble_vars: np.ndarray,  # (K, T, 2C) or (T, 2C) — x/y of this camera first
) -> tuple[np.ndarray, np.ndarray]:
    """Project 3-D posterior covariance to a camera's 2-D pixel variances via
    the projection Jacobian: ``cov2d = J V Jᵀ``, with the ensemble variance
    added on top (reference: eks/multicam_smoother.py:914-946).

    Returns (var_x, var_y) matching the leading shape of ``ms`` minus the
    state axis.
    """
    squeeze = ms.ndim == 2
    ms_b = ms[None] if squeeze else ms  # (K, T, 3)
    Vs_b = Vs[None] if squeeze else Vs
    ev_b = ensemble_vars[None] if squeeze else ensemble_vars

    J = np.asarray(vmap(vmap(jax.jacfwd(h_cam)))(jnp.asarray(ms_b)))  # (K, T, 2, 3)
    cov2d = np.einsum("ktij,ktjl,ktml->ktim", J, Vs_b, J)  # (K, T, 2, 2)
    var_x = cov2d[..., 0, 0] + ev_b[..., 0]
    var_y = cov2d[..., 1, 1] + ev_b[..., 1]
    if squeeze:
        return var_x[0], var_y[0]
    return var_x, var_y
