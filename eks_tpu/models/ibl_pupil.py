"""IBL pupil smoother: 3-state AR(1) latent model (diameter + center of mass).

Model (reference: eks/ibl_pupil_smoother.py:197-448): latent
``x = [diameter, com_x, com_y]`` with AR(1) dynamics ``A = diag(s_d, s_c,
s_c)`` and stationary process noise ``Q = diag(var * (1 - s^2))``; a fixed
8x3 emission matrix encodes pupil geometry (top_y = com_y - d/2, right_x =
com_x + d/2, ...). The two smoothing parameters live in (0, 1) and are
optimized in sigmoid-unconstrained space against the filter NLL with
time-varying R (Adam lr=5e-3, tol=1e-6, cap=5000).

Output parity quirks preserved deliberately (they are what the reference's
golden files contain):
  * data blocks are packed in [top, right, bottom, left] order while columns
    are labeled in the [top, bottom, right, left] keypoint order
    (eks/ibl_pupil_smoother.py:313-319 vs :356);
  * block i's likelihood column is ``ensemble_likes[:, i]`` — the i-th
    keypoint's likelihood, not the block's (:332);
  * posterior variances are read at indices (i, i) and (i+1, i+1) instead of
    (2i, 2i+1) (:347-351).
"""

from __future__ import annotations

import logging
import os
import warnings
from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd
from jax import lax

import eks_tpu.core as _core
from eks_tpu.core import ensemble
from eks_tpu.marker_array import MarkerArray, input_dfs_to_markerArray
from eks_tpu.ops.linalg import highest_precision
from eks_tpu.ops.pkalman import (
    filter_nll_parallel_planes_tv,
    kalman_filter_parallel,
    kalman_smoother_parallel,
)
from eks_tpu.utils import (
    crop_frames,
    format_data,
    make_dlc_pandas_index,
    save_dlc_csv,
)

logger = logging.getLogger(__name__)

__all__ = [
    "fit_eks_pupil",
    "fit_eks_pupil_sessions",
    "ensemble_kalman_smoother_ibl_pupil",
    "ensemble_kalman_smoother_ibl_pupil_sessions",
    "get_pupil_location",
    "get_pupil_diameter",
    "add_mean_to_array",
    "run_pupil_kalman_smoother",
    "pupil_optimize_smooth",
]

# the pupil smoother requires this exact keypoint set and order
BODYPART_LIST = ["pupil_top_r", "pupil_bottom_r", "pupil_right_r", "pupil_left_r"]

# emission matrix: rows are (top_x, top_y, bottom_x, bottom_y, right_x,
# right_y, left_x, left_y), state is [diameter, com_x, com_y]
PUPIL_C = np.asarray(
    [
        [0, 1, 0],
        [-0.5, 0, 1],
        [0, 1, 0],
        [0.5, 0, 1],
        [0.5, 1, 0],
        [0, 0, 1],
        [-0.5, 1, 0],
        [0, 0, 1],
    ]
)


def get_pupil_location(dlc: dict) -> np.ndarray:
    """Pupil center-of-mass per frame from the four edge keypoints.

    x: median of (top/bottom nanmedian, left/right median); y: median of
    (top/bottom median, left/right nanmedian) — the reference's exact
    NaN-tolerance pattern (eks/ibl_pupil_smoother.py:34-59).
    """
    t = np.vstack((dlc["pupil_top_r_x"], dlc["pupil_top_r_y"])).T
    b = np.vstack((dlc["pupil_bottom_r_x"], dlc["pupil_bottom_r_y"])).T
    le = np.vstack((dlc["pupil_left_r_x"], dlc["pupil_left_r_y"])).T
    r = np.vstack((dlc["pupil_right_r_x"], dlc["pupil_right_r_y"])).T

    center = np.zeros(t.shape)
    tmp_x1 = np.nanmedian(np.hstack([t[:, 0, None], b[:, 0, None]]), axis=1)
    tmp_x2 = np.median(np.hstack([r[:, 0, None], le[:, 0, None]]), axis=1)
    center[:, 0] = np.nanmedian(np.hstack([tmp_x1[:, None], tmp_x2[:, None]]), axis=1)
    tmp_y1 = np.median(np.hstack([t[:, 1, None], b[:, 1, None]]), axis=1)
    tmp_y2 = np.nanmedian(np.hstack([r[:, 1, None], le[:, 1, None]]), axis=1)
    center[:, 1] = np.nanmedian(np.hstack([tmp_y1[:, None], tmp_y2[:, None]]), axis=1)
    return center


def get_pupil_diameter(dlc: dict) -> np.ndarray:
    """Pupil diameter per frame: median of two direct spans and four
    circle-assumption estimates from non-crossing pairs
    (eks/ibl_pupil_smoother.py:62-90)."""
    top, bottom, left, right = [
        np.vstack((dlc[f"pupil_{p}_r_x"], dlc[f"pupil_{p}_r_y"]))
        for p in ["top", "bottom", "left", "right"]
    ]
    diameters = [
        np.linalg.norm(top - bottom, axis=0),
        np.linalg.norm(left - right, axis=0),
    ]
    for a, b in [(top, left), (top, right), (bottom, left), (bottom, right)]:
        diameters.append(np.linalg.norm(a - b, axis=0) * 2**0.5)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        return np.nanmedian(diameters, axis=0)


def add_mean_to_array(
    pred_arr: np.ndarray, keys: list[str], mean_x: float, mean_y: float
) -> dict[str, np.ndarray]:
    """Re-add COM means: keys containing 'x' get mean_x, others mean_y."""
    out = {}
    for i, key in enumerate(keys):
        out[key] = pred_arr[:, i] + (mean_x if "x" in key else mean_y)
    return out


def fit_eks_pupil(
    input_source: str | list,
    save_file: str,
    smooth_params: list | None = None,
    s_frames: list | None = None,
    avg_mode: Literal["mean", "median"] = "median",
    var_mode: Literal["var", "confidence_weighted_var"] = "confidence_weighted_var",
    devices: int | None = None,
    partition: Literal["keypoint", "time"] = "keypoint",
) -> tuple:
    """Load ensemble CSVs and run the pupil smoother.

    ``devices`` > 1 shards the optimizer + smoother over a 1-D device mesh.
    The pupil model is ONE joint 8-observation sequence (no independent
    keypoint lanes), so its only shardable axis is time: any ``devices``
    request runs sequence parallelism over the frame axis regardless of
    ``partition`` (accepted for interface uniformity with the other
    families).

    Returns:
        (df_smoothed, smooth_params_final, input_dfs_list, bodypart_list)
    """
    input_dfs_list, _ = format_data(input_source)
    logger.info(f"input data loaded for keypoints: {BODYPART_LIST}")
    marker_array = input_dfs_to_markerArray([input_dfs_list], BODYPART_LIST, [""])

    df_smoothed, smooth_params_final = ensemble_kalman_smoother_ibl_pupil(
        marker_array=marker_array,
        keypoint_names=BODYPART_LIST,
        smooth_params=smooth_params,
        s_frames=s_frames,
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
    return df_smoothed, smooth_params_final, input_dfs_list, BODYPART_LIST


def ensemble_kalman_smoother_ibl_pupil(
    marker_array: MarkerArray,
    keypoint_names: list,
    smooth_params: list | None = None,
    s_frames: list | None = None,
    avg_mode: Literal["mean", "median"] = "median",
    var_mode: Literal["var", "confidence_weighted_var"] = "confidence_weighted_var",
    devices: int | None = None,
    partition: Literal["keypoint", "time"] = "keypoint",
    lr: float = 5e-3,
    tol: float = 1e-6,
    safety_cap: int = 5000,
) -> tuple:
    """Array-level pupil smoother; returns (markers_df, [s_diam, s_com]).
    ``devices`` > 1 shards the frame axis over a 1-D mesh (the pupil model's
    only shardable axis — see :func:`fit_eks_pupil`)."""
    prep = _pupil_prep(marker_array, keypoint_names, avg_mode, var_mode)
    (ensemble_preds, ensemble_vars, ensemble_likes, y_obs, m0, S0,
     mean_x_obs, mean_y_obs, diameters_var, x_var, y_var) = prep

    s_finals, ms, Vs = run_pupil_kalman_smoother(
        ys=y_obs,  # host array: cropping happens host-side, upload once
        m0=jnp.asarray(m0),
        S0=jnp.asarray(S0),
        C=jnp.asarray(PUPIL_C),
        ensemble_vars=ensemble_vars,
        diameters_var=diameters_var,
        x_var=x_var,
        y_var=y_var,
        s_frames=s_frames,
        smooth_params=smooth_params,
        lr=lr,
        tol=tol,
        safety_cap=safety_cap,
        devices=devices,
    )
    logger.debug(f"tuned pupil params: diameter_s={s_finals[0]}, com_s={s_finals[1]}")

    markers_df = _pupil_package(
        keypoint_names, ms, Vs, ensemble_preds, ensemble_vars, ensemble_likes,
        mean_x_obs, mean_y_obs,
    )
    return markers_df, s_finals


def _pupil_prep(
    marker_array: MarkerArray,
    keypoint_names: list,
    avg_mode: str,
    var_mode: str,
) -> tuple:
    """Host-side prep shared by the single-session and sessions-batched
    paths: ensemble stats, diameter/COM estimators, KF init, COM-centered
    observations. Returns (ensemble_preds, ensemble_vars, ensemble_likes,
    y_obs, m0, S0, mean_x_obs, mean_y_obs, diameters_var, x_var, y_var)."""
    _, _, n_frames, _, _ = marker_array.shape
    keys = [f"{kp}_{coord}" for kp in keypoint_names for coord in ["x", "y"]]

    # host-backend ensemble: every consumer below is host-side (diameter/COM
    # medians, centering), so a device round-trip of the raw planes + stats
    # would be pure transfer cost on a remote-attached accelerator
    with jax.default_device(jax.devices("cpu")[0]):
        emA = ensemble(marker_array, avg_mode=avg_mode, var_mode=var_mode)
    ensemble_preds = emA.slice_fields("x", "y").array[0, 0].reshape(n_frames, -1)
    ensemble_vars = emA.slice_fields("var_x", "var_y").array[0, 0].reshape(n_frames, -1)
    ensemble_likes = emA.slice_fields("likelihood").array[0, 0, :, :, 0]  # (T, K)

    named = {key: ensemble_preds[:, i] for i, key in enumerate(keys)}
    pupil_diameters = get_pupil_diameter(named)
    pupil_locations = get_pupil_location(named)
    mean_x_obs = float(np.mean(pupil_locations[:, 0]))
    mean_y_obs = float(np.mean(pupil_locations[:, 1]))
    x_t_obs = pupil_locations[:, 0] - mean_x_obs
    y_t_obs = pupil_locations[:, 1] - mean_y_obs

    m0 = np.asarray([np.mean(pupil_diameters), 0.0, 0.0])
    S0 = np.diag(
        [np.nanvar(pupil_diameters), np.nanvar(x_t_obs), np.nanvar(y_t_obs)]
    )

    # center observations by the COM means (x columns even, y columns odd)
    y_obs = ensemble_preds.copy()
    y_obs[:, 0::2] -= mean_x_obs
    y_obs[:, 1::2] -= mean_y_obs

    return (
        ensemble_preds, ensemble_vars, ensemble_likes, y_obs, m0, S0,
        mean_x_obs, mean_y_obs,
        float(np.var(pupil_diameters)), float(np.var(x_t_obs)),
        float(np.var(y_t_obs)),
    )


def _pupil_package(
    keypoint_names: list,
    ms: np.ndarray,
    Vs: np.ndarray,
    ensemble_preds: np.ndarray,
    ensemble_vars: np.ndarray,
    ensemble_likes: np.ndarray,
    mean_x_obs: float,
    mean_y_obs: float,
) -> pd.DataFrame:
    """Host-side output packaging (all reference quirks preserved — see the
    module docstring)."""
    keys = [f"{kp}_{coord}" for kp in keypoint_names for coord in ["x", "y"]]
    y_m_smooth = ms @ PUPIL_C.T  # (T, 8)
    y_v_smooth = np.einsum("ij,tjl,ml->tim", PUPIL_C, Vs, PUPIL_C)  # (T, 8, 8)

    processed = add_mean_to_array(y_m_smooth, keys, mean_x_obs, mean_y_obs)
    key_pair_list = [
        ["pupil_top_r_x", "pupil_top_r_y"],
        ["pupil_right_r_x", "pupil_right_r_y"],
        ["pupil_bottom_r_x", "pupil_bottom_r_y"],
        ["pupil_left_r_x", "pupil_left_r_y"],
    ]
    ensemble_indices = [(0, 1), (4, 5), (2, 3), (6, 7)]

    data_arr = []
    labels = [
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
    for i, key_pair in enumerate(key_pair_list):
        data_arr.extend(
            [
                processed[key_pair[0]],
                processed[key_pair[1]],
                ensemble_likes[:, i],
                ensemble_preds[:, ensemble_indices[i][0]],
                ensemble_preds[:, ensemble_indices[i][1]],
                ensemble_vars[:, ensemble_indices[i][0]],
                ensemble_vars[:, ensemble_indices[i][1]],
                y_v_smooth[:, i, i],
                y_v_smooth[:, i + 1, i + 1],
            ]
        )

    pdindex = make_dlc_pandas_index(keypoint_names, labels=labels)
    return pd.DataFrame(np.asarray(data_arr).T, columns=pdindex)


# --------------------------------------------------------------------------- #
# optimizer + smoother
# --------------------------------------------------------------------------- #
def _pupil_model(s_d, s_c, diameters_var, x_var, y_var):
    A = jnp.diag(jnp.array([s_d, s_c, s_c]))
    Q = jnp.diag(
        jnp.array(
            [
                diameters_var * (1.0 - s_d**2),
                x_var * (1.0 - s_c**2),
                y_var * (1.0 - s_c**2),
            ]
        )
    )
    return A, Q


@partial(jax.jit, static_argnames=("lr", "tol", "safety_cap", "plane", "fused"))
@highest_precision
def _pupil_optimize_jit(
    y_loss, r_loss, m0, S0, C, u0,
    diameters_var, x_var, y_var,
    lr: float, tol: float, safety_cap: int,
    plane: bool = False,  # resolved by the caller: True on TPU
    fused: bool = False,  # fused TV Pallas kernel (resolved by the caller)
):
    # NOTE: the per-session variance scales are traced (NOT static) so a new
    # dataset does not recompile this program
    eps = 1e-3

    def to_s(u):
        return jax.nn.sigmoid(u) * (1.0 - 2 * eps) + eps

    def nll(u):
        s = to_s(u)
        A, Q = _pupil_model(s[0], s[1], diameters_var, x_var, y_var)
        if plane:
            # plane-native information-form loss, no (T, O, O) innovation
            # tensors (kept off XLA:CPU — see core.force_plane_opt)
            v = -filter_nll_parallel_planes_tv(y_loss, m0, S0, A, Q, C, r_loss)
        else:
            res = kalman_filter_parallel(y_loss, m0, S0, A, Q, C, r_loss)
            v = -res.log_likelihood
        return jnp.where(jnp.isfinite(v), v, 1e12)

    # two parameters -> forward-mode gradient (2 jvp lanes) instead of one
    # reverse sweep with full residual storage through the prefix scan; the
    # two directional derivatives run as ONE evaluation (parallel lanes on
    # device) rather than two serialized filter passes
    def loss_and_grad_fused(u):
        # TPU hot loop: ONE paired fused-kernel call evaluates both
        # directional derivatives — the problem is replicated onto 2 kernel
        # lanes and jvp'd with per-lane unit tangents (the kernel's minimum
        # tile is 8 lanes, so the extra lane is free; a vmap(jvp(...)) here
        # would instead serialize the pallas_call over a grid dimension)
        from eks_tpu.ops.pallas_nll import filter_nll_fused_tv_batched

        two = lambda a: jnp.broadcast_to(a[None], (2,) + a.shape)
        interp = jax.default_backend() != "tpu"

        def nll2(u2):  # (2, 2): lane i carries its own parameter copy
            s2 = jax.nn.sigmoid(u2) * (1.0 - 2 * eps) + eps
            A2, Q2 = jax.vmap(
                lambda s: _pupil_model(s[0], s[1], diameters_var, x_var, y_var)
            )(s2)
            lls = filter_nll_fused_tv_batched(
                two(y_loss), two(m0), two(S0), A2, Q2, two(C), two(r_loss),
                interpret=interp,
            )
            return jnp.where(jnp.isfinite(-lls), -lls, 1e12)

        losses, grads = jax.jvp(
            nll2, (two(u),), (jnp.eye(2, dtype=u.dtype),)
        )
        return losses[0], grads

    def loss_and_grad(u):
        if fused:
            return loss_and_grad_fused(u)
        tangents = jnp.eye(2, dtype=u.dtype)
        losses, grads = jax.vmap(lambda t: jax.jvp(nll, (u,), (t,)))(tangents)
        return losses[0], grads
    opt = optax.adam(lr)
    opt_state0 = opt.init(u0)

    def cond(carry):
        _, _, prev_loss, iters, done = carry
        return jnp.logical_and(~done, iters < safety_cap)

    def body(carry):
        u, opt_state, prev_loss, iters, _ = carry
        loss, grad = loss_and_grad(u)
        updates, opt_state = opt.update(grad, opt_state)
        u = optax.apply_updates(u, updates)
        rel_tol = tol * jnp.abs(jnp.log(jnp.maximum(prev_loss, 1e-12)))
        done = jnp.where(
            jnp.isfinite(prev_loss),
            jnp.abs(loss - prev_loss) < (rel_tol + 1e-6),
            False,
        )
        return (u, opt_state, loss, iters + 1, done)

    u_f, _, last_loss, iters_f, _ = lax.while_loop(
        cond, body, (u0, opt_state0, jnp.inf, jnp.array(0), jnp.array(False))
    )
    return to_s(u_f), last_loss, iters_f


def pupil_optimize_smooth(
    ys: jnp.ndarray,  # (T, 8) centered observations
    m0: jnp.ndarray,
    S0: jnp.ndarray,
    C: jnp.ndarray,
    ensemble_vars: np.ndarray,  # (T, 8)
    diameters_var: float,
    x_var: float,
    y_var: float,
    s_frames: list | None = None,
    smooth_params: list | None = None,
    lr: float = 5e-3,
    tol: float = 1e-6,
    safety_cap: int = 5000,
    devices: int | None = None,
) -> tuple[float, float]:
    """Tune ``[s_diam, s_com]`` by filter NLL on (optionally cropped) frames,
    in sigmoid-unconstrained space starting from [0.99, 0.98].

    ``devices`` > 1 shards the loss frames' time axis over a 1-D mesh: the
    SPMD partitioner splits the parallel-prefix filter scans across devices
    (collectives carry the cross-chunk combines) while the Adam carry stays
    replicated."""
    if smooth_params is not None and all(v is not None for v in smooth_params):
        s = np.clip(np.asarray(smooth_params, dtype=np.float32), 1e-3, 1 - 1e-3)
        return float(s[0]), float(s[1])

    ys_np = np.asarray(ys)
    vars_np = np.clip(np.asarray(ensemble_vars), 1e-12, None)
    if s_frames and len(s_frames) > 0:
        y_loss = crop_frames(ys_np, s_frames)
        r_loss = crop_frames(vars_np, s_frames)
    else:
        y_loss, r_loss = ys_np, vars_np

    # f64 host-side; canonicalization downcasts to f32 unless enable_x64
    s0 = np.array([0.99, 0.98], dtype=np.float64)
    u0 = np.log(s0 / (1.0 - s0))

    if devices is not None and devices > 1:
        from eks_tpu.parallel.mesh import (
            _replicate,
            make_mesh,
            mesh_dispatch,
            shard_time,
        )

        mesh = make_mesh(devices, axis_name="t")
        y_s, r_s = shard_time(mesh, [y_loss, r_loss], [0, 0], axis_name="t")
        rep = lambda a: _replicate(mesh, a)
        # pallas=False: a fused single-device kernel cannot span the sharded
        # scan axis; plane=False: the XLA associative scan of the generic
        # AoS loss partitions cleanly, while the plane graph is pathological
        # off-TPU and a Pallas plane kernel cannot span the shards either
        with mesh_dispatch(mesh, pallas=False):
            s_opt, last_loss, iters = _pupil_optimize_jit(
                y_s, r_s, rep(m0), rep(S0), rep(C), rep(u0),
                diameters_var=rep(diameters_var),
                x_var=rep(x_var),
                y_var=rep(y_var),
                lr=float(lr), tol=float(tol), safety_cap=int(safety_cap),
                plane=False,
            )
        s_opt = np.asarray(jax.device_get(s_opt))
        logger.debug(
            f"[pupil] iters={int(iters)}  s_diam={float(s_opt[0]):.6f}  "
            f"s_com={float(s_opt[1]):.6f}  NLL={float(last_loss):.6f}"
        )
        return float(s_opt[0]), float(s_opt[1])

    from eks_tpu.ops.pallas_nll import _use_fused_nll_tv

    plane = _core._FORCE_PLANE_OPT is True
    # hot-loop dispatch: the fused TV Pallas kernel (element build + prefix
    # scan + likelihood epilogue in ONE kernel, only the y and r planes in
    # HBM) is the TPU default; force_plane_opt pins the staged plane path
    # for tests, and the generic AoS loss remains the CPU/fallback path.
    fused = (not plane) and _use_fused_nll_tv(
        int(m0.shape[0]), int(y_loss.shape[1]), int(y_loss.shape[0])
    )
    s_opt, last_loss, iters = _pupil_optimize_jit(
        jnp.asarray(y_loss), jnp.asarray(r_loss),
        jnp.asarray(m0), jnp.asarray(S0), jnp.asarray(C), jnp.asarray(u0),
        diameters_var=jnp.asarray(diameters_var),
        x_var=jnp.asarray(x_var),
        y_var=jnp.asarray(y_var),
        lr=float(lr), tol=float(tol), safety_cap=int(safety_cap),
        plane=plane,
        fused=fused,
    )
    s_opt = np.asarray(s_opt)
    from eks_tpu.utils import profiling as _prof

    if _prof.RECORD_OPT_STATS:
        _prof.LAST_OPT_STATS["joint_iters"] = int(iters)
    logger.debug(
        f"[pupil] iters={int(iters)}  s_diam={float(s_opt[0]):.6f}  "
        f"s_com={float(s_opt[1]):.6f}  NLL={float(last_loss):.6f}"
    )
    return float(s_opt[0]), float(s_opt[1])


def run_pupil_kalman_smoother(
    ys: jnp.ndarray,  # (T, 8)
    m0: jnp.ndarray,
    S0: jnp.ndarray,
    C: jnp.ndarray,
    ensemble_vars: np.ndarray,
    diameters_var: float,
    x_var: float,
    y_var: float,
    s_frames: list | None = None,
    smooth_params: list | None = None,
    lr: float = 5e-3,
    tol: float = 1e-6,
    safety_cap: int = 5000,
    sequential: bool = False,
    devices: int | None = None,
) -> tuple[list[float], np.ndarray, np.ndarray]:
    """Optimize [s_diam, s_com], then smooth the full sequence with
    time-varying R. Returns ([s_diam, s_com], ms (T,3), Vs (T,3,3)).
    ``devices`` > 1 shards the frame axis of both stages over a 1-D mesh."""
    s_d, s_c = pupil_optimize_smooth(
        ys=ys, m0=m0, S0=S0, C=C, ensemble_vars=ensemble_vars,
        diameters_var=diameters_var, x_var=x_var, y_var=y_var,
        s_frames=s_frames, smooth_params=smooth_params,
        lr=lr, tol=tol, safety_cap=safety_cap, devices=devices,
    )

    r_np = np.clip(np.asarray(ensemble_vars), 1e-12, None)
    if devices is not None and devices > 1:
        from eks_tpu.parallel.mesh import (
            _replicate,
            make_mesh,
            mesh_dispatch,
            shard_time,
        )

        mesh = make_mesh(devices, axis_name="t")
        ys_s, r_s = shard_time(
            mesh, [np.asarray(ys), r_np], [0, 0], axis_name="t"
        )
        rep = lambda a: _replicate(mesh, np.asarray(a))
        with mesh_dispatch(mesh, pallas=False):
            ms, Vs = _pupil_smooth_jit(
                ys_s, rep(m0), rep(S0), rep(C), r_s,
                rep(s_d), rep(s_c),
                rep(diameters_var), rep(x_var), rep(y_var),
                sequential=sequential,
            )
        ms, Vs = jax.device_get((ms, Vs))
        return [float(s_d), float(s_c)], ms, Vs

    r = jnp.asarray(r_np)
    ms, Vs = _pupil_smooth_jit(
        jnp.asarray(ys), m0, S0, C, r,
        jnp.asarray(s_d), jnp.asarray(s_c),
        jnp.asarray(diameters_var), jnp.asarray(x_var), jnp.asarray(y_var),
        sequential=sequential,
    )
    # one pull for both outputs (the smoother graph runs as a single device
    # program; calling the kernels eagerly here costs seconds of per-op
    # dispatch on a remote-attached chip)
    ms, Vs = jax.device_get((ms, Vs))
    return [float(s_d), float(s_c)], ms, Vs


@partial(jax.jit, static_argnames=("sequential",))
@highest_precision
def _pupil_smooth_jit(ys, m0, S0, C, r, s_d, s_c, diameters_var, x_var, y_var,
                      sequential: bool = False):
    A, Q = _pupil_model(s_d, s_c, diameters_var, x_var, y_var)
    if sequential:
        from eks_tpu.ops.kalman import kalman_smoother

        res = kalman_smoother(ys, m0, S0, A, Q, C=C, r_diag=r)
    else:
        res = kalman_smoother_parallel(ys, m0, S0, A, Q, C, r)
    return res.smoothed_means, res.smoothed_covs


# --------------------------------------------------------------------------- #
# multi-session batching: N sessions as lanes of one device program
# --------------------------------------------------------------------------- #
@partial(jax.jit, static_argnames=("lr", "tol", "safety_cap", "plane", "fused"))
@highest_precision
def _pupil_optimize_sessions_jit(
    y_loss, r_loss, m0, S0, C, u0,
    diameters_var, x_var, y_var,
    lr: float, tol: float, safety_cap: int,
    plane: bool = False,
    fused: bool = False,
):
    """Joint Adam loop over N sessions' 2-parameter pupil optimizers.

    Every array carries a leading session axis (y/r: (N, T, 8); m0: (N, 3);
    S0: (N, 3, 3); u0: (N, 2); the variance scales: (N,)); ``C`` is the
    shared 8x3 geometry. Per-lane convergence replicates
    ``vmap(lax.while_loop)`` batching semantics: a session whose stop rule
    fires freezes its params/optimizer state/loss while the others continue
    (masked selects, the same device-side pattern as
    ``core._optimize_blocks_joint``). With ``fused`` the loss+grad of ALL
    sessions ride ONE lane-batched fused TV-R kernel call — 2 jvp lanes per
    session (ops/pallas_nll.py::filter_nll_fused_tv_batched); otherwise each
    session evaluates the plane/AoS loss under vmap."""
    eps = 1e-3
    N = y_loss.shape[0]

    def to_s(u):
        return jax.nn.sigmoid(u) * (1.0 - 2 * eps) + eps

    def nll_one(u, y_s, r_s, m0_s, S0_s, dv, xv, yv):
        s = to_s(u)
        A, Q = _pupil_model(s[0], s[1], dv, xv, yv)
        if plane:
            v = -filter_nll_parallel_planes_tv(y_s, m0_s, S0_s, A, Q, C, r_s)
        else:
            v = -kalman_filter_parallel(
                y_s, m0_s, S0_s, A, Q, C, r_s
            ).log_likelihood
        return jnp.where(jnp.isfinite(v), v, 1e12)

    if fused:
        from eks_tpu.ops.pallas_nll import filter_nll_fused_tv_batched

        interp = jax.default_backend() != "tpu"
        rep2 = lambda a: jnp.repeat(a, 2, axis=0)  # (N, ...) -> (2N, ...)
        y2, r2 = rep2(y_loss), rep2(r_loss)
        m02, S02 = rep2(m0), rep2(S0)
        C2 = jnp.broadcast_to(C[None], (2 * N,) + C.shape)
        dv2, xv2, yv2 = rep2(diameters_var), rep2(x_var), rep2(y_var)
        # per-session unit tangents: lanes (2i, 2i+1) carry session i's
        # d/du_0 and d/du_1 directions
        tang = jnp.tile(jnp.eye(2, dtype=u0.dtype), (N, 1))  # (2N, 2)

        def nll_many(U):  # (2N, 2): one parameter copy per kernel lane
            s2 = jax.nn.sigmoid(U) * (1.0 - 2 * eps) + eps
            A2, Q2 = jax.vmap(
                lambda s, dv, xv, yv: _pupil_model(s[0], s[1], dv, xv, yv)
            )(s2, dv2, xv2, yv2)
            lls = filter_nll_fused_tv_batched(
                y2, m02, S02, A2, Q2, C2, r2, interpret=interp
            )
            return jnp.where(jnp.isfinite(-lls), -lls, 1e12)

        def loss_and_grad(u):  # (N, 2) -> losses (N,), grads (N, 2)
            U = jnp.repeat(u, 2, axis=0)
            losses, dirs = jax.jvp(nll_many, (U,), (tang,))
            return losses[0::2], dirs.reshape(N, 2)
    else:

        def loss_and_grad(u):
            def one(u_s, y_s, r_s, m0_s, S0_s, dv, xv, yv):
                f = lambda uu: nll_one(uu, y_s, r_s, m0_s, S0_s, dv, xv, yv)
                tangents = jnp.eye(2, dtype=u.dtype)
                losses, grads = jax.vmap(lambda t: jax.jvp(f, (u_s,), (t,)))(
                    tangents
                )
                return losses[0], grads

            return jax.vmap(one)(
                u, y_loss, r_loss, m0, S0, diameters_var, x_var, y_var
            )

    opt = optax.adam(lr)
    opt_state0 = jax.vmap(opt.init)(u0)

    def _mask(done, new, old):
        m = done.reshape((N,) + (1,) * (new.ndim - 1))
        return jnp.where(m, old, new)

    def cond(carry):
        _, _, _, iters, done = carry
        return jnp.logical_and(~jnp.all(done), iters < safety_cap)

    def body(carry):
        u, opt_state, prev_loss, iters, done = carry
        loss, grad = loss_and_grad(u)
        updates, opt_state_new = jax.vmap(opt.update)(grad, opt_state)
        u_new = optax.apply_updates(u, updates)
        rel_tol = tol * jnp.abs(jnp.log(jnp.maximum(prev_loss, 1e-12)))
        newly_done = jnp.where(
            jnp.isfinite(prev_loss),
            jnp.abs(loss - prev_loss) < (rel_tol + 1e-6),
            False,
        )
        # lanes already done freeze (their stop-iteration state is final)
        u = _mask(done, u_new, u)
        opt_state = jax.tree_util.tree_map(
            lambda n, o: _mask(done, n, o), opt_state_new, opt_state
        )
        loss = jnp.where(done, prev_loss, loss)
        done = jnp.logical_or(done, newly_done)
        return (u, opt_state, loss, iters + 1, done)

    u_f, _, last_loss, iters_f, _ = lax.while_loop(
        cond, body,
        (
            u0, opt_state0, jnp.full((N,), jnp.inf, dtype=u0.dtype),
            jnp.array(0), jnp.zeros((N,), dtype=bool),
        ),
    )
    return to_s(u_f), last_loss, iters_f


@partial(jax.jit, static_argnames=("sequential",))
@highest_precision
def _pupil_smooth_sessions_jit(
    ys, m0, S0, C, r, s_d, s_c, diameters_var, x_var, y_var,
    sequential: bool = False,
):
    """Final smoothing for N sessions in one program: vmap of the
    single-session smoother over the leading session axis (s_d/s_c and the
    variance scales are (N,))."""

    def one(ys_s, m0_s, S0_s, r_s, sd, sc, dv, xv, yv):
        A, Q = _pupil_model(sd, sc, dv, xv, yv)
        if sequential:
            from eks_tpu.ops.kalman import kalman_smoother

            res = kalman_smoother(ys_s, m0_s, S0_s, A, Q, C=C, r_diag=r_s)
        else:
            res = kalman_smoother_parallel(ys_s, m0_s, S0_s, A, Q, C, r_s)
        return res.smoothed_means, res.smoothed_covs

    return jax.vmap(one)(ys, m0, S0, r, s_d, s_c, diameters_var, x_var, y_var)


def ensemble_kalman_smoother_ibl_pupil_sessions(
    marker_arrays: list,
    keypoint_names: list | None = None,
    smooth_params: list | None = None,
    s_frames: list | None = None,
    avg_mode: Literal["mean", "median"] = "median",
    var_mode: Literal["var", "confidence_weighted_var"] = "confidence_weighted_var",
    lr: float = 5e-3,
    tol: float = 1e-6,
    safety_cap: int = 5000,
) -> list[tuple]:
    """Smooth N pupil sessions as ONE batched device program.

    The pupil model is a single 3-state lane per session, so one session
    badly underfills an accelerator and the optimizer's ~2,700 Adam
    iterations are dispatch-latency-bound; stacking sessions as lanes
    amortizes the whole loop across all of them (a throughput mode the
    reference, which processes one session per invocation, does not have —
    the IBL workload this family exists for is thousands of such sessions).
    Host prep and output packaging stay per-session and identical to
    :func:`ensemble_kalman_smoother_ibl_pupil`; sessions with unequal frame
    counts fall back to sequential runs.

    Args:
        marker_arrays: one (M, 1, T, 4, 3) MarkerArray per session.
        smooth_params: None (tune every session), a single [s_diam, s_com]
            applied to all sessions, or a per-session list of such pairs.

    Returns:
        list of (markers_df, [s_diam, s_com]) per session.
    """
    if not marker_arrays:
        return []  # nothing to smooth; would otherwise crash in np.stack
    n_sessions = len(marker_arrays)
    names = keypoint_names if keypoint_names is not None else BODYPART_LIST

    per_session_params = (
        isinstance(smooth_params, (list, tuple))
        and len(smooth_params) > 0
        and isinstance(smooth_params[0], (list, tuple))
    )
    if per_session_params:
        assert len(smooth_params) == n_sessions, (
            "per-session smooth_params list must match the session count"
        )

    t_counts = {ma.shape[2] for ma in marker_arrays}
    fixed_flags = (
        [all(v is not None for v in p) for p in smooth_params]
        if per_session_params
        else None
    )
    mixed = fixed_flags is not None and len(set(fixed_flags)) > 1
    if len(t_counts) > 1 or n_sessions == 1 or mixed:
        if len(t_counts) > 1:
            logger.info(
                "pupil sessions differ in frame count; falling back to "
                "sequential per-session smoothing"
            )
        return [
            ensemble_kalman_smoother_ibl_pupil(
                marker_array=ma,
                keypoint_names=names,
                smooth_params=(
                    list(smooth_params[i]) if per_session_params
                    else smooth_params
                ),
                s_frames=s_frames,
                avg_mode=avg_mode,
                var_mode=var_mode,
                lr=lr,
                tol=tol,
                safety_cap=safety_cap,
            )
            for i, ma in enumerate(marker_arrays)
        ]

    preps = [
        _pupil_prep(ma, names, avg_mode, var_mode) for ma in marker_arrays
    ]
    (preds_l, vars_l, likes_l, yobs_l, m0_l, S0_l, mx_l, my_l,
     dv_l, xv_l, yv_l) = map(list, zip(*preps))

    all_fixed = (
        fixed_flags is not None and all(fixed_flags)
    ) or (
        not per_session_params
        and smooth_params is not None
        and all(v is not None for v in smooth_params)
    )
    if all_fixed:
        if per_session_params:
            s_pairs = [
                np.clip(np.asarray(p, dtype=np.float32), 1e-3, 1 - 1e-3)
                for p in smooth_params
            ]
        else:
            s = np.clip(
                np.asarray(smooth_params, dtype=np.float32), 1e-3, 1 - 1e-3
            )
            s_pairs = [s] * n_sessions
        s_d = np.asarray([p[0] for p in s_pairs])
        s_c = np.asarray([p[1] for p in s_pairs])
    else:
        # joint optimization across sessions (loss frames optionally cropped)
        ys_np = np.stack(yobs_l)  # (N, T, 8)
        vars_np = np.clip(np.stack(vars_l), 1e-12, None)
        if s_frames and len(s_frames) > 0:
            y_loss = np.stack([crop_frames(y, s_frames) for y in ys_np])
            r_loss = np.stack([crop_frames(r, s_frames) for r in vars_np])
        else:
            y_loss, r_loss = ys_np, vars_np

        s0 = np.array([0.99, 0.98], dtype=np.float64)
        u0 = np.tile(np.log(s0 / (1.0 - s0)), (n_sessions, 1))

        from eks_tpu.ops.pallas_nll import _use_fused_nll_tv

        plane = _core._FORCE_PLANE_OPT is True
        fused = (not plane) and _use_fused_nll_tv(
            3, int(y_loss.shape[2]), int(y_loss.shape[1])
        )
        s_opt, last_loss, iters = _pupil_optimize_sessions_jit(
            jnp.asarray(y_loss), jnp.asarray(r_loss),
            jnp.asarray(np.stack(m0_l)), jnp.asarray(np.stack(S0_l)),
            jnp.asarray(PUPIL_C), jnp.asarray(u0),
            diameters_var=jnp.asarray(np.asarray(dv_l)),
            x_var=jnp.asarray(np.asarray(xv_l)),
            y_var=jnp.asarray(np.asarray(yv_l)),
            lr=float(lr), tol=float(tol), safety_cap=int(safety_cap),
            plane=plane, fused=fused,
        )
        s_opt = np.asarray(jax.device_get(s_opt))
        from eks_tpu.utils import profiling as _prof

        if _prof.RECORD_OPT_STATS:
            _prof.LAST_OPT_STATS["joint_iters"] = int(iters)
        logger.debug(
            f"[pupil sessions] joint iters={int(iters)} "
            f"s_diam={s_opt[:, 0]} s_com={s_opt[:, 1]}"
        )
        s_d, s_c = s_opt[:, 0], s_opt[:, 1]

    r_np = np.clip(np.stack(vars_l), 1e-12, None)
    ms, Vs = _pupil_smooth_sessions_jit(
        jnp.asarray(np.stack(yobs_l)),
        jnp.asarray(np.stack(m0_l)), jnp.asarray(np.stack(S0_l)),
        jnp.asarray(PUPIL_C), jnp.asarray(r_np),
        jnp.asarray(s_d), jnp.asarray(s_c),
        jnp.asarray(np.asarray(dv_l)), jnp.asarray(np.asarray(xv_l)),
        jnp.asarray(np.asarray(yv_l)),
    )
    ms, Vs = jax.device_get((ms, Vs))  # one batched pull for every session

    results = []
    for i in range(n_sessions):
        df = _pupil_package(
            names, ms[i], Vs[i], preds_l[i], vars_l[i], likes_l[i],
            mx_l[i], my_l[i],
        )
        results.append((df, [float(s_d[i]), float(s_c[i])]))
    return results


def fit_eks_pupil_sessions(
    input_sources: list,
    save_files: list,
    smooth_params: list | None = None,
    s_frames: list | None = None,
    avg_mode: Literal["mean", "median"] = "median",
    var_mode: Literal["var", "confidence_weighted_var"] = "confidence_weighted_var",
) -> list[tuple]:
    """File-level wrapper over
    :func:`ensemble_kalman_smoother_ibl_pupil_sessions`: one input source
    and one output CSV per session, all sessions smoothed in one batched
    device program.

    Returns:
        list of (df_smoothed, [s_diam, s_com], input_dfs_list,
        bodypart_list) per session.
    """
    n_sessions = len(input_sources)
    assert len(save_files) == n_sessions, "one save_file per session"

    marker_arrays, dfs_per_session = [], []
    for src in input_sources:
        input_dfs_list, _ = format_data(src)
        marker_arrays.append(
            input_dfs_to_markerArray([input_dfs_list], BODYPART_LIST, [""])
        )
        dfs_per_session.append(input_dfs_list)

    results = ensemble_kalman_smoother_ibl_pupil_sessions(
        marker_arrays=marker_arrays,
        smooth_params=smooth_params,
        s_frames=s_frames,
        avg_mode=avg_mode,
        var_mode=var_mode,
    )

    out = []
    for (df_smoothed, s_final), save_file, dfs in zip(
        results, save_files, dfs_per_session
    ):
        save_dir = os.path.dirname(save_file)
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
        save_dlc_csv(df_smoothed, save_file)
        out.append((df_smoothed, s_final, dfs, BODYPART_LIST))
    return out
