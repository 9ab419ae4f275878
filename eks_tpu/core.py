"""Core ensemble statistics and smoothing-parameter optimization.

TPU-first redesign of the reference pipeline (eks/core.py):

  * ``ensemble`` — one jitted consensus + variance kernel over the whole
    (models, cameras, frames, keypoints) block.
  * ``run_kalman_smoother`` — public driver: builds per-keypoint observation
    noise from ensemble variances, tunes the process-noise scale ``s`` per
    block of keypoints by minimizing summed filter NLL, then runs the final
    smoothing pass with time-varying R.
  * The optimizer is ONE jitted program for any block structure: blocks are
    padded to the max member count and vmapped, so the reference's slow
    per-block-Python-loop path (eks/core.py:403-559) and fast singleton path
    (eks/core.py:562-699) collapse into a single compilation.
  * The filter inside the loss and the final smoother default to the
    O(log T)-depth parallel-prefix implementation (ops/pkalman.py); the
    nonlinear (calibrated-projection) path runs the iterated parallel EKF
    (relinearize at the predicted trajectory -> parallel linear sweep,
    fixed point == sequential EKF). The sequential scan is kept as a parity
    oracle behind ``sequential=True``.

Exact reference semantics preserved (for output parity):
  * ensemble: median/mean consensus; confidence-weighted variance
    ``nanvar/mean_conf``; n_models==1 fallback ``1/max(conf,1e-5)``; NaN
    variance -> ``nan_replacement`` (eks/core.py:54-99).
  * s init: std of frame-to-frame ensemble-variance diffs over the first
    2000 frames, rounded to 5 dp, fallback 2.0 (eks/core.py:104-133,233-236).
  * optimizer: loss uses frames cropped by ``s_frames`` and a CONSTANT
    diagonal R = median-over-time of the ensemble variances floored at
    ``min_R_var=1e-4`` (eks/core.py:419,702-709), while the final smoother
    uses full-length time-varying R — this asymmetry is deliberate.
  * Adam(1.0) on lr-scaled gradients of NLL w.r.t. log(s) clipped to ±8,
    early stop when |loss - prev| < tol*|log(max(prev,1e-12))| + 1e-6, hard
    cap 300 iterations (eks/core.py:513-549).
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Callable, Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax, vmap

from eks_tpu.marker_array import MarkerArray
from eks_tpu.ops.kalman import kalman_filter, kalman_smoother
from eks_tpu.ops.linalg import highest_precision
from eks_tpu.ops.pkalman import (
    ekf_nll_parallel_planes_batched,
    ekf_parallel,
    eks_parallel,
    filter_nll_parallel_planes_batched,
    kalman_filter_parallel,
    kalman_smoother_parallel,
)
from eks_tpu.utils import crop_frames

logger = logging.getLogger(__name__)

__all__ = [
    "ensemble",
    "compute_initial_guesses",
    "run_kalman_smoother",
    "optimize_smooth_param",
    "constant_R_from_timevarying",
]


# --------------------------------------------------------------------------- #
# ensemble statistics
# --------------------------------------------------------------------------- #
def ensemble(
    marker_array: MarkerArray,
    avg_mode: Literal["mean", "median"] = "median",
    var_mode: Literal["var", "confidence_weighted_var"] = "confidence_weighted_var",
    nan_replacement: float = 1000.0,
) -> MarkerArray:
    """Ensemble consensus and variance over the models axis.

    Input fields ``[x, y, likelihood]`` with shape (M, C, T, K, 3); output is
    a (1, C, T, K, 5) MarkerArray with fields
    ``[x, y, var_x, var_y, likelihood]`` where likelihood is the mean model
    confidence. Semantics mirror the reference exactly (eks/core.py:25-101).
    """
    n_models = marker_array.shape[0]

    data_x = jnp.asarray(np.squeeze(marker_array.slice_fields("x").array, axis=-1))
    data_y = jnp.asarray(np.squeeze(marker_array.slice_fields("y").array, axis=-1))
    data_lh = jnp.asarray(
        np.squeeze(marker_array.slice_fields("likelihood").array, axis=-1)
    )

    stats = _ensemble_kernel(
        data_x, data_y, data_lh, n_models, avg_mode, var_mode, float(nan_replacement)
    )
    return MarkerArray(
        np.asarray(stats)[None, ...],
        data_fields=["x", "y", "var_x", "var_y", "likelihood"],
    )


def _nanmedian_small(a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """``jnp.nanmedian`` over a SMALL axis via an unrolled compare-exchange
    network — bit-identical results, ~40x faster on XLA:CPU.

    ``jnp.nanmedian`` lowers to a generic comparator sort, which XLA:CPU
    executes scalar-wise: the (5, 10000, 80) host-prep consensus measured
    0.2 s per plane, 93% of the whole prep program. An odd-even
    transposition network is pure ``minimum``/``maximum`` on full planes
    (vectorizes on every backend). Bit parity: sorted VALUES are
    algorithm-independent, NaNs are excluded via +inf sentinels with an
    explicit non-NaN count (matching nanmedian's semantics; a real +inf
    observation still yields +inf), and the even/odd interpolation
    ``0.5*(lo+hi)`` is exact for ``lo == hi`` so no parity branch is needed.
    Pinned against ``jnp.nanmedian`` in tests/test_core.py.
    """
    a = jnp.moveaxis(a, axis, 0)
    m = a.shape[0]
    isnan = jnp.isnan(a)
    n = jnp.sum(~isnan, axis=0)  # per-lane non-NaN count
    rows = [jnp.where(isnan[i], jnp.inf, a[i]) for i in range(m)]
    for p in range(m):  # odd-even transposition sort, NaN-sentinels last
        for i in range(p % 2, m - 1, 2):
            lo = jnp.minimum(rows[i], rows[i + 1])
            rows[i + 1] = jnp.maximum(rows[i], rows[i + 1])
            rows[i] = lo
    # middle-element selection without gather (tiny axis -> masked sums)
    idx_lo = jnp.maximum(n - 1, 0) // 2
    idx_hi = n // 2
    sel_lo = sel_hi = jnp.zeros_like(rows[0])
    for i in range(m):
        sel_lo = jnp.where(idx_lo == i, rows[i], sel_lo)
        sel_hi = jnp.where(jnp.minimum(idx_hi, m - 1) == i, rows[i], sel_hi)
    med = 0.5 * (sel_lo + sel_hi)
    return jnp.where(n == 0, jnp.nan, med)


#: past this ensemble size the O(M^2) network loses to one generic sort
_NANMEDIAN_NETWORK_MAX = 16


def _nanmedian_models(a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    if a.shape[axis] <= _NANMEDIAN_NETWORK_MAX:
        return _nanmedian_small(a, axis=axis)
    return jnp.nanmedian(a, axis=axis)


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
@highest_precision
def _ensemble_kernel(data_x, data_y, data_lh, n_models, avg_mode, var_mode, nan_rep):
    avg_fn = _nanmedian_models if avg_mode == "median" else jnp.nanmean
    avg_x = avg_fn(data_x, axis=0)
    avg_y = avg_fn(data_y, axis=0)

    mean_conf = jnp.sum(data_lh, axis=0) / n_models

    if n_models == 1:
        single_var = 1.0 / jnp.maximum(mean_conf, 1e-5)
        var_x = single_var
        var_y = single_var
    elif var_mode in ("conf_weighted_var", "confidence_weighted_var"):
        var_x = jnp.nanvar(data_x, axis=0) / mean_conf
        var_y = jnp.nanvar(data_y, axis=0) / mean_conf
    else:
        var_x = jnp.nanvar(data_x, axis=0)
        var_y = jnp.nanvar(data_y, axis=0)

    var_x = jnp.nan_to_num(var_x, nan=nan_rep)
    var_y = jnp.nan_to_num(var_y, nan=nan_rep)
    return jnp.stack([avg_x, avg_y, var_x, var_y, mean_conf], axis=-1)


# --------------------------------------------------------------------------- #
# s initialisation heuristic
# --------------------------------------------------------------------------- #
def compute_initial_guesses(ensemble_vars: np.ndarray | list) -> float:
    """Initial guess for ``s``: std of frame-to-frame ensemble-variance
    changes, clipped to the first 2000 frames, rounded to 5 dp
    (reference: eks/core.py:104-133)."""
    ev = np.asarray(ensemble_vars)[:2000]
    if ev.shape[0] < 2:
        raise ValueError("Initial-s heuristic needs at least two frames of ensemble variance.")
    diffs = ev[1:] - ev[:-1]
    return float(round(np.nanstd(diffs), 5))


def constant_R_from_timevarying(R_t_np: np.ndarray, min_var: float = 1e-4) -> np.ndarray:
    """(T, O, O) time-varying R -> constant diagonal R via the median of the
    per-step diagonals over time, floored at ``min_var``
    (reference: eks/core.py:702-709)."""
    diag_ts = np.diagonal(R_t_np, axis1=-2, axis2=-1)
    med = np.clip(np.nanmedian(diag_ts, axis=0), min_var, np.inf)
    return np.diag(med).astype(R_t_np.dtype)


def _constant_r_from_vars(vars_t: np.ndarray, min_var: float = 1e-4) -> np.ndarray:
    """(T, O) cropped+floored variances -> (O,) constant diagonal via the
    time median, floored at ``min_var``. Diagonal-vector twin of
    :func:`constant_R_from_timevarying`."""
    return np.clip(np.nanmedian(vars_t, axis=0), min_var, np.inf)


@partial(jax.jit, static_argnums=(1,))
def _device_constant_r(ev_kto: jnp.ndarray, min_var: float) -> jnp.ndarray:
    """Device twin of :func:`_constant_r_from_vars` over (K, T, O)."""
    floored = jnp.clip(ev_kto, 1e-12, None)
    return jnp.clip(jnp.nanmedian(floored, axis=1), min_var, jnp.inf)


@partial(jax.jit, static_argnums=())
def _device_s_guesses(ev_tko: jnp.ndarray) -> jnp.ndarray:
    """Device twin of :func:`compute_initial_guesses` for all K keypoints at
    once: std of frame-to-frame variance diffs over the first 2000 frames,
    rounded to 5 dp (reference: eks/core.py:104-133)."""
    ev = ev_tko[:2000]
    diffs = ev[1:] - ev[:-1]  # (T', K, O)
    std = jnp.sqrt(jnp.nanmean(
        (diffs - jnp.nanmean(diffs, axis=(0, 2), keepdims=True)) ** 2,
        axis=(0, 2),
    ))
    return jnp.round(std * 1e5) / 1e5


def _as_traceable_emission(h_fn):
    """Emission functions ride through jit as *traced* pytree arguments.

    A ``jax.tree_util.Partial`` over a module-level projector (see
    geometry.camera.make_projection_from_camgroup) keys the jit cache on the
    stable function identity + parameter shapes, so every session with the
    same camera count shares ONE compilation. A plain closure is wrapped into
    an argument-less Partial — legal as an operand, cached by closure
    identity (the old static-arg behavior)."""
    if h_fn is None or isinstance(h_fn, jax.tree_util.Partial):
        return h_fn
    return jax.tree_util.Partial(h_fn)


# --------------------------------------------------------------------------- #
# the optimizer: one jitted padded-vmap program for any block structure
# --------------------------------------------------------------------------- #
_FORCE_PLANE_OPT: Optional[bool] = None


def _plane_opt_enabled(mesh=None) -> bool:
    """Whether the optimizer should take the joint plane-NLL path. TPU-only
    by default (XLA:CPU's LLVM backend chokes on the plane graph — see
    ``_optimize_blocks``); resolved at call time so it lands in the jit key
    as the static ``joint`` argument. With a mesh the decision follows the
    MESH platform, not the ambient backend: a CPU-fallback mesh on a
    TPU-ambient machine compiles for XLA:CPU inside shard_map."""
    if _FORCE_PLANE_OPT is not None:
        return _FORCE_PLANE_OPT
    if mesh is not None:
        return mesh.devices.flat[0].platform == "tpu"
    return jax.default_backend() == "tpu"


class force_plane_opt:
    """Context manager pinning the joint plane-NLL optimizer path on or off
    regardless of backend (CPU tests use it to exercise the TPU path).
    ``None`` restores backend auto-dispatch."""

    def __init__(self, enabled: Optional[bool] = True):
        self.enabled = enabled

    def __enter__(self):
        global _FORCE_PLANE_OPT
        self._prev = _FORCE_PLANE_OPT
        _FORCE_PLANE_OPT = self.enabled
        return self

    def __exit__(self, *exc):
        global _FORCE_PLANE_OPT
        _FORCE_PLANE_OPT = self._prev
        return False


# Relinearization sweeps for the nonlinear (EKF) optimizer loss when a good
# linearization trajectory is supplied (the calibrated family feeds the
# triangulated 3-D trajectory): 2 warm-started sweeps sit at the sequential-
# EKF fixed point that 12 cold sweeps reach from a broadcast prior.
_EKF_OPT_SWEEPS_WARM = 2
_EKF_OPT_SWEEPS_COLD = 12


def _filter_nll(y, m0, S0, A, Q, C, r, h_fn, sequential, x_init=None):
    """Filter NLL for one sequence; non-finite -> 1e12 penalty
    (reference guard: eks/core.py:471,502,650)."""
    if sequential:
        res = kalman_filter(y, m0, S0, A, Q, C=C, r_diag=r, h_fn=h_fn)
    elif h_fn is not None:
        n_iters = (
            _EKF_OPT_SWEEPS_WARM if x_init is not None else _EKF_OPT_SWEEPS_COLD
        )
        res = ekf_parallel(
            y, m0, S0, A, Q, h_fn, r, n_iters=n_iters, x_init=x_init
        )
    else:
        res = kalman_filter_parallel(y, m0, S0, A, Q, C, r)
    nll = -res.log_likelihood
    return jnp.where(jnp.isfinite(nll), nll, 1e12)


@partial(
    jax.jit,
    static_argnames=(
        "sequential", "lr", "s_lo", "s_hi", "tol", "safety_cap", "joint",
        "plane_ekf",
    ),
)
@highest_precision
def _optimize_blocks(
    yB,  # (n_blocks, B_max, T', O)
    rB,  # (n_blocks, B_max, O) constant diag R per member
    m0B,  # (n_blocks, B_max, D)
    S0B,  # (n_blocks, B_max, D, D)
    AB,  # (n_blocks, B_max, D, D)
    QB,  # (n_blocks, B_max, D, D)
    CB,  # (n_blocks, B_max, O, D)
    maskB,  # (n_blocks, B_max) 1.0 for real members, 0.0 for padding
    s_log_init,  # (n_blocks,)
    xB=None,  # (n_blocks, B_max, T', D) EKF linearization trajectories
    h_fn: Optional[Callable] = None,
    sequential: bool = False,
    lr: float = 0.25,
    s_lo: float = -8.0,
    s_hi: float = 8.0,
    tol: float = 1e-2,
    safety_cap: int = 300,
    joint: bool = False,  # resolved by the caller: True on TPU (linear/R-diag)
    plane_ekf: bool = False,  # resolved by the caller: True on TPU (h_fn set)
):
    """Tune one log(s) per block by Adam on the summed member filter NLLs.

    Every block is one vmap lane; members are padded to the widest block and
    masked out of the loss. Single compilation for any block structure.

    With ``joint=True`` (the TPU default, resolved by
    ``optimize_smooth_param`` — see ``force_plane_opt``) linear blocks take
    the joint-loop path instead: one lane-batched plane NLL evaluates every
    member of every block per iteration (a single Pallas scan on TPU rather
    than a grid-serialized vmap), with per-lane Adam state and masked
    carries replicating ``vmap(while_loop)`` batching semantics exactly.
    The plane program is kept off XLA:CPU by default: LLVM compile time on
    the many-small-op plane graph under vmap+jvp+while is pathological
    (minutes at toy shapes), while the TPU compiler handles it in seconds.
    """
    if joint and h_fn is None and not sequential and rB.ndim == 3:
        return _optimize_blocks_joint(
            yB, rB, m0B, S0B, AB, QB, CB, maskB, s_log_init,
            lr=lr, s_lo=s_lo, s_hi=s_hi, tol=tol, safety_cap=safety_cap,
        )
    if plane_ekf and h_fn is not None and not sequential and rB.ndim == 3:
        return _optimize_blocks_ekf_joint(
            yB, rB, m0B, S0B, AB, QB, maskB, s_log_init, xB, h_fn,
            lr=lr, s_lo=s_lo, s_hi=s_hi, tol=tol, safety_cap=safety_cap,
        )

    def optimize_one(y_b, r_b, m0_b, S0_b, A_b, Q_b, C_b, mask_b, s_log0,
                     x_b=None):
        def loss_fn(s_log):
            s = jnp.exp(jnp.clip(s_log, s_lo, s_hi))

            def member_nll(y, r, m0, S0, A, Q, C, x0=None):
                return _filter_nll(
                    y, m0, S0, A, s * Q, C, r, h_fn, sequential, x_init=x0
                )

            if x_b is None:
                nlls = vmap(member_nll)(y_b, r_b, m0_b, S0_b, A_b, Q_b, C_b)
            else:
                nlls = vmap(member_nll)(
                    y_b, r_b, m0_b, S0_b, A_b, Q_b, C_b, x_b
                )
            return jnp.sum(nlls * mask_b)

        # the parameter is a scalar, so forward-mode differentiation (one
        # jvp) beats reverse mode: ~2x one forward pass, no residual storage
        # for the backward sweep through the prefix scan. Iterates are
        # bitwise-identical to value_and_grad.
        def loss_and_grad(s_log):
            return jax.jvp(loss_fn, (s_log,), (jnp.ones_like(s_log),))
        opt = optax.adam(1.0)
        opt_state = opt.init(s_log0)

        def cond(carry):
            _, _, prev_loss, iters, done = carry
            return jnp.logical_and(~done, iters < safety_cap)

        def body(carry):
            s_log, opt_state, prev_loss, iters, _ = carry
            loss, grad = loss_and_grad(s_log)
            updates, opt_state = opt.update(grad * lr, opt_state)
            s_log = optax.apply_updates(s_log, updates)
            rel_tol = tol * jnp.abs(jnp.log(jnp.maximum(prev_loss, 1e-12)))
            stop = jnp.where(
                jnp.isfinite(prev_loss),
                jnp.abs(loss - prev_loss) < (rel_tol + 1e-6),
                False,
            )
            return (s_log, opt_state, loss, iters + 1, stop)

        s_log_f, _, last_loss, iters_f, _ = lax.while_loop(
            cond,
            body,
            (s_log0, opt_state, jnp.inf, jnp.array(0), jnp.array(False)),
        )
        return s_log_f, last_loss, iters_f

    if xB is None:
        return vmap(optimize_one)(
            yB, rB, m0B, S0B, AB, QB, CB, maskB, s_log_init
        )
    return vmap(optimize_one)(
        yB, rB, m0B, S0B, AB, QB, CB, maskB, s_log_init, xB
    )


def _joint_masked_adam(loss_vec, s_log_init, n_blocks, dtype,
                       lr, tol, safety_cap):
    """The joint masked-Adam ``while_loop`` shared by the linear and EKF
    block optimizers (and mirrored by the pupil sessions loop): per-lane
    Adam state, ``vmap(while_loop)``-equivalent masked carries, the
    reference stop rule (eks/core.py:513-549). Trace-identical to the two
    copies it replaced — same primitives in the same order."""

    def loss_and_grad(s_log):
        # per-block losses depend only on their own s, so the Jacobian is
        # diagonal and one jvp against the ones tangent IS the gradient
        return jax.jvp(loss_vec, (s_log,), (jnp.ones_like(s_log),))

    opt = optax.adam(1.0)
    opt_state0 = vmap(opt.init)(s_log_init)

    def cond(carry):
        _, _, _, iters, done = carry
        return jnp.any(jnp.logical_and(~done, iters < safety_cap))

    def body(carry):
        s_log, opt_state, prev_loss, iters, done = carry
        active = jnp.logical_and(~done, iters < safety_cap)
        loss, grad = loss_and_grad(s_log)
        updates, new_state = vmap(opt.update)(grad * lr, opt_state)
        s_new = optax.apply_updates(s_log, updates)
        rel_tol = tol * jnp.abs(jnp.log(jnp.maximum(prev_loss, 1e-12)))
        stop = jnp.where(
            jnp.isfinite(prev_loss),
            jnp.abs(loss - prev_loss) < (rel_tol + 1e-6),
            False,
        )

        def sel(new, old):
            return jnp.where(active, new, old)

        return (
            sel(s_new, s_log),
            jax.tree_util.tree_map(sel, new_state, opt_state),
            sel(loss, prev_loss),
            sel(iters + 1, iters),
            sel(stop, done),
        )

    init = (
        s_log_init,
        opt_state0,
        jnp.full((n_blocks,), jnp.inf, dtype=dtype),
        jnp.zeros((n_blocks,), dtype=jnp.int32),
        jnp.zeros((n_blocks,), dtype=bool),
    )
    s_log_f, _, last_loss, iters_f, _ = lax.while_loop(cond, body, init)
    return s_log_f, last_loss, iters_f


def _optimize_blocks_joint(
    yB, rB, m0B, S0B, AB, QB, CB, maskB, s_log_init,
    lr, s_lo, s_hi, tol, safety_cap,
):
    """Joint while-loop twin of the vmapped optimizer for the linear
    constant-diag-R case: every iteration evaluates ONE lane-batched plane
    NLL over all n_blocks*B_max member sequences
    (ops/pkalman.py:filter_nll_parallel_planes_batched), so the Pallas scan
    runs KB lanes per grid step instead of being serialized one lane per
    grid step by vmap's batching rule.

    Semantics are the batching rule's: bodies run for every lane each joint
    iteration, and a lane's carry (s, Adam state incl. per-lane count, loss,
    iteration count, done flag) only commits while that lane is active.
    The LOOP is bitwise-identical to ``vmap(optimize_one)`` (pinned by
    tests/test_core.py with an injected loss); shipped iterates differ from
    the vmapped twin at float level (~1e-5 rel) because the loss
    implementation differs too — plane NLL here, generic filter there.
    """
    n_blocks, b_max = yB.shape[:2]
    n_flat = n_blocks * b_max

    def flat(x):
        return x.reshape((n_flat,) + x.shape[2:])

    yF, rF, m0F, S0F, AF, CF = map(flat, (yB, rB, m0B, S0B, AB, CB))
    maskF = flat(maskB)

    def loss_vec(s_log):  # (n_blocks,) -> per-block masked member-NLL sums
        s = jnp.exp(jnp.clip(s_log, s_lo, s_hi))
        sQ = flat(s[:, None, None, None] * QB)
        lls = filter_nll_parallel_planes_batched(yF, m0F, S0F, AF, sQ, CF, rF)
        nll = jnp.where(jnp.isfinite(lls), -lls, 1e12)
        return jnp.sum((nll * maskF).reshape(n_blocks, b_max), axis=1)

    return _joint_masked_adam(
        loss_vec, s_log_init, n_blocks, yB.dtype, lr, tol, safety_cap
    )


def _optimize_blocks_ekf_joint(
    yB, rB, m0B, S0B, AB, QB, maskB, s_log_init, xB, h_fn,
    lr, s_lo, s_hi, tol, safety_cap,
):
    """Joint while-loop twin of the vmapped optimizer for the NONLINEAR
    (EKF) constant-diag-R case: every iteration evaluates ONE lane-batched
    plane EKF NLL (ops/pkalman.py:ekf_nll_parallel_planes_batched) over all
    n_blocks*B_max member sequences — the relinearized time-varying-C
    information-form table through a single lane-batched prefix scan per
    sweep — instead of vmap grid-serializing the AoS iterated EKF one lane
    per grid step. Loop semantics (per-lane Adam state, masked carries, stop
    rule) are identical to :func:`_optimize_blocks_joint`.

    With ``xB`` (the calibrated family's triangulated trajectories) each
    loss evaluation needs ``_EKF_OPT_SWEEPS_WARM + 1`` sweeps to sit at the
    sequential-EKF fixed point; without it, the broadcast-prior cold start
    uses ``_EKF_OPT_SWEEPS_COLD + 1`` (matching the AoS path's schedule).
    """
    n_blocks, b_max = yB.shape[:2]
    n_flat = n_blocks * b_max
    T = yB.shape[2]
    D = m0B.shape[-1]

    def flat(x):
        return x.reshape((n_flat,) + x.shape[2:])

    yF, rF, m0F, S0F, AF = map(flat, (yB, rB, m0B, S0B, AB))
    maskF = flat(maskB)
    if xB is None:
        xF = jnp.broadcast_to(m0F[:, None, :], (n_flat, T, D))
        n_sweeps = _EKF_OPT_SWEEPS_COLD + 1
    else:
        xF = flat(xB)
        n_sweeps = _EKF_OPT_SWEEPS_WARM + 1

    def loss_vec(s_log):  # (n_blocks,) -> per-block masked member-NLL sums
        s = jnp.exp(jnp.clip(s_log, s_lo, s_hi))
        sQ = flat(s[:, None, None, None] * QB)
        lls = ekf_nll_parallel_planes_batched(
            yF, m0F, S0F, AF, sQ, h_fn, rF, xF, n_sweeps=n_sweeps
        )
        nll = jnp.where(jnp.isfinite(lls), -lls, 1e12)
        return jnp.sum((nll * maskF).reshape(n_blocks, b_max), axis=1)

    return _joint_masked_adam(
        loss_vec, s_log_init, n_blocks, yB.dtype, lr, tol, safety_cap
    )


def optimize_smooth_param(
    ys: jnp.ndarray,  # (K, T, O)
    m0s: jnp.ndarray,  # (K, D)
    S0s: jnp.ndarray,  # (K, D, D)
    As: jnp.ndarray,  # (K, D, D)
    Cs: jnp.ndarray,  # (K, O, D)
    Qs: jnp.ndarray,  # (K, D, D)
    ensemble_vars: np.ndarray,  # (T, K, O)
    blocks: list | None,
    s_frames: list | None,
    s_guess_per_k: np.ndarray,  # (K,)
    lr: float = 0.25,
    s_bounds_log: tuple = (-8.0, 8.0),
    tol: float = 1e-2,
    safety_cap: int = 300,
    min_R_var: float = 1e-4,
    h_fn: Optional[Callable] = None,
    sequential: bool = False,
    x_init: Optional[jnp.ndarray] = None,  # (K, T, D) EKF linearization init
    mesh=None,
    partition: str = "keypoint",
    return_device: bool = False,
) -> np.ndarray:
    """Optimize ``s`` per block; returns per-keypoint ``s_finals`` (K,).

    With ``h_fn`` (nonlinear emissions), ``x_init`` supplies per-keypoint
    linearization trajectories (the calibrated family's triangulated 3-D
    points): the iterated-EKF loss then needs ``_EKF_OPT_SWEEPS_WARM``
    relinearization sweeps per evaluation instead of the broadcast-prior
    cold start's ``_EKF_OPT_SWEEPS_COLD`` — same fixed point (the sequential
    EKF, the loss the reference optimizes through dynamax at
    eks/core.py:469), ~4x fewer sweeps.

    With ``return_device=True`` (and no mesh) the result stays a device
    array so the caller can enqueue downstream work before paying the pull.

    With ``mesh`` (a 1-D jax.sharding.Mesh), either the block axis
    (``partition="keypoint"``, shard_map) or the time axis
    (``partition="time"``, SPMD-partitioned prefix scans) is sharded over
    the mesh devices — every other step is unchanged. ``ensemble_vars`` is
    always (T, K, O); when it arrives as a device array (and no ``s_frames``
    cropping is requested) the constant-R reduction runs on device with no
    host pull."""
    K = ys.shape[0]
    h_fn = _as_traceable_emission(h_fn)
    if not blocks:
        blocks = [[k] for k in range(K)]
    else:
        # a PARTIAL block list must not leave keypoints unoptimized: the
        # reference leaves their s as uninitialized np.empty memory
        # (eks/core.py:239 with a partial list — undefined behavior, no
        # golden covers it); here every unlisted keypoint becomes its own
        # singleton block, matching the sessions-merge semantics
        # (models/singlecam.py merged_blocks)
        listed = {k for b in blocks for k in b}
        blocks = list(blocks) + [[k] for k in range(K) if k not in listed]
    logger.debug(f"keypoint block structure for shared s: {blocks}")

    on_device = isinstance(ensemble_vars, jnp.ndarray) and not s_frames and mesh is None
    if on_device:
        # device-resident prep: median over time of the floored variances,
        # never pulling the (T, K, O) block to host
        y_cropped = ys
        r_const = _device_constant_r(
            jnp.swapaxes(ensemble_vars, 0, 1), float(min_R_var)
        )
    else:
        # per-step variances with the R floor applied (eks/utils.py:373)
        vars_np = np.clip(
            np.swapaxes(np.asarray(ensemble_vars), 0, 1), 1e-12, None
        )
        if s_frames:
            # host-side cropping path. IMPORTANT: pass ys as a HOST array when
            # using s_frames — device->host pulls over a remote-attached TPU
            # are catastrophically slow (minutes-scale stalls observed).
            ys_np = np.asarray(ys)
            y_cropped, r_const = [], []
            for k in range(K):
                y_cropped.append(crop_frames(ys_np[k], s_frames))
                r_const.append(
                    _constant_r_from_vars(
                        crop_frames(vars_np[k], s_frames), min_var=min_R_var
                    )
                )
            y_cropped = np.stack(y_cropped)  # (K, T', O)
            r_const = np.stack(r_const)  # (K, O)
            if x_init is not None:
                # the linearization trajectory shares the loss time axis
                x_np = np.asarray(x_init)
                x_init = np.stack(
                    [crop_frames(x_np[k], s_frames) for k in range(K)]
                )
        else:
            y_cropped = ys
            r_const = np.clip(
                np.nanmedian(vars_np, axis=1), min_R_var, np.inf
            )  # (K, O)

    # pad blocks to a rectangle; padding lanes reuse member 0 with zero mask
    b_max = max(len(b) for b in blocks)
    n_blocks = len(blocks)
    # f64 host-side; jnp canonicalization downcasts to f32 unless the caller
    # runs under enable_x64 (then the whole program, Adam state included,
    # stays f64 — dtype-homogeneous either way)
    idx = np.zeros((n_blocks, b_max), dtype=int)
    mask = np.zeros((n_blocks, b_max), dtype=np.float64)
    for i, b in enumerate(blocks):
        idx[i, : len(b)] = b
        idx[i, len(b):] = b[0]
        mask[i, : len(b)] = 1.0

    if isinstance(s_guess_per_k, jnp.ndarray) and mesh is None:
        # guesses never left the device: fold them into log-s inits there too
        # (a host pull of even (K,) floats blocks on the whole prep chain —
        # one tunnel round-trip, ~0.5s on the remote-attached chip)
        gB = s_guess_per_k[jnp.asarray(idx)]  # (n_blocks, B_max)
        mB = jnp.asarray(mask, dtype=gB.dtype)
        s0 = jnp.sum(gB * mB, axis=1) / jnp.sum(mB, axis=1)
        s_log_init = jnp.log(jnp.clip(s0, 1e-6, 1e3))
    else:
        s_guess_np = np.asarray(s_guess_per_k)
        s_log_init = np.zeros(n_blocks, dtype=np.float64)
        for i, b in enumerate(blocks):
            s0 = float(np.mean([s_guess_np[k] for k in b]))
            s_log_init[i] = np.log(np.clip(s0, 1e-6, 1e3))

    # gather block members; device arrays are gathered on device (no pull).
    # With a mesh the gather stays host-side: the upload happens once, sharded
    # straight onto the mesh devices (never through the default backend).
    def gather(a):
        if mesh is not None:
            return np.asarray(a)[idx]
        if isinstance(a, jnp.ndarray):
            return a[jnp.asarray(idx)]
        return jnp.asarray(np.asarray(a)[idx])

    operands = [
        gather(y_cropped), gather(r_const), gather(m0s), gather(S0s),
        gather(As), gather(Qs), gather(Cs), mask, s_log_init,
        gather(x_init) if x_init is not None else None,
    ]
    if mesh is not None and partition == "time":
        from eks_tpu.parallel.mesh import shard_time

        # yB is (n_blocks, B_max, T', O): time axis 2; everything else is
        # small and replicated — except the (n_blocks, B_max, T', D)
        # linearization trajectories, which share the time axis
        x_op = operands.pop()
        operands = shard_time(
            mesh, operands, [2] + [None] * 8, axis_name=mesh.axis_names[0]
        )
        if x_op is not None:
            x_op = shard_time(
                mesh, [x_op], [2], axis_name=mesh.axis_names[0]
            )[0]
        operands.append(x_op)
    elif mesh is not None:
        from eks_tpu.parallel.mesh import pad_and_shard_leading

        x_op = operands.pop()
        operands, _ = pad_and_shard_leading(mesh, operands)
        if x_op is not None:
            x_op = pad_and_shard_leading(mesh, [x_op])[0][0]
        operands.append(x_op)
    else:
        operands[-3:-1] = [jnp.asarray(mask), jnp.asarray(s_log_init)]

    s_lo, s_hi = s_bounds_log
    statics = dict(
        h_fn=h_fn,
        sequential=sequential,
        lr=float(lr),
        s_lo=float(s_lo),
        s_hi=float(s_hi),
        tol=float(tol),
        safety_cap=int(safety_cap),
        joint=bool(
            _plane_opt_enabled(mesh) and h_fn is None and not sequential
        ),
        plane_ekf=bool(
            _plane_opt_enabled(mesh) and h_fn is not None and not sequential
        ),
    )
    if mesh is not None and partition == "keypoint":
        from eks_tpu.parallel.mesh import optimize_blocks_sharded

        s_log_f, last_loss, iters = optimize_blocks_sharded(mesh, operands, **statics)
    else:
        # single device, or time partitioning (sharded operands drive the
        # SPMD partitioner through the same jitted program)
        s_log_f, last_loss, iters = _optimize_blocks(*operands, **statics)

    from eks_tpu.utils import profiling as _prof

    if _prof.RECORD_OPT_STATS:
        _prof.LAST_OPT_STATS["joint_iters"] = int(np.max(np.asarray(iters)))
        _prof.LAST_OPT_STATS["n_blocks"] = n_blocks

    if logger.isEnabledFor(logging.DEBUG):
        s_log_host = np.asarray(s_log_f)[:n_blocks]
        ll_host, it_host = np.asarray(last_loss), np.asarray(iters)
        for i, b in enumerate(blocks):
            logger.debug(
                f"s-opt block {list(b)}: converged to "
                f"s={float(np.exp(np.clip(s_log_host[i], s_lo, s_hi))):.6g} "
                f"after {int(it_host[i])} iters (NLL {float(ll_host[i]):.6f})"
            )

    if return_device and mesh is None:
        # keep s on device: the caller enqueues the final smoother against
        # it and pulls AFTER, so the smoother queues behind the optimizer
        # instead of idling through a host round-trip for a (K,) array
        block_of_k = np.empty(K, dtype=np.int32)
        for i, b in enumerate(blocks):
            for k in b:
                block_of_k[k] = i
        s_star = jnp.exp(jnp.clip(s_log_f[:n_blocks], s_lo, s_hi))
        return s_star[jnp.asarray(block_of_k)]

    s_log_host = np.asarray(s_log_f)[:n_blocks]
    s_finals = np.empty(K, dtype=float)
    for i, b in enumerate(blocks):
        s_star = float(np.exp(np.clip(s_log_host[i], s_lo, s_hi)))
        for k in b:
            s_finals[k] = s_star
    return s_finals


# --------------------------------------------------------------------------- #
# final smoothing pass
# --------------------------------------------------------------------------- #
@partial(jax.jit, static_argnames=("sequential",))
@highest_precision
def _smooth_all(ys, m0s, S0s, As, Qs, Cs, s_finals, rs, h_fn=None, sequential=False):
    def smooth_one(y, m0, S0, A, Q, C, s, r):
        if sequential:
            res = kalman_smoother(y, m0, S0, A, s * Q, C=C, r_diag=r, h_fn=h_fn)
        elif h_fn is not None:
            res = eks_parallel(y, m0, S0, A, s * Q, h_fn, r)
        else:
            res = kalman_smoother_parallel(y, m0, S0, A, s * Q, C, r)
        return res.smoothed_means, res.smoothed_covs

    return vmap(smooth_one)(ys, m0s, S0s, As, Qs, Cs, s_finals, rs)


def run_kalman_smoother(
    ys: jnp.ndarray,  # (K, T, O)
    m0s: jnp.ndarray,  # (K, D)
    S0s: jnp.ndarray,  # (K, D, D)
    As: jnp.ndarray,  # (K, D, D)
    Cs: jnp.ndarray,  # (K, O, D)
    Qs: jnp.ndarray,  # (K, D, D)
    ensemble_vars: np.ndarray,  # (T, K, O)
    s_frames: list | None = None,
    smooth_param: float | list | None = None,
    blocks: list | None = None,
    lr: float = 0.25,
    s_bounds_log: tuple = (-8.0, 8.0),
    tol: float = 1e-2,
    safety_cap: int = 300,
    h_fn: Optional[Callable] = None,
    sequential: bool = False,
    x_init: Optional[jnp.ndarray] = None,  # (K, T, D) EKF linearization init
    devices: int | None = None,
    partition: Literal["keypoint", "time"] = "keypoint",
) -> tuple[np.ndarray, jnp.ndarray, jnp.ndarray]:
    """Tune ``s`` (unless given) and run the final smoother for K keypoints.

    Linear model per keypoint unless ``h_fn`` is supplied:
        ``x_{t+1} = A x_t + w_t``, ``y_t = C x_t + v_t``,
        ``w ~ N(0, s Q)``, ``v_t ~ N(0, diag(ensemble_vars[t]))``.

    ``devices`` > 1 shards over a 1-D device mesh; ``partition`` picks the
    axis: ``"keypoint"`` (data parallelism over independent lanes, the
    default — right whenever K >= devices) or ``"time"`` (sequence
    parallelism: the parallel-prefix scans split the frame axis, with XLA
    collectives carrying the cross-chunk combines — for sessions too long
    for one chip's HBM, or K < devices). The reference has no multi-device
    story at all — SURVEY.md §2.3.

    Returns:
        s_finals (K,) host array; smoothed means (K, T, D) and covs
        (K, T, D, D) as device-resident arrays — callers pull once, as late
        as possible (transfers dominate on remote-attached accelerators).
    """
    K, T, _ = ys.shape
    h_fn = _as_traceable_emission(h_fn)

    if partition not in ("keypoint", "time"):
        raise ValueError(f"unknown partition {partition!r}: use 'keypoint' or 'time'")

    mesh = None
    if devices is not None and devices > 1:
        from eks_tpu.parallel.mesh import make_mesh

        if partition == "time":
            from eks_tpu.parallel.mesh import mesh_dispatch

            mesh = make_mesh(devices, axis_name="t")
            logger.info(f"time-axis sequence parallelism over {devices} devices")
            ys, m0s, S0s, As, Cs, Qs, ensemble_vars, x_init = jax.device_get(
                (ys, m0s, S0s, As, Cs, Qs, ensemble_vars, x_init)
            )
            # pallas=False: a fused single-device kernel cannot span the
            # sharded scan axis; the XLA associative scan partitions with
            # collectives instead. mesh_dispatch also pins the scan-element
            # layout to the mesh platform.
            with mesh_dispatch(mesh, pallas=False):
                return _run_kalman_smoother_impl(
                    ys, m0s, S0s, As, Cs, Qs, ensemble_vars, s_frames,
                    smooth_param, blocks, lr, s_bounds_log, tol, safety_cap,
                    h_fn, sequential, mesh, partition, x_init=x_init,
                )

        mesh = make_mesh(devices)
        logger.info(f"keypoint-axis data parallelism over {devices} devices")
        # operands must re-shard onto the mesh devices; pull any
        # default-device arrays to host ONCE here so the two stages below
        # do not each trigger their own D2H round-trip
        ys, m0s, S0s, As, Cs, Qs, ensemble_vars, x_init = jax.device_get(
            (ys, m0s, S0s, As, Cs, Qs, ensemble_vars, x_init)
        )
        # the batched programs run under shard_map on the mesh devices, so
        # each device executes the fused Pallas kernels on its local lanes —
        # no SPMD partitioning of the pallas_call is needed. Kernel dispatch
        # and scan layout must follow the MESH platform, not the ambient
        # default backend (one real TPU chip may coexist with a CPU test
        # mesh); mesh_dispatch applies that rule, with any explicit force_*
        # context in scope winning.
        from eks_tpu.parallel.mesh import mesh_dispatch

        with mesh_dispatch(mesh):
            return _run_kalman_smoother_impl(
                ys, m0s, S0s, As, Cs, Qs, ensemble_vars, s_frames,
                smooth_param, blocks, lr, s_bounds_log, tol, safety_cap,
                h_fn, sequential, mesh, partition, x_init=x_init,
            )
    return _run_kalman_smoother_impl(
        ys, m0s, S0s, As, Cs, Qs, ensemble_vars, s_frames, smooth_param,
        blocks, lr, s_bounds_log, tol, safety_cap, h_fn, sequential, mesh,
        partition, x_init=x_init,
    )


def _run_kalman_smoother_impl(
    ys, m0s, S0s, As, Cs, Qs, ensemble_vars, s_frames, smooth_param, blocks,
    lr, s_bounds_log, tol, safety_cap, h_fn, sequential, mesh,
    partition="keypoint", x_init=None,
):
    K, T, _ = ys.shape

    on_device = isinstance(ensemble_vars, jnp.ndarray)
    if on_device:
        if ensemble_vars.shape[0] < 2:
            # keep the host path's error contract (compute_initial_guesses)
            raise ValueError(
                "Initial-s heuristic needs at least two frames of ensemble variance."
            )
        # device prep: the guesses STAY on device — pulling even a (K,) array
        # here costs a full tunnel round-trip that also blocks on the prep
        # kernel chain (measured ~0.5s of a 1.7s pipeline on the remote chip)
        ev = ensemble_vars  # (T, K, O), device
        g = _device_s_guesses(ev)
        s_guess = jnp.where(jnp.isfinite(g) & (g > 0.0), g, 2.0)
    else:
        # initial s guesses per keypoint (host; cheap)
        ev = np.asarray(ensemble_vars)
        s_guess = np.empty(K, dtype=float)
        for k in range(K):
            g = float(compute_initial_guesses(ev[:, k, :]) or 2.0)
            s_guess[k] = g if (np.isfinite(g) and g > 0.0) else 2.0

    if smooth_param is not None:
        s_finals = np.empty(K, dtype=float)
        if isinstance(smooth_param, (int, float)):
            s_finals[:] = float(smooth_param)
        else:
            s_finals[:] = np.asarray(smooth_param, dtype=float)
    else:
        _t0 = time.perf_counter()
        s_finals = optimize_smooth_param(
            ys=ys,
            m0s=m0s,
            S0s=S0s,
            As=As,
            Cs=Cs,
            Qs=Qs,
            ensemble_vars=ev,
            blocks=blocks,
            s_frames=s_frames,
            s_guess_per_k=s_guess,
            lr=lr,
            s_bounds_log=s_bounds_log,
            tol=tol,
            safety_cap=safety_cap,
            h_fn=h_fn,
            sequential=sequential,
            x_init=x_init,
            mesh=mesh,
            partition=partition,
            return_device=(mesh is None),
        )
        logger.debug(
            f"[timing]   optimize_smooth_param: {time.perf_counter() - _t0:.3f}s"
        )

    _t0 = time.perf_counter()
    # time-varying diagonal R from ensemble variances, floored at 1e-12
    if on_device:
        rs = jnp.clip(jnp.swapaxes(ev, 0, 1), 1e-12, None)  # (K, T, O)
    else:
        rs = np.clip(np.swapaxes(ev, 0, 1), 1e-12, None)
    operands = [ys, m0s, S0s, As, Qs, Cs, s_finals, rs]
    if mesh is not None and partition == "time":
        from eks_tpu.parallel.mesh import shard_time

        # ys and rs are (K, T, O): time axis 1; the SPMD partitioner inserts
        # the cross-chunk collectives into the prefix scans
        operands = shard_time(
            mesh, operands,
            [1, None, None, None, None, None, None, 1],
            axis_name=mesh.axis_names[0],
        )
        operands[-2] = operands[-2].astype(operands[-1].dtype)
        ms, Vs = _smooth_all(*operands, h_fn=h_fn, sequential=sequential)
    elif mesh is not None:
        # host -> mesh devices directly; never through the default backend
        from eks_tpu.parallel.mesh import pad_and_shard_leading, smooth_all_sharded

        operands, _ = pad_and_shard_leading(mesh, operands)
        dt = operands[-1].dtype
        operands[-2] = operands[-2].astype(dt)
        ms, Vs = smooth_all_sharded(
            mesh, operands, h_fn=h_fn, sequential=sequential
        )
    else:
        rs = jnp.asarray(rs)
        operands = [jnp.asarray(a) for a in operands[:6]] + [
            jnp.asarray(s_finals).astype(rs.dtype), rs,
        ]
        ms, Vs = _smooth_all(*operands, h_fn=h_fn, sequential=sequential)
    logger.debug(
        f"[timing]   final smoother pass ({K} keypoints): "
        f"{time.perf_counter() - _t0:.3f}s"
    )
    if isinstance(s_finals, jnp.ndarray):
        # pull AFTER the smoother is enqueued: the (K,) download waits for
        # the optimizer (which the smoother needs anyway) while the smoother
        # runs behind it — no device idle time for the round-trip
        s_finals = np.asarray(jax.device_get(s_finals), dtype=float)
    # results stay device-resident; callers decide when to pull (transfers
    # over a remote-attached chip dominate, so the pull should be one batched
    # download as late as possible)
    return s_finals, ms[:K], Vs[:K]
