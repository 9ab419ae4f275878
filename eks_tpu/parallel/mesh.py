"""Multi-chip scaling: keypoint-axis and time-axis sharding over a device mesh.

Every keypoint's filter/optimizer lane is independent (the reference is
single-device and batches with vmap only — SURVEY.md §2.3), so the natural
multi-chip extension is sharding the (keypoints | blocks) leading axis over a
1-D ``Mesh``. The batched programs are mapped per-device with ``jax.shard_map``
(zero cross-device communication in the steady state): each device runs the
fused Pallas kernels on its local lanes, and each device's optimizer loop
stops when its own lanes converge. Uneven keypoint counts are padded by
replicating lane 0 (results of padding lanes are discarded).

Time-axis (sequence-parallel) sharding is the second axis of scale, for
sessions too long for one chip's HBM or K < n_devices: there the inputs are
device-put with the frame axis sharded and the SPMD partitioner inserts the
cross-chunk collectives into the ``lax.associative_scan`` prefix combines
(``run_kalman_smoother(..., partition="time")`` is the product entry).
The keypoint axis is preferred while K >= n_devices, which holds for every
bundled workload.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eks_tpu.core import _optimize_blocks, _smooth_all
from eks_tpu.core import _plane_opt_enabled as _core_plane_opt_enabled

__all__ = [
    "make_mesh",
    "shard_leading",
    "pad_and_shard_leading",
    "optimize_blocks_sharded",
    "smooth_all_sharded",
    "optimize_and_smooth_sharded",
    "smooth_time_sharded",
]


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "kp") -> Mesh:
    """1-D device mesh over the keypoint/block axis.

    If the default platform has fewer devices than requested (e.g. one real
    TPU chip while a virtual multi-device CPU platform is also present),
    falls back to the CPU backend's devices.
    """
    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        try:
            cpu_devices = jax.devices("cpu")
            if len(cpu_devices) >= n_devices:
                devices = cpu_devices
        except RuntimeError:
            pass
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def _pad_leading(x: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Pad axis 0 to a multiple by replicating the first element."""
    n = x.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return x, n
    pad = np.broadcast_to(x[:1], (target - n, *x.shape[1:]))
    return np.concatenate([x, pad], axis=0), n


def shard_leading(mesh: Mesh, x, axis_name: str = "kp"):
    """Device-put an array sharded on its leading axis (must be padded).

    The host array goes straight to the mesh's devices: converting through
    ``jnp.asarray`` first would commit it to the *default* backend (possibly
    a different platform than the mesh) before re-sharding.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(np.asarray(x), sharding)


def pad_and_shard_leading(
    mesh: Mesh, operands: list, axis_name: str = "kp"
) -> tuple[list, int]:
    """Pad every operand's leading (batch) axis to a multiple of the mesh
    size — replicating element 0, whose results callers slice away — and
    device-put each one sharded over the mesh. This is the bridge
    ``run_kalman_smoother(devices=N)`` uses to turn its vmapped programs into
    SPMD programs without touching the kernels.

    Returns (sharded operands, original leading length).
    """
    n_dev = int(np.prod(mesh.devices.shape))
    n_real = int(operands[0].shape[0])
    out = []
    for x in operands:
        x_np = np.asarray(x)
        x_pad, _ = _pad_leading(x_np, n_dev)
        out.append(shard_leading(mesh, x_pad, axis_name))
    return out, n_real


def _replicate(mesh: Mesh, x):
    """Device-put a host array replicated over the mesh (never touches the
    default backend)."""
    return jax.device_put(np.asarray(x), NamedSharding(mesh, P()))


# --------------------------------------------------------------------------- #
# shard_map wrappers: run the batched programs per-device on the local shard
# --------------------------------------------------------------------------- #
# Mapping the program manually (rather than letting the SPMD partitioner split
# the sharded-input jit) buys two things on the keypoint axis:
#   * ``pallas_call`` needs no partitioning rule — each device runs the fused
#     kernel on its local lanes, so the TPU fast path stays on under a mesh;
#   * each device's optimizer ``while_loop`` stops when ITS lanes converge,
#     instead of every device stepping until the globally-slowest lane is done
#     (the partitioned while's condition is an every-iteration all-reduce).
@functools.lru_cache(maxsize=None)
def _shmap_optimize(mesh: Mesh, axis_name: str, statics: tuple):
    kw = dict(statics)
    spec = P(axis_name)

    def fn(*operands):
        return _optimize_blocks(*operands, **kw)

    # check_vma off: the per-lane while_loop carries start from scalar
    # literals (unvarying) and become kp-varying after one step, which the
    # varying-axis checker rejects; there are no collectives in the body,
    # so every output is trivially varying along kp.
    return jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False)
    )


@functools.lru_cache(maxsize=None)
def _shmap_smooth(mesh: Mesh, axis_name: str, statics: tuple):
    kw = dict(statics)
    spec = P(axis_name)

    def fn(*operands):
        return _smooth_all(*operands, **kw)

    return jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False)
    )


def shard_time(
    mesh: Mesh, operands: list, time_axes: list, axis_name: str = "t"
) -> list:
    """Device-put operands with their time axis sharded over the mesh
    (sequence parallelism). ``time_axes[i]`` is the axis index of operand i's
    time dimension, or None to replicate. A time dimension that does not
    divide the mesh size is replicated instead (correct, just unsharded).

    Unlike the keypoint path this does NOT shard_map: the parallel-prefix
    combine must cross device boundaries, which the SPMD partitioner handles
    by inserting collectives into the ``lax.associative_scan`` lowering.
    """
    n_dev = int(np.prod(mesh.devices.shape))
    out = []
    for x, ax in zip(operands, time_axes):
        x_np = np.asarray(x)
        if ax is not None and x_np.shape[ax] % n_dev == 0:
            spec = P(*([None] * ax), axis_name)
        else:
            spec = P()
        out.append(jax.device_put(x_np, NamedSharding(mesh, spec)))
    return out


def optimize_blocks_sharded(mesh: Mesh, operands: list, axis_name: str = "kp", **statics):
    """``core._optimize_blocks`` over mesh-sharded operands (leading axis must
    already be padded to the mesh size and device-put with ``P(axis_name)``)."""
    return _shmap_optimize(mesh, axis_name, tuple(sorted(statics.items())))(*operands)


def smooth_all_sharded(mesh: Mesh, operands: list, axis_name: str = "kp", **statics):
    """``core._smooth_all`` over mesh-sharded operands (same contract)."""
    return _shmap_smooth(mesh, axis_name, tuple(sorted(statics.items())))(*operands)


def optimize_and_smooth_sharded(
    ys: np.ndarray,  # (K, T, O)
    m0s: np.ndarray,  # (K, D)
    S0s: np.ndarray,  # (K, D, D)
    As: np.ndarray,  # (K, D, D)
    Qs: np.ndarray,  # (K, D, D)
    Cs: np.ndarray,  # (K, O, D)
    ensemble_vars: np.ndarray,  # (K, T, O) per-step variances
    mesh: Mesh,
    s_log_init: np.ndarray | None = None,  # (K,)
    lr: float = 0.25,
    tol: float = 1e-2,
    safety_cap: int = 300,
    min_R_var: float = 1e-4,
    axis_name: str = "kp",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The full smoothing step — per-keypoint s optimization followed by the
    final smoothing pass — with every keypoint-batched input sharded over the
    mesh. Singleton blocks only (one s per keypoint).

    Returns host arrays (s_finals (K,), ms (K, T, D), Vs (K, T, D, D)).
    """
    with mesh_dispatch(mesh):
        return _optimize_and_smooth_sharded_impl(
            ys, m0s, S0s, As, Qs, Cs, ensemble_vars, mesh, s_log_init,
            lr, tol, safety_cap, min_R_var, axis_name,
        )


def _optimize_and_smooth_sharded_impl(
    ys, m0s, S0s, As, Qs, Cs, ensemble_vars, mesh, s_log_init,
    lr, tol, safety_cap, min_R_var, axis_name,
):
    K = ys.shape[0]

    vars_clipped = np.clip(np.asarray(ensemble_vars), 1e-12, None)
    # nanmedian, matching the core path's constant-R twin (core.py
    # _constant_r_from_vars): np.clip propagates NaN, and a plain median
    # would poison the whole loss into the 1e12 penalty
    r_const = np.clip(np.nanmedian(vars_clipped, axis=1), min_R_var, np.inf)  # (K, O)
    if s_log_init is None:
        s_log_init = np.zeros(K, dtype=np.float32)

    # pad the keypoint axis to the mesh size and shard every batched operand
    names = ["ys", "r_const", "m0s", "S0s", "As", "Qs", "Cs", "s_log_init", "rs"]
    sharded, _ = pad_and_shard_leading(
        mesh,
        [
            np.asarray(ys), r_const, np.asarray(m0s), np.asarray(S0s),
            np.asarray(As), np.asarray(Qs), np.asarray(Cs),
            np.asarray(s_log_init, dtype=np.float32), vars_clipped,
        ],
        axis_name,
    )
    padded = dict(zip(names, sharded))

    Kp = padded["ys"].shape[0]
    mask = shard_leading(mesh, np.ones((Kp, 1), dtype=np.float32), axis_name)

    # optimizer over singleton blocks: add the member axis (B_max = 1)
    add_member = lambda x: x[:, None]
    s_log_f, last_loss, iters = optimize_blocks_sharded(
        mesh,
        [
            add_member(padded["ys"]),
            add_member(padded["r_const"]),
            add_member(padded["m0s"]),
            add_member(padded["S0s"]),
            add_member(padded["As"]),
            add_member(padded["Qs"]),
            add_member(padded["Cs"]),
            mask,
            padded["s_log_init"],
        ],
        axis_name,
        lr=float(lr),
        tol=float(tol),
        safety_cap=int(safety_cap),
        joint=_core_plane_opt_enabled(mesh),
    )
    s_finals = jnp.exp(jnp.clip(s_log_f, -8.0, 8.0))

    ms, Vs = smooth_all_sharded(
        mesh,
        [
            padded["ys"],
            padded["m0s"],
            padded["S0s"],
            padded["As"],
            padded["Qs"],
            padded["Cs"],
            s_finals.astype(padded["ys"].dtype),
            padded["rs"],
        ],
        axis_name,
    )
    return (
        np.asarray(s_finals)[:K],
        np.asarray(ms)[:K],
        np.asarray(Vs)[:K],
    )


@contextlib.contextmanager
def mesh_dispatch(mesh: Mesh, pallas: bool | None = None):
    """Pin kernel dispatch (Pallas) and scan-element layout (SoA) to the
    MESH platform for the enclosed mesh-run. The ambient default backend is
    the wrong signal: a CPU test mesh can coexist with a TPU-ambient
    process, where auto dispatch would hand XLA:CPU the Pallas lowering or
    the unrolled scalar-plane graph (minutes of LLVM compile). An explicit
    ``force_pallas_scan``/``force_soa_scan`` already in scope wins;
    ``pallas=False`` hard-disables Pallas (the time-sharded path, where a
    fused single-device kernel cannot span the sharded scan axis)."""
    from eks_tpu.ops import pallas_filter as _pf
    from eks_tpu.ops import pkalman as _pk

    mesh_is_tpu = mesh.devices.flat[0].platform == "tpu"
    pl = pallas
    if pl is None:
        pl = _pf._FORCE_PALLAS
        if pl is None and not mesh_is_tpu:
            pl = False
    soa = _pk._FORCE_SOA
    if soa is None:
        soa = mesh_is_tpu
    with _pf.force_pallas_scan(pl), _pk.force_soa_scan(soa):
        yield


def smooth_time_sharded(
    ys: np.ndarray,  # (T, O)
    m0: np.ndarray,
    S0: np.ndarray,
    A: np.ndarray,
    Q: np.ndarray,
    C: np.ndarray,
    r_diag: np.ndarray,  # (T, O)
    mesh: Mesh,
    axis_name: str = "kp",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sequence-parallel smoothing: ONE keypoint's time axis sharded over the
    mesh (SURVEY.md §2.3 — the context-parallelism analogue for this
    workload, for sessions too long for a single chip's HBM or when
    K < n_devices). The parallel-prefix combine maps onto XLA collectives
    under the SPMD partitioner; results match the unsharded smoother.

    Returns host arrays (log_likelihood, smoothed means (T, D), covs
    (T, D, D)). T must be divisible by the mesh size.
    """
    from eks_tpu.ops.pkalman import kalman_smoother_parallel

    n_dev = int(np.prod(mesh.devices.shape))
    T = ys.shape[0]
    if T % n_dev != 0:
        raise ValueError(f"T={T} must be divisible by the mesh size {n_dev}")

    sharding = NamedSharding(mesh, P(axis_name))
    ys_s = jax.device_put(np.asarray(ys), sharding)
    r_s = jax.device_put(np.clip(np.asarray(r_diag), 1e-12, None), sharding)

    with mesh_dispatch(mesh, pallas=False):
        res = _smooth_time_jit(
            ys_s, _replicate(mesh, m0), _replicate(mesh, S0),
            _replicate(mesh, A), _replicate(mesh, Q), _replicate(mesh, C),
            r_s, soa=_pk_soa_state(),
        )
    return (
        np.asarray(res.log_likelihood),
        np.asarray(res.smoothed_means),
        np.asarray(res.smoothed_covs),
    )


def _pk_soa_state() -> bool:
    """The currently forced SoA state, as a jit-key-able static."""
    from eks_tpu.ops import pkalman as _pk

    return bool(_pk._FORCE_SOA)


@functools.partial(jax.jit, static_argnames=("soa",))
def _smooth_time_jit(ys, m0, S0, A, Q, C, r, soa: bool = False):
    # `soa` only keys the jit cache: dispatch reads the force-context
    # globals at trace time, so two traces under different scopes must not
    # share a cache entry
    from eks_tpu.ops.pkalman import kalman_smoother_parallel

    return kalman_smoother_parallel(ys, m0, S0, A, Q, C, r)
