"""Benchmark: smoothed frames/sec/chip across the model families.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "families": {...}}

The headline metric is the singlecam flagship (10k frames x 20 keypoints x
5 seeds, ensemble + Adam s-optimization + smoothing); "families" adds
multicam-linear, ibl-pupil, and ibl-paw-style throughput on the same frame
count for regression tracking.

The reference publishes no numbers (BASELINE.md), so the denominator is a
measured re-creation of the reference's own hot loop (dynamax is not
installed here): `_reference_equivalent_pipeline` reproduces
`/root/reference/eks/core.py:560-699` — a jit(vmap) of an Adam(1.0)
while_loop whose loss is REVERSE-mode `value_and_grad` through a sequential
per-step EKF with full (O, O) innovation covariances and `cho_solve` per
step (dynamax's `extended_kalman_filter` semantics, AoS layout), followed by
the sequential RTS smoother with time-varying full R. It runs on the CPU
backend to the optimizer's natural convergence — the same iterates and stop
rule as the accelerator run, no extrapolation. (Earlier rounds reused this
framework's own optimized SoA/jvp core with sequential scans as the
denominator and extrapolated the optimizer to the 300-iteration safety cap —
the former undercounts the reference's per-step LAPACK cost, the latter
overstates iterations ~3.5x; both replaced by the faithful measure on
2026-08-17.) The CPU baseline is cached in .bench_baseline.json keyed by
workload shape AND a hash of bench.py — it re-measures when the measured
code changes instead of trusting a stale number.
"""

import json
import os
import time

import numpy as np

# persistent compilation cache: first-compile on this platform is minutes;
# cache it across bench invocations
import jax as _jax

_REPO = os.path.dirname(os.path.abspath(__file__))
_jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T, K, SEEDS = 10_000, 20, 5
SAFETY_CAP = 300
CACHE = os.path.join(_REPO, ".bench_baseline.json")


def _baseline_code_hash() -> str:
    """Hash of the sources the CPU-baseline run actually executes (the
    dynamax-equivalent path lives in this file; prep comes from the package).
    The baseline re-measures when any of these change; unrelated commits
    reuse the cached number."""
    import hashlib

    files = [
        "eks_tpu/core.py", "eks_tpu/models/singlecam.py",
        "eks_tpu/utils/frames.py", "bench.py",
    ]
    h = hashlib.sha256()
    for f in files:
        with open(os.path.join(_REPO, f), "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:16]


# --------------------------------------------------------------------------- #
# reference-equivalent CPU pipeline (dynamax semantics, see module docstring)
# --------------------------------------------------------------------------- #
def _make_ref_programs():
    """Jitted twins of the reference's fast path
    (/root/reference/eks/core.py:560-699 + dynamax EKF/RTS internals):
    sequential per-step scans, full (O, O) innovation covariances solved with
    cho_solve each step, REVERSE-mode value_and_grad, Adam(1.0) on lr-scaled
    grads with the reference's stop rule. The iteration cap is traced so
    different caps share one compilation."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax, value_and_grad, vmap
    from jax.scipy.linalg import cho_factor, cho_solve

    LOG2PI = float(np.log(2.0 * np.pi))

    def ekf_nll(y, m0, S0, A, Q, C, R):  # R (O, O) constant
        O = y.shape[-1]

        def step(carry, y_t):
            m, P, ll = carry
            mp = A @ m
            Pp = A @ P @ A.T + Q
            S = C @ Pp @ C.T + R
            cf = cho_factor(S, lower=True)
            innov = y_t - C @ mp
            Kt = cho_solve(cf, C @ Pp)  # (O, D)
            m_new = mp + Kt.T @ innov
            P_new = Pp - Kt.T @ (C @ Pp)
            logdet = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(cf[0]))))
            ll_t = -0.5 * (innov @ cho_solve(cf, innov) + logdet + O * LOG2PI)
            return (m_new, P_new, ll + ll_t), None

        (_, _, ll), _ = lax.scan(step, (m0, S0, jnp.asarray(0.0, y.dtype)), y)
        nll = -ll
        return jnp.where(jnp.isfinite(nll), nll, 1e12)

    @jax.jit
    def optimize_all(yK, RK, m0K, S0K, AK, QK, CK, s_log0K, cap):
        def optimize_one(y, R, m0, S0, A, Q, C, s_log0):
            def loss(s_log):
                s = jnp.exp(jnp.clip(s_log, -8.0, 8.0))
                return ekf_nll(y, m0, S0, A, s * Q, C, R)

            lg = value_and_grad(loss)
            opt = optax.adam(1.0)
            opt_state = opt.init(s_log0)

            def cond(carry):
                _, _, prev, iters, done = carry
                return jnp.logical_and(~done, iters < cap)

            def body(carry):
                s_log, opt_state, prev, iters, _ = carry
                val, grad = lg(s_log)
                updates, opt_state = opt.update(grad * 0.25, opt_state)
                s_log = optax.apply_updates(s_log, updates)
                rel_tol = 1e-2 * jnp.abs(jnp.log(jnp.maximum(prev, 1e-12)))
                stop = jnp.where(
                    jnp.isfinite(prev), jnp.abs(val - prev) < (rel_tol + 1e-6), False
                )
                return (s_log, opt_state, val, iters + 1, stop)

            s_log_f, _, _, iters_f, _ = lax.while_loop(
                cond, body,
                (s_log0, opt_state, jnp.inf, jnp.array(0), jnp.array(False)),
            )
            return s_log_f, iters_f

        return vmap(optimize_one)(yK, RK, m0K, S0K, AK, QK, CK, s_log0K)

    @jax.jit
    def smooth_all(yK, RtK, m0K, S0K, AK, QK, CK, sK):
        def smooth_one(y, R_t, m0, S0, A, Q, C, s):
            Qs_ = s * Q

            def fstep(carry, inp):
                m, P = carry
                y_t, R_full = inp
                mp = A @ m
                Pp = A @ P @ A.T + Qs_
                S = C @ Pp @ C.T + R_full
                cf = cho_factor(S, lower=True)
                Kt = cho_solve(cf, C @ Pp)
                m_new = mp + Kt.T @ (y_t - C @ mp)
                P_new = Pp - Kt.T @ (C @ Pp)
                return (m_new, P_new), (m_new, P_new, mp, Pp)

            _, (fm, fP, pm, pP) = lax.scan(fstep, (m0, S0), (y, R_t))

            def bstep(carry, inp):
                sm, sP = carry
                fm_t, fP_t, pm_n, pP_n = inp
                cf = cho_factor(pP_n, lower=True)
                G = cho_solve(cf, A @ fP_t).T  # (D, D)
                sm_t = fm_t + G @ (sm - pm_n)
                sP_t = fP_t + G @ (sP - pP_n) @ G.T
                return (sm_t, sP_t), (sm_t, sP_t)

            init = (fm[-1], fP[-1])
            _, (sm, sP) = lax.scan(
                bstep,
                init,
                (fm[:-1], fP[:-1], pm[1:], pP[1:]),
                reverse=True,
            )
            sm = jnp.concatenate([sm, fm[-1:]], axis=0)
            sP = jnp.concatenate([sP, fP[-1:]], axis=0)
            return sm, sP

        return vmap(smooth_one)(yK, RtK, m0K, S0K, AK, QK, CK, sK)

    return optimize_all, smooth_all


def _reference_equivalent_pipeline(marker_arr, cap: int):
    """ensemble -> reverse-AD sequential-EKF s-optimization -> sequential RTS
    smoother with time-varying full R, mirroring the reference's fast path.
    Returns (elapsed_s, joint_iters)."""
    import jax.numpy as jnp

    from eks_tpu.core import compute_initial_guesses, ensemble
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.singlecam import initialize_kalman_filter
    from eks_tpu.utils import center_predictions

    global _REF_PROGRAMS
    if _REF_PROGRAMS is None:
        _REF_PROGRAMS = _make_ref_programs()
    optimize_all, smooth_all = _REF_PROGRAMS

    ma = MarkerArray(marker_arr, data_fields=["x", "y", "likelihood"])
    t0 = time.perf_counter()
    emA = ensemble(ma)
    ens_vars = emA.slice_fields("var_x", "var_y").array[0, 0]  # (T, K, O)
    _, emA_centered, _, _ = center_predictions(emA, 100)
    ys = np.transpose(emA_centered.array[0, 0], (1, 0, 2))  # (K, T, O)
    m0s, S0s, As, Qs, Cs = initialize_kalman_filter(emA_centered)

    K_ = ys.shape[0]
    vars_np = np.clip(np.swapaxes(np.asarray(ens_vars), 0, 1), 1e-12, None)
    r_const = np.clip(np.nanmedian(vars_np, axis=1), 1e-4, np.inf)  # (K, O)
    R_const = np.stack([np.diag(r) for r in r_const])  # (K, O, O)
    s_guess = np.array(
        [
            g if np.isfinite(g) and g > 0 else 2.0
            for g in (compute_initial_guesses(ens_vars[:, k, :]) for k in range(K_))
        ]
    )
    s_log0 = np.log(np.clip(s_guess, 1e-6, 1e3)).astype(np.float32)

    s_log_f, iters = optimize_all(
        jnp.asarray(ys), jnp.asarray(R_const), m0s, S0s, As, Qs, Cs,
        jnp.asarray(s_log0), jnp.asarray(cap),
    )
    s_fin = jnp.exp(jnp.clip(s_log_f, -8.0, 8.0))

    R_t = np.zeros((K_, vars_np.shape[1], vars_np.shape[2], vars_np.shape[2]),
                   dtype=np.float32)
    for o in range(vars_np.shape[2]):
        R_t[:, :, o, o] = vars_np[:, :, o]
    ms, Vs = smooth_all(
        jnp.asarray(ys), jnp.asarray(R_t), m0s, S0s, As, Qs, Cs, s_fin
    )
    ms.block_until_ready()
    return time.perf_counter() - t0, int(np.max(np.asarray(iters)))


_REF_PROGRAMS = None


def make_session(rng):
    """Synthetic ensemble session: random-walk keypoints + per-seed jitter."""
    truth = rng.normal(size=(1, 1, T, K, 2)).cumsum(axis=2).astype(np.float32)
    arr = np.zeros((SEEDS, 1, T, K, 3), dtype=np.float32)
    arr[..., :2] = truth + rng.normal(size=(SEEDS, 1, T, K, 2)).astype(np.float32) * 0.5
    arr[..., 2] = rng.uniform(0.7, 1.0, size=(SEEDS, 1, T, K)).astype(np.float32)
    return arr


def run_pipeline(marker_arr, sequential: bool, safety_cap: int = SAFETY_CAP):
    """ensemble -> optimize s -> smooth; returns (elapsed_s, s)."""
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.singlecam import ensemble_kalman_smoother_singlecam

    ma = MarkerArray(marker_arr, data_fields=["x", "y", "likelihood"])
    kps = [f"kp{i}" for i in range(marker_arr.shape[3])]

    if sequential:
        # reference-equivalent path: sequential scans through the low-level
        # driver (the model layer always uses the parallel kernels)
        import jax.numpy as jnp

        from eks_tpu.core import _smooth_all, ensemble, optimize_smooth_param
        from eks_tpu.models.singlecam import initialize_kalman_filter
        from eks_tpu.utils import center_predictions

        t0 = time.perf_counter()
        emA = ensemble(ma)
        ens_vars = emA.slice_fields("var_x", "var_y").array[0, 0]
        _, emA_centered, _, _ = center_predictions(emA, 100)
        ys = np.transpose(emA_centered.array[0, 0], (1, 0, 2))
        m0s, S0s, As, Qs, Cs = initialize_kalman_filter(emA_centered)
        s_finals = optimize_smooth_param(
            ys=ys, m0s=m0s, S0s=S0s, As=As, Cs=Cs, Qs=Qs,
            ensemble_vars=ens_vars, blocks=None, s_frames=None,
            s_guess_per_k=np.full(K, 2.0), safety_cap=safety_cap,
            sequential=True,
        )
        rs = jnp.asarray(np.clip(np.swapaxes(ens_vars, 0, 1), 1e-12, None))
        ms, Vs = _smooth_all(
            jnp.asarray(ys), m0s, S0s, As, Qs, Cs,
            jnp.asarray(s_finals, dtype=rs.dtype), rs, sequential=True,
        )
        ms.block_until_ready()
        return time.perf_counter() - t0, s_finals

    t0 = time.perf_counter()
    df, s_finals = ensemble_kalman_smoother_singlecam(ma, kps)
    elapsed = time.perf_counter() - t0
    return elapsed, s_finals


def bench_multicam(rng, frames=10_000, kps=10):
    """Mirrored/linear multicam family (PCA latent, no inflation) on a
    synthetic 2-camera session."""
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.multicam import ensemble_kalman_smoother_multicam

    M, C = 5, 2
    base = rng.normal(size=(1, C, frames, kps, 2)).cumsum(axis=2) * 0.3 + 50
    arr = np.zeros((M, C, frames, kps, 3), dtype=np.float32)
    arr[..., :2] = base + rng.normal(size=(M, C, frames, kps, 2)) * 0.3
    arr[..., 2] = rng.uniform(0.8, 1.0, size=(M, C, frames, kps))
    ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])
    names = [f"kp{i}" for i in range(kps)]

    def once():
        t0 = time.perf_counter()
        ensemble_kalman_smoother_multicam(
            ma, names, ["cam0", "cam1"], inflate_vars=False, n_latent=3
        )
        return time.perf_counter() - t0

    once()
    return frames / min(once() for _ in range(3))


def bench_singlecam_k100(rng, frames=10_000, kps=100):
    """Keypoint-scaling probe: the flagship family at 5x the keypoint count.
    Reported in KEYPOINT-frames/s (T*K / wall) so it is comparable across
    K — the joint optimizer and batched kernels amortize with lane count,
    so this number should sit well above the K=20 headline's T*K rate."""
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.singlecam import ensemble_kalman_smoother_singlecam

    truth = rng.normal(size=(1, 1, frames, kps, 2)).cumsum(axis=2)
    arr = np.zeros((SEEDS, 1, frames, kps, 3), dtype=np.float32)
    arr[..., :2] = truth + rng.normal(size=(SEEDS, 1, frames, kps, 2)) * 0.5
    arr[..., 2] = rng.uniform(0.7, 1.0, size=(SEEDS, 1, frames, kps))
    ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])
    names = [f"kp{i}" for i in range(kps)]

    def once():
        t0 = time.perf_counter()
        ensemble_kalman_smoother_singlecam(ma, names)
        return time.perf_counter() - t0

    once()
    return frames * kps / min(once() for _ in range(3))


def bench_multicam_inflate(rng, frames=5_000, kps=5):
    """Linear multicam with the Mahalanobis variance-inflation fixed point:
    host sklearn-parity FA refits per round (bit-exact by design) + device
    smoothing — the general host-staged path the CLI uses by default."""
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.multicam import ensemble_kalman_smoother_multicam

    M, C = 5, 2
    base = rng.normal(size=(1, C, frames, kps, 2)).cumsum(axis=2) * 0.3 + 50
    arr = np.zeros((M, C, frames, kps, 3), dtype=np.float32)
    arr[..., :2] = base + rng.normal(size=(M, C, frames, kps, 2)) * 0.3
    arr[..., 2] = rng.uniform(0.8, 1.0, size=(M, C, frames, kps))
    ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])
    names = [f"kp{i}" for i in range(kps)]

    def once():
        t0 = time.perf_counter()
        ensemble_kalman_smoother_multicam(
            ma, names, ["cam0", "cam1"], inflate_vars=True, n_latent=3
        )
        return time.perf_counter() - t0

    once()
    return frames / min(once() for _ in range(3))


def bench_pupil(rng, frames=10_000):
    """IBL-pupil family (3-state AR(1), 2-param sigmoid optimizer)."""
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.ibl_pupil import (
        BODYPART_LIST,
        ensemble_kalman_smoother_ibl_pupil,
    )

    M = 5
    com = rng.normal(size=(frames, 2)).cumsum(axis=0) * 0.05 + 60
    diam = 20 + rng.normal(size=frames).cumsum() * 0.01
    offs = {
        "pupil_top_r": (0, -0.5), "pupil_bottom_r": (0, 0.5),
        "pupil_right_r": (0.5, 0), "pupil_left_r": (-0.5, 0),
    }
    arr = np.zeros((M, 1, frames, 4, 3), dtype=np.float32)
    for k, kp in enumerate(BODYPART_LIST):
        dx, dy = offs[kp]
        arr[:, 0, :, k, 0] = com[:, 0] + dx * diam + rng.normal(size=(M, frames)) * 0.2
        arr[:, 0, :, k, 1] = com[:, 1] + dy * diam + rng.normal(size=(M, frames)) * 0.2
    arr[..., 2] = rng.uniform(0.8, 1.0, size=(M, 1, frames, 4))
    ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])

    def once():
        t0 = time.perf_counter()
        ensemble_kalman_smoother_ibl_pupil(ma, BODYPART_LIST)
        return time.perf_counter() - t0

    once()
    return frames / min(once() for _ in range(3))


def bench_multicam_calibrated(rng, frames=10_000, kps=5):
    """Calibrated (nonlinear EKF) multicam family on a synthetic 3-camera rig:
    batched undistort+DLT prep, iterated parallel EKF, batched reprojection."""
    import jax.numpy as jnp

    from eks_tpu.geometry import Camera, CameraGroup
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.multicam import ensemble_kalman_smoother_multicam

    M, C = 5, 3
    cams = []
    for c in range(C):
        angle = 0.4 * (c - 1)
        cams.append(
            Camera(
                name=f"cam{c}",
                matrix=np.array([[900.0, 0, 320], [0, 900.0, 240], [0, 0, 1]]),
                dist=np.array([-0.05, 0.01, 0.0, 0.0, 0.0]),
                rvec=np.array([0.0, angle, 0.0]),
                tvec=np.array([0.25 * (c - 1), 0.0, 2.5]),
            )
        )
    group = CameraGroup(cams)

    X = rng.normal(size=(frames, kps, 3)).cumsum(axis=0) * 0.002  # world tracks
    arr = np.zeros((M, C, frames, kps, 3), dtype=np.float32)
    for c, cam in enumerate(group.cameras):
        uv = np.asarray(cam.projection_fn()(jnp.asarray(X.reshape(-1, 3))))
        arr[:, c, :, :, :2] = uv.reshape(frames, kps, 2)[None] + rng.normal(
            size=(M, frames, kps, 2)
        )
    arr[..., 2] = rng.uniform(0.8, 1.0, size=(M, C, frames, kps))
    ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])
    names = [f"kp{i}" for i in range(kps)]

    def once():
        t0 = time.perf_counter()
        ensemble_kalman_smoother_multicam(
            ma, names, [c.name for c in cams], smooth_param=5.0, camgroup=group
        )
        return time.perf_counter() - t0

    once()
    return frames / min(once() for _ in range(3))


def bench_paw(rng, frames=10_000, kps=4):
    """IBL-paw-equivalent: the linear multicam path under var_mode='var' with
    a dummy-likelihood field, which is what the paw family delegates to after
    its host-side timestamp alignment."""
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.multicam import ensemble_kalman_smoother_multicam

    M, C = 5, 2
    base = rng.normal(size=(1, C, frames, kps, 2)).cumsum(axis=2) * 0.2 + 64
    arr = np.zeros((M, C, frames, kps, 3), dtype=np.float32)
    arr[..., :2] = base + rng.normal(size=(M, C, frames, kps, 2)) * 0.4
    ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])
    names = [f"paw{i}" for i in range(kps)]

    def once():
        t0 = time.perf_counter()
        ensemble_kalman_smoother_multicam(
            ma, names, ["left", "right"], var_mode="var",
            inflate_vars=False, n_latent=3,
        )
        return time.perf_counter() - t0

    once()
    return frames / min(once() for _ in range(3))


def measure_accelerator(marker_arr):
    # warm-up compiles everything; best-of-5 steady-state runs (host<->device
    # transfer time over a remote-attached chip is the dominant noise source,
    # with >±20% swing between runs — min over 5 keeps the headline stable)
    run_pipeline(marker_arr, sequential=False)
    results = [run_pipeline(marker_arr, sequential=False) for _ in range(5)]
    return min(r[0] for r in results), results[0][1]


def measure_cpu_baseline(marker_arr):
    """Reference-equivalent (dynamax semantics, see module docstring) on the
    CPU backend, run to the optimizer's natural convergence — identical
    iterates and stop rule to the accelerator run, no extrapolation. If the
    projected full run exceeds a 15-minute budget, falls back to
    per-iteration slope x 90 joint iterations (the measured convergence
    point of this workload) and records the method used. Re-measured
    whenever any source the baseline path executes changes."""
    import jax

    key = f"T{T}_K{K}_S{SEEDS}_ref"
    code = _baseline_code_hash()
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
        entry = cache.get(key)
        if isinstance(entry, dict) and entry.get("code") == code:
            return entry["elapsed"]

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        _reference_equivalent_pipeline(marker_arr, cap=1)  # compile
        t1, _ = _reference_equivalent_pipeline(marker_arr, cap=1)
        t6, _ = _reference_equivalent_pipeline(marker_arr, cap=6)
        per_iter = max((t6 - t1) / 5.0, 0.0)
        projected = t1 + per_iter * 120
        if projected <= 900.0:
            # min-of-2: the single-core host runs under variable contention
            # and a lone measurement has been observed to swing ~2x
            e1, joint1 = _reference_equivalent_pipeline(marker_arr, cap=SAFETY_CAP)
            e2, joint2 = _reference_equivalent_pipeline(marker_arr, cap=SAFETY_CAP)
            elapsed, joint = min((e1, joint1), (e2, joint2))
            method = f"measured full run, min of 2 ({joint} joint iters)"
        else:
            elapsed = t1 + per_iter * 89
            method = "slope extrapolation to 90 joint iters"

    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    cache[key] = {
        "elapsed": elapsed,
        "code": code,
        "method": method,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(CACHE, "w") as f:
        json.dump(cache, f)
    return elapsed


def _require_reachable_accelerator(timeout_s: float = 180.0) -> None:
    """Fail fast with an honest JSON error line if device initialization
    hangs (the remote-attached tunnel goes fully dark at times) — a bounded
    failure beats an infinite hang under the driver."""
    import threading

    done = threading.Event()

    def probe():
        import jax

        jax.devices()
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        print(
            json.dumps(
                {
                    "metric": "smoothed frames/sec/chip",
                    "value": float("nan"),
                    "unit": "frames/s",
                    "vs_baseline": float("nan"),
                    "error": (
                        f"accelerator unreachable: device init exceeded "
                        f"{timeout_s:.0f}s (remote tunnel down?)"
                    ),
                }
            ),
            flush=True,
        )
        os._exit(3)


def main():
    _require_reachable_accelerator()
    rng = np.random.default_rng(0)
    marker_arr = make_session(rng)

    elapsed, _s = measure_accelerator(marker_arr)
    frames_per_sec = T / elapsed

    families = {}
    for name, fn in [
        ("singlecam_k100_kpframes", bench_singlecam_k100),
        ("multicam_linear", bench_multicam),
        ("multicam_calibrated", bench_multicam_calibrated),
        ("multicam_inflate", bench_multicam_inflate),
        ("ibl_pupil", bench_pupil),
        ("ibl_paw", bench_paw),
    ]:
        try:
            families[name] = round(fn(np.random.default_rng(1)), 1)
        except Exception as e:  # a family bench must never sink the headline
            families[name] = f"error: {type(e).__name__}"

    try:
        baseline_elapsed = measure_cpu_baseline(marker_arr)
        vs_baseline = baseline_elapsed / elapsed
    except Exception:
        baseline_elapsed = float("nan")
        vs_baseline = float("nan")

    print(
        json.dumps(
            {
                "metric": "smoothed frames/sec/chip (ensemble+EM+smooth, "
                "10k frames x 20 kps x 5 seeds)",
                "value": round(frames_per_sec, 2),
                "unit": "frames/s",
                "vs_baseline": round(vs_baseline, 2),
                "baseline_cpu_s": round(baseline_elapsed, 1),
                "families": families,
            }
        )
    )


if __name__ == "__main__":
    main()
