"""Benchmark: smoothed frames/sec/chip across the model families.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "families": {...}}

The headline metric is the singlecam flagship (10k frames x 20 keypoints x
5 seeds, ensemble + Adam s-optimization + smoothing); "families" adds
multicam-linear, ibl-pupil, and ibl-paw-style throughput on the same frame
count for regression tracking.

The reference publishes no numbers (BASELINE.md), so the denominator is a
measured reference-equivalent run: the same pipeline with the sequential
lax.scan filter/smoother (the reference's dynamax semantics) pinned to the
CPU backend. Its optimizer cost is extrapolated linearly from a short run
(per-iteration cost x the accelerator run's iteration count) because the full
CPU run takes tens of minutes. The CPU baseline is cached in
.bench_baseline.json keyed by workload shape AND a hash of the sources the
baseline path executes — it re-measures exactly when the measured code
changes instead of trusting a stale number.
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
    """Hash of the sources the CPU-baseline run actually executes. The
    baseline re-measures when any of these change; unrelated commits reuse
    the cached number (a git-commit key would re-pay the ~10-minute CPU
    measure on every commit)."""
    import hashlib

    files = [
        "eks_tpu/ops/kalman.py", "eks_tpu/ops/linalg.py", "eks_tpu/core.py",
        "eks_tpu/models/singlecam.py", "eks_tpu/utils/frames.py", "bench.py",
    ]
    h = hashlib.sha256()
    for f in files:
        with open(os.path.join(_REPO, f), "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:16]


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
    # warm-up compiles everything; best-of-3 steady-state runs (host<->device
    # transfer time over a remote-attached chip is the dominant noise source)
    run_pipeline(marker_arr, sequential=False)
    results = [run_pipeline(marker_arr, sequential=False) for _ in range(3)]
    return min(r[0] for r in results), results[0][1]


def measure_cpu_baseline(marker_arr):
    """Reference-equivalent: sequential scans on the CPU backend, optimizer
    cost extrapolated from a short capped run. Re-measured whenever any
    source the baseline path executes changes."""
    import jax

    key = f"T{T}_K{K}_S{SEEDS}_cap{SAFETY_CAP}"
    code = _baseline_code_hash()
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
        entry = cache.get(key)
        if isinstance(entry, dict) and entry.get("code") == code:
            return entry["elapsed"]

    cpu = jax.devices("cpu")[0]
    short_cap = 3
    with jax.default_device(cpu):
        # first call compiles; best-of-2 measures (single-core wall clock on
        # this box is noisy enough to swing the extrapolation otherwise)
        run_pipeline(marker_arr, sequential=True, safety_cap=1)
        elapsed_short = min(
            run_pipeline(marker_arr, sequential=True, safety_cap=short_cap)[0]
            for _ in range(2)
        )
        elapsed_one = min(
            run_pipeline(marker_arr, sequential=True, safety_cap=1)[0]
            for _ in range(2)
        )
    per_iter = max(elapsed_short - elapsed_one, 1e-9) / (short_cap - 1)
    overhead = max(elapsed_one - per_iter, 0.0)
    est_full = overhead + per_iter * SAFETY_CAP

    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    cache[key] = {
        "elapsed": est_full,
        "code": code,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(CACHE, "w") as f:
        json.dump(cache, f)
    return est_full


def main():
    rng = np.random.default_rng(0)
    marker_arr = make_session(rng)

    elapsed, _s = measure_accelerator(marker_arr)
    frames_per_sec = T / elapsed

    families = {}
    for name, fn in [
        ("multicam_linear", bench_multicam),
        ("multicam_calibrated", bench_multicam_calibrated),
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
