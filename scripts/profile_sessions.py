"""Stage-level diagnosis of singlecam multi-session batching (VERDICT r4
item 2: sessions4 measured 0.93x vs sequential — find where the batched run
loses and whether the link floor permits a win at all).

Run with the ambient TPU env: python scripts/profile_sessions.py [N]
"""

import logging
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

logging.basicConfig(format="%(message)s")
logging.getLogger("eks_tpu").setLevel(logging.DEBUG)

from eks_tpu.marker_array import MarkerArray  # noqa: E402
from eks_tpu.models.singlecam import (  # noqa: E402
    ensemble_kalman_smoother_singlecam,
    ensemble_kalman_smoother_singlecam_sessions,
)
from eks_tpu.utils import profiling  # noqa: E402

T, K, SEEDS = 10_000, 20, 5


def make_session(rng):
    truth = rng.normal(size=(1, 1, T, K, 2)).cumsum(axis=2).astype(np.float32)
    arr = np.zeros((SEEDS, 1, T, K, 3), dtype=np.float32)
    arr[..., :2] = truth + rng.normal(size=(SEEDS, 1, T, K, 2)).astype(np.float32) * 0.5
    arr[..., 2] = rng.uniform(0.7, 1.0, size=(SEEDS, 1, T, K)).astype(np.float32)
    return arr


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.default_rng(2)
    mas = [
        MarkerArray(make_session(rng), data_fields=["x", "y", "likelihood"])
        for _ in range(n)
    ]
    names = [[f"kp{i}" for i in range(K)] for _ in range(n)]

    # warm both programs
    print("== warm-up (compiles) ==", flush=True)
    with profiling.record_opt_stats():
        ensemble_kalman_smoother_singlecam(mas[0], names[0])
    print("solo joint_iters:", profiling.LAST_OPT_STATS.get("joint_iters"))
    with profiling.record_opt_stats():
        ensemble_kalman_smoother_singlecam_sessions(mas, names)
    print("batched joint_iters:", profiling.LAST_OPT_STATS.get("joint_iters"))

    print("\n== solo x%d (per-session stage logs) ==" % n, flush=True)
    t_seq = 0.0
    for ma, ns in zip(mas, names):
        t0 = time.perf_counter()
        ensemble_kalman_smoother_singlecam(ma, ns)
        dt = time.perf_counter() - t0
        t_seq += dt
        print(f"  solo run: {dt:.3f}s")

    print("\n== batched (stage logs) ==", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        ensemble_kalman_smoother_singlecam_sessions(mas, names)
        times.append(time.perf_counter() - t0)
        print(f"  batched run: {times[-1]:.3f}s")
    print(f"\nsequential total {t_seq:.3f}s  batched best {min(times):.3f}s  "
          f"ratio {t_seq / min(times):.2f}x")


if __name__ == "__main__":
    main()
