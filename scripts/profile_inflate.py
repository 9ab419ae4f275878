"""Stage profile of the multicam variance-inflation family (VERDICT r3
item 3): where does bench_multicam_inflate's wall time go?

Run with the ambient env (TPU) for the bench-identical split, or
JAX_PLATFORMS=cpu for the host-stage-only view (the inflation fixed point is
host-side either way).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES, KPS = 5_000, 5


def main():
    import jax

    from eks_tpu import stats
    from eks_tpu.core import ensemble
    from eks_tpu.marker_array import MarkerArray, mA_to_stacked_array
    from eks_tpu.models.multicam import (
        ensemble_kalman_smoother_multicam,
        inflate_variance,
    )
    from eks_tpu.utils import center_predictions

    rng = np.random.default_rng(1)
    M, C = 5, 2
    base = rng.normal(size=(1, C, FRAMES, KPS, 2)).cumsum(axis=2) * 0.3 + 50
    arr = np.zeros((M, C, FRAMES, KPS, 3), dtype=np.float32)
    arr[..., :2] = base + rng.normal(size=(M, C, FRAMES, KPS, 2)) * 0.3
    arr[..., 2] = rng.uniform(0.8, 1.0, size=(M, C, FRAMES, KPS))
    ma = MarkerArray(arr, data_fields=["x", "y", "likelihood"])
    names = [f"kp{i}" for i in range(KPS)]

    # end-to-end (warm + timed) — CPU end-to-end runs take minutes per
    # pass (the optimizer scans compile+run on XLA:CPU), so they are opt-in:
    #   python scripts/profile_inflate.py --e2e
    total = None
    if "--e2e" in sys.argv:
        def once():
            t0 = time.perf_counter()
            ensemble_kalman_smoother_multicam(
                ma, names, ["cam0", "cam1"], inflate_vars=True, n_latent=3
            )
            return time.perf_counter() - t0

        once()
        total = min(once() for _ in range(2))
        print(f"total end-to-end: {total:.3f}s  ({FRAMES / total:.0f} f/s)")

    # stage split
    t0 = time.perf_counter()
    with jax.default_device(jax.devices("cpu")[0]):
        emA = ensemble(ma)
    t_ens = time.perf_counter() - t0
    emA_vars = emA.slice_fields("var_x", "var_y")
    t0 = time.perf_counter()
    _, emA_centered, emA_good, _ = center_predictions(emA, 50.0)
    t_center = time.perf_counter() - t0
    print(f"ensemble: {t_ens:.3f}s   centering: {t_center:.3f}s")

    # the inflation fixed point, instrumented per round
    t_fa = t_screen = 0.0
    n_rounds = n_em_iters = 0
    t0_all = time.perf_counter()
    for k in range(KPS):
        x = mA_to_stacked_array(emA_centered, k)
        tmp = mA_to_stacked_array(emA_vars, k)
        # bench path passes no likelihoods -> variance filter only
        inflated = True
        while inflated:
            t0 = time.perf_counter()
            ev_max = tmp.max(axis=1)
            valid = ev_max < np.percentile(ev_max, 50.0)
            fa = stats.FactorAnalysis(n_components=3)
            fa.fit(x[valid])
            t_fa += time.perf_counter() - t0
            n_em_iters += fa.n_iter_
            t0 = time.perf_counter()
            maha = stats.compute_mahalanobis(
                x, tmp, n_latent=3,
                loading_matrix=fa.components_.T, mean=fa.mean_,
            )
            tmp, inflated = inflate_variance(tmp, maha["mahalanobis"], 5.0, 10.0)
            t_screen += time.perf_counter() - t0
            n_rounds += 1
    t_fixed_point = time.perf_counter() - t0_all
    print(
        f"inflation fixed point: {t_fixed_point:.3f}s "
        f"(FA fits {t_fa:.3f}s over {n_rounds} rounds / {n_em_iters} EM iters; "
        f"screening {t_screen:.3f}s)"
    )
    if total is not None:
        print(
            "residual (PCA+optimizer+smoother+packaging): "
            f"{total - t_ens - t_center - t_fixed_point:.3f}s"
        )


if __name__ == "__main__":
    main()
