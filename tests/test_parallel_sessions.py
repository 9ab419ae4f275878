"""Round-5 mesh composition tests, in their OWN module deliberately.

XLA:CPU's LLVM backend segfaults when the ~18th distinct mesh/SPMD program
is compiled or cache-loaded within one test module (between the suite's
per-module ``jax.clear_caches()`` boundaries) — reproduced repeatedly on
2026-08-21: tests/test_parallel.py had 16 such programs and was green for
four rounds; appending these two tests made 18 and the LAST test in the
module segfaulted inside ``backend_compile_and_load`` regardless of which
test that was (reordering only moved the victim). The module boundary
resets the accumulation, keeping both modules below the threshold. The
mechanism note from the failed in-module reordering attempt is preserved
below for future archaeology.
"""

import numpy as np

from eks_tpu.parallel import make_mesh, optimize_and_smooth_sharded
from tests.test_parallel import _toy


# Original diagnosis note: these two round-5 tests sit EARLY in the module on
# purpose. XLA:CPU's LLVM backend segfaults when a NEW mesh/SPMD program is
# first compiled after ~15 prior mesh compiles in one process (the round-1
# failure mode; reproduced 2026-08-21 with these tests appended at the
# END of this module — 17 green then SIGSEGV inside backend_compile_and_load,
# while the same tests pass standalone and early). Early placement plus
# shape reuse (the NaN test matches test_sharded_matches_single_device[8]'s
# program signature) keeps every compile below the threshold.

def test_singlecam_sessions_under_mesh(rng):
    """Round-4's two features composed (VERDICT r4 item 7): N sessions
    stacked along the keypoint axis AND that merged lane axis sharded over
    the 8-device mesh must reproduce the per-session sequential outputs
    (sessions x keypoints is the natural DP axis)."""
    from eks_tpu.marker_array import MarkerArray
    from eks_tpu.models.singlecam import (
        ensemble_kalman_smoother_singlecam,
        ensemble_kalman_smoother_singlecam_sessions,
    )

    M, T, K, n_sess = 3, 64, 4, 2
    mas, names = [], []
    for _ in range(n_sess):
        truth = rng.normal(size=(1, 1, T, K, 2)).cumsum(axis=2)
        arr = np.zeros((M, 1, T, K, 3), dtype=np.float32)
        arr[..., :2] = (truth + rng.normal(size=(M, 1, T, K, 2)) * 0.3).astype(
            np.float32
        )
        arr[..., 2] = rng.uniform(0.7, 1.0, size=(M, 1, T, K)).astype(np.float32)
        mas.append(MarkerArray(arr, data_fields=["x", "y", "likelihood"]))
        names.append([f"kp{i}" for i in range(K)])

    res_mesh = ensemble_kalman_smoother_singlecam_sessions(
        mas, names, devices=8
    )
    assert len(res_mesh) == n_sess
    for (df_m, s_m), ma, ns in zip(res_mesh, mas, names):
        df_1, s_1 = ensemble_kalman_smoother_singlecam(ma, ns)
        # f32 reduction-order ulp between batch widths / mesh tiling; the
        # optimizer's auto-s can drift in the last float32 bit, which the
        # output amplifies slightly (same bound family as the pupil mesh test)
        np.testing.assert_allclose(np.asarray(s_m), np.asarray(s_1), rtol=1e-4)
        np.testing.assert_allclose(
            df_m.to_numpy(), df_1.to_numpy(), atol=1e-3, rtol=1e-5
        )


def test_sharded_optimizer_nan_vars_use_nanmedian(rng):
    """NaN entries in ensemble_vars must not poison the sharded optimizer's
    constant-R reduction (np.median propagated them, pinning the loss at
    the 1e12 penalty so s silently stayed at its init; round-5 self-review)."""
    ys, m0s, S0s, As, Qs, Cs, ev = _toy(rng, K=8)
    ev_nan = ev.copy()
    ev_nan[::7, 1, :] = np.nan  # scattered NaN frames on one keypoint
    mesh = make_mesh(4)
    s_nan, _, _ = optimize_and_smooth_sharded(
        ys, m0s, S0s, As, Qs, Cs, ev_nan, mesh=mesh
    )
    s_ref, _, _ = optimize_and_smooth_sharded(
        ys, m0s, S0s, As, Qs, Cs, ev, mesh=mesh
    )
    assert np.isfinite(np.asarray(s_nan)).all()
    # the unaffected keypoints optimize identically; the NaN keypoint still
    # converges to a data-driven value (not exp(s_log_init) = 1.0 exactly)
    keep = [k for k in range(8) if k != 1]
    np.testing.assert_allclose(np.asarray(s_nan)[keep],
                               np.asarray(s_ref)[keep], rtol=1e-6)
