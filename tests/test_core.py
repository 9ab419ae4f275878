"""Core: ensemble statistics contracts and s-optimizer behavior."""

import numpy as np
import pytest

import jax.numpy as jnp

from eks_tpu.core import (
    compute_initial_guesses,
    constant_R_from_timevarying,
    ensemble,
    run_kalman_smoother,
)
from eks_tpu.marker_array import MarkerArray


def make_marker_array(rng, M=3, C=1, T=60, K=2, nan_frac=0.0, zero_likelihood=False):
    arr = np.zeros((M, C, T, K, 3), dtype=np.float64)
    base = rng.normal(size=(1, C, T, K, 2)) * 5 + 100
    arr[..., :2] = base + rng.normal(size=(M, C, T, K, 2)) * 0.5
    arr[..., 2] = 0.0 if zero_likelihood else rng.uniform(0.5, 1.0, size=(M, C, T, K))
    if nan_frac > 0:
        mask = rng.random((M, C, T, K)) < nan_frac
        arr[..., 0][mask] = np.nan
        arr[..., 1][mask] = np.nan
    return MarkerArray(arr, data_fields=["x", "y", "likelihood"])


@pytest.mark.parametrize("avg_mode", ["mean", "median"])
@pytest.mark.parametrize("var_mode", ["var", "confidence_weighted_var"])
def test_ensemble_shapes_and_finiteness(rng, avg_mode, var_mode):
    ma = make_marker_array(rng)
    out = ensemble(ma, avg_mode=avg_mode, var_mode=var_mode)
    assert out.shape == (1, 1, 60, 2, 5)
    assert out.data_fields == ["x", "y", "var_x", "var_y", "likelihood"]
    assert np.isfinite(out.array).all()
    assert (out.array[..., 2:4] >= 0).all()


def test_ensemble_nan_replacement(rng):
    # a frame where every model is NaN -> variance = nan_replacement
    ma = make_marker_array(rng, M=3, T=20)
    ma.array[:, 0, 5, 0, 0] = np.nan
    ma.array[:, 0, 5, 0, 1] = np.nan
    out = ensemble(ma, nan_replacement=123.0)
    assert out.array[0, 0, 5, 0, 2] == 123.0
    assert out.array[0, 0, 5, 0, 3] == 123.0


def test_ensemble_single_model_fallback(rng):
    # n_models == 1: var = 1 / max(mean_conf, 1e-5) (positive, conf-dependent)
    ma = make_marker_array(rng, M=1)
    out = ensemble(ma)
    conf = ma.array[0, ..., 2]
    np.testing.assert_allclose(
        out.array[0, ..., 2], 1.0 / np.maximum(conf, 1e-5), rtol=1e-5
    )
    assert (out.array[..., 2:4] > 0).all()


def test_ensemble_zero_likelihood_stable(rng):
    ma = make_marker_array(rng, zero_likelihood=True)
    out = ensemble(ma, var_mode="var")
    assert np.isfinite(out.array).all()
    out_cw = ensemble(ma, var_mode="confidence_weighted_var")
    # conf-weighted divides by zero confidence -> inf allowed but not NaN
    assert not np.isnan(out_cw.array).any()


def test_compute_initial_guesses():
    ev = np.abs(np.random.default_rng(0).normal(size=(3000, 2)))
    g = compute_initial_guesses(ev)
    assert np.isfinite(g) and g > 0
    # only the first 2000 frames are considered
    ev2 = ev.copy()
    ev2[2000:] *= 100
    assert compute_initial_guesses(ev2) == g
    with pytest.raises(ValueError):
        compute_initial_guesses(ev[:1])


def test_constant_R_from_timevarying():
    T, O = 50, 2
    R = np.zeros((T, O, O))
    R[:, 0, 0] = np.linspace(0.0, 1.0, T)  # median 0.5 (approx)
    R[:, 1, 1] = 1e-9  # below the floor
    Rc = constant_R_from_timevarying(R, min_var=1e-4)
    assert Rc.shape == (O, O)
    assert abs(Rc[0, 0] - np.median(R[:, 0, 0])) < 1e-6
    assert Rc[1, 1] == 1e-4
    assert Rc[0, 1] == 0


# --------------------------------------------------------------------- #
# run_kalman_smoother end-to-end contracts
# --------------------------------------------------------------------- #
def _toy_problem(rng, K=3, T=120):
    ys = rng.normal(size=(K, T, 2)).cumsum(axis=1) * 0.1
    ev = np.abs(rng.normal(size=(T, K, 2))) * 0.2 + 0.05
    m0s = jnp.zeros((K, 2))
    S0s = jnp.tile(jnp.eye(2), (K, 1, 1))
    eye = jnp.tile(jnp.eye(2), (K, 1, 1))
    return jnp.asarray(ys), m0s, S0s, eye, eye, eye, ev


def test_fixed_smooth_param_scalar_and_list(rng):
    ys, m0s, S0s, As, Cs, Qs, ev = _toy_problem(rng)
    s1, ms1, Vs1 = run_kalman_smoother(
        ys, m0s, S0s, As, Cs, Qs, ev, smooth_param=2.0
    )
    np.testing.assert_array_equal(s1, [2.0, 2.0, 2.0])
    s2, ms2, _ = run_kalman_smoother(
        ys, m0s, S0s, As, Cs, Qs, ev, smooth_param=[1.0, 2.0, 3.0]
    )
    np.testing.assert_array_equal(s2, [1.0, 2.0, 3.0])
    # keypoint 1 shares s between the two runs -> identical trajectories
    np.testing.assert_allclose(ms1[1], ms2[1], atol=1e-6)
    assert ms1.shape == (3, 120, 2) and Vs1.shape == (3, 120, 2, 2)


def test_optimizer_fills_s_finals(rng):
    ys, m0s, S0s, As, Cs, Qs, ev = _toy_problem(rng)
    s, ms, Vs = run_kalman_smoother(ys, m0s, S0s, As, Cs, Qs, ev)
    assert s.shape == (3,)
    assert (s > 0).all() and np.isfinite(s).all()
    assert np.isfinite(ms).all() and np.isfinite(Vs).all()


def test_optimizer_blocks_share_s(rng):
    ys, m0s, S0s, As, Cs, Qs, ev = _toy_problem(rng)
    s, _, _ = run_kalman_smoother(
        ys, m0s, S0s, As, Cs, Qs, ev, blocks=[[0, 2], [1]]
    )
    assert s[0] == s[2]
    # a genuinely different lone keypoint usually gets a different s
    assert s.shape == (3,)


def test_optimizer_singleton_blocks_match_default(rng):
    ys, m0s, S0s, As, Cs, Qs, ev = _toy_problem(rng)
    s_default, _, _ = run_kalman_smoother(ys, m0s, S0s, As, Cs, Qs, ev)
    s_blocks, _, _ = run_kalman_smoother(
        ys, m0s, S0s, As, Cs, Qs, ev, blocks=[[0], [1], [2]]
    )
    np.testing.assert_allclose(s_default, s_blocks, rtol=1e-6)


def test_s_frames_cropping_changes_loss_only(rng):
    ys, m0s, S0s, As, Cs, Qs, ev = _toy_problem(rng, T=200)
    s_full, ms_full, _ = run_kalman_smoother(ys, m0s, S0s, As, Cs, Qs, ev)
    s_crop, ms_crop, _ = run_kalman_smoother(
        ys, m0s, S0s, As, Cs, Qs, ev, s_frames=[(0, 100)]
    )
    # final smoothing always runs over all frames
    assert ms_crop.shape == ms_full.shape == (3, 200, 2)
    assert np.isfinite(s_crop).all()


def test_sequential_and_parallel_optimizers_agree(rng):
    ys, m0s, S0s, As, Cs, Qs, ev = _toy_problem(rng, K=2, T=100)
    s_par, ms_par, _ = run_kalman_smoother(ys, m0s, S0s, As, Cs, Qs, ev)
    s_seq, ms_seq, _ = run_kalman_smoother(
        ys, m0s, S0s, As, Cs, Qs, ev, sequential=True
    )
    np.testing.assert_allclose(s_par, s_seq, rtol=1e-2)
    np.testing.assert_allclose(ms_par, ms_seq, atol=1e-2)


def test_joint_optimizer_loop_matches_vmapped_semantics(monkeypatch):
    """The joint while-loop (``_optimize_blocks_joint``) must replicate
    vmap(while_loop) batching semantics exactly: per-lane Adam state
    (including count), masked carries, per-lane stopping. The plane NLL it
    normally feeds is TPU-only (XLA:CPU compile pathology), so this pins the
    LOOP against the vmapped twin with a cheap quadratic loss injected in
    place of the batched filter NLL — the loss itself is covered by the
    plane-NLL parity tests."""
    import jax.numpy as jnp

    from eks_tpu import core

    n_blocks, b_max, T, O, D = 3, 2, 7, 2, 2
    rng = np.random.default_rng(0)
    yB = jnp.asarray(rng.normal(size=(n_blocks, b_max, T, O)).astype(np.float32))
    rB = jnp.asarray(rng.uniform(0.5, 1.0, size=(n_blocks, b_max, O)).astype(np.float32))
    m0B = jnp.zeros((n_blocks, b_max, D))
    S0B = jnp.broadcast_to(jnp.eye(D), (n_blocks, b_max, D, D))
    AB = S0B
    QB = S0B * jnp.asarray(
        rng.uniform(0.5, 2.0, size=(n_blocks, b_max, 1, 1)).astype(np.float32)
    )
    CB = S0B
    mask = jnp.asarray(
        np.array([[1.0, 0.0], [1.0, 1.0], [1.0, 1.0]], np.float32)
    )
    s0 = jnp.asarray(np.array([0.4, -0.3, 0.1], np.float32))

    # quadratic in log s with a per-member offset drawn from the operands:
    # cheap to compile, distinct minimum per member, exercises the stop rule
    def fake_batched(yF, m0F, S0F, AF, sQF, CF, rF):
        target = jnp.mean(rF, axis=-1)  # (N,)
        s_log = jnp.log(sQF[:, 0, 0])
        return -(100.0 * (s_log - target) ** 2 + jnp.mean(yF, axis=(1, 2)) ** 2)

    def fake_single(y, m0, S0, A, sQ, C, r, h_fn, sequential, x_init=None):
        ll = fake_batched(
            y[None], m0[None], S0[None], A[None], sQ[None], C[None], r[None]
        )[0]
        return -ll

    monkeypatch.setattr(core, "filter_nll_parallel_planes_batched", fake_batched)
    monkeypatch.setattr(core, "_filter_nll", fake_single)

    # bypass the jit wrapper so the monkeypatched losses are traced fresh
    fn = core._optimize_blocks.__wrapped__.__wrapped__
    kw = dict(
        h_fn=None, sequential=False, lr=0.25, s_lo=-8.0, s_hi=8.0,
        tol=1e-2, safety_cap=50,
    )
    sv, lv, iv = fn(yB, rB, m0B, S0B, AB, QB, CB, mask, s0, joint=False, **kw)
    sj, lj, ij = fn(yB, rB, m0B, S0B, AB, QB, CB, mask, s0, joint=True, **kw)

    np.testing.assert_array_equal(np.asarray(iv), np.asarray(ij))
    np.testing.assert_allclose(np.asarray(sv), np.asarray(sj), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(lv), np.asarray(lj), rtol=0, atol=0)


def test_nanmedian_small_bit_parity_with_jnp(rng):
    """The compare-exchange nanmedian (used for the ensemble consensus;
    ~40x faster than XLA:CPU's generic sort on the models axis) must be
    BIT-identical to jnp.nanmedian for every ensemble size, NaN pattern,
    and inf placement — the reference's own ensemble runs jnp.nanmedian,
    and test_ref_inflation_bit_parity depends on exact agreement."""
    import jax
    import jax.numpy as jnp

    from eks_tpu.core import _nanmedian_small

    for m in (1, 2, 3, 4, 5, 6, 8, 16):
        for nan_frac in (0.0, 0.35, 0.9, 1.0):
            a = (rng.normal(size=(m, 23, 7)) * 50).astype(np.float32)
            a[rng.uniform(size=a.shape) < nan_frac] = np.nan
            got = np.asarray(jax.jit(_nanmedian_small)(a))
            want = np.asarray(jnp.nanmedian(a, axis=0))
            np.testing.assert_array_equal(
                got, want, err_msg=f"m={m} nan_frac={nan_frac}"
            )
    # real +inf observations coexist with NaN sentinels
    a = np.array(
        [[np.inf, 1.0], [1.0, np.nan], [np.nan, np.nan], [2.0, -np.inf],
         [np.inf, np.nan]],
        np.float32,
    )
    np.testing.assert_array_equal(
        np.asarray(_nanmedian_small(a)), np.asarray(jnp.nanmedian(a, axis=0))
    )


def test_partial_blocks_fill_unlisted_keypoints(rng):
    """A PARTIAL blocks list must not leave keypoints unoptimized (the
    reference's behavior is uninitialized np.empty memory — undefined);
    unlisted keypoints become their own singleton blocks (round-5
    self-review, confirmed finding)."""
    import jax.numpy as jnp

    from eks_tpu.core import run_kalman_smoother

    K, T = 4, 120
    # keypoints 2-3 get very different dynamics than 0-1 so their optimized
    # s cannot coincide with block [0, 1]'s shared value
    ys = np.zeros((K, T, 2), dtype=np.float32)
    ys[:2] = rng.normal(size=(2, T, 2)).cumsum(axis=1) * 2.0
    ys[2:] = rng.normal(size=(2, T, 2)) * 0.01
    ev = np.abs(rng.normal(size=(T, K, 2))).astype(np.float32) * 0.2 + 0.05
    eye = np.tile(np.eye(2, dtype=np.float32), (K, 1, 1))
    s, ms, _ = run_kalman_smoother(
        ys=ys, m0s=np.zeros((K, 2), np.float32), S0s=eye, As=eye, Cs=eye,
        Qs=eye, ensemble_vars=ev, blocks=[[0, 1]], safety_cap=60,
    )
    s = np.asarray(s, dtype=float)
    assert np.isfinite(s).all()
    assert s[0] == s[1]  # the listed block shares one s
    # unlisted keypoints were optimized on their own data, not garbage
    assert s[2] != s[0] and s[3] != s[0]
    assert np.isfinite(np.asarray(ms)).all()
