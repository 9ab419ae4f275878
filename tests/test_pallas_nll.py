"""Fused single-kernel NLL (ops/pallas_nll.py): parity with the sequential
filter and the staged plane pipeline, JVP parity, and optimizer integration.
All kernels run in interpret mode on the CPU test backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import vmap

from eks_tpu.ops.kalman import kalman_filter
from eks_tpu.ops.pallas_nll import (
    _use_fused_nll,
    filter_nll_fused_batched,
    force_fused_nll,
)


def _problem(rng, N, T, O, D, dtype=jnp.float32):
    ys = jnp.asarray(rng.normal(size=(N, T, O)).cumsum(axis=1) * 0.1, dtype)
    m0 = jnp.asarray(rng.normal(size=(N, D)) * 0.3, dtype)
    S0 = jnp.tile(jnp.eye(D, dtype=dtype)[None] * 1.3, (N, 1, 1))
    A = jnp.tile(jnp.eye(D, dtype=dtype)[None], (N, 1, 1))
    Q = jnp.tile(jnp.eye(D, dtype=dtype)[None] * 0.7, (N, 1, 1))
    C = jnp.asarray(
        np.tile(np.eye(O, D), (N, 1, 1))
        + 0.05 * rng.normal(size=(N, O, D)),
        dtype,
    )
    r = jnp.asarray(np.abs(rng.normal(size=(N, O))) * 0.5 + 0.2, dtype)
    return ys, m0, S0, A, Q, C, r


def _seq_lls(ys, m0, S0, A, Q, C, r):
    return vmap(
        lambda y, m, s, a, q, c, rr: kalman_filter(
            y, m, s, a, q, C=c, r_diag=rr
        ).log_likelihood
    )(ys, m0, S0, A, Q, C, r)


@pytest.mark.parametrize(
    "N,T,O,D",
    [
        (5, 300, 2, 2),     # singlecam shape, unaligned T
        (3, 256, 2, 2),     # aligned T
        # interpret-mode runtime grows with N*T*planes; slow tier keeps the
        # wide-plane shapes, fast tier keeps the D=2 ones + one 3-cam case
        pytest.param(9, 130, 4, 3, marks=pytest.mark.slow),  # 2 cams, N%8!=0
        (2, 97, 6, 3),      # 3 cams
    ],
)
def test_fused_nll_matches_sequential(N, T, O, D):
    rng = np.random.default_rng(11 + N)
    args = _problem(rng, N, T, O, D)
    ll_fused = filter_nll_fused_batched(*args, interpret=True)
    ll_seq = _seq_lls(*args)
    np.testing.assert_allclose(
        np.asarray(ll_fused), np.asarray(ll_seq), rtol=2e-5
    )


def test_fused_nll_matches_staged_plane_pipeline():
    from eks_tpu.ops.pkalman import filter_nll_parallel_planes_batched

    rng = np.random.default_rng(3)
    args = _problem(rng, 4, 210, 2, 2)
    ll_fused = filter_nll_fused_batched(*args, interpret=True)
    with force_fused_nll(False):
        ll_staged = filter_nll_parallel_planes_batched(*args)
    np.testing.assert_allclose(
        np.asarray(ll_fused), np.asarray(ll_staged), rtol=2e-5
    )


def test_fused_nll_jvp_matches_sequential():
    rng = np.random.default_rng(7)
    ys, m0, S0, A, Q, C, r = _problem(rng, 4, 220, 2, 2)

    def loss_fused(s_log):
        s = jnp.exp(s_log)
        return jnp.sum(
            filter_nll_fused_batched(ys, m0, S0, A, s * Q, C, r, interpret=True)
        )

    def loss_seq(s_log):
        s = jnp.exp(s_log)
        return jnp.sum(_seq_lls(ys, m0, S0, A, s * Q, C, r))

    x = jnp.asarray(0.4, jnp.float32)
    vf, gf = jax.jvp(loss_fused, (x,), (jnp.ones_like(x),))
    vs, gs = jax.jvp(loss_seq, (x,), (jnp.ones_like(x),))
    np.testing.assert_allclose(float(vf), float(vs), rtol=2e-5)
    np.testing.assert_allclose(float(gf), float(gs), rtol=2e-4)


def test_fused_nll_jvp_observation_tangents_fall_back_to_staged():
    """Observation tangents have no fused paired-y kernel; the custom JVP
    must fall back to the staged plane pipeline (not raise), with the value
    still coming out right and the tangent matching finite differences."""
    from eks_tpu.ops.pkalman import _filter_nll_planes_batched_staged

    rng = np.random.default_rng(9)
    ys, m0, S0, A, Q, C, r = _problem(rng, 2, 140, 2, 2)

    def loss(y):
        return jnp.sum(
            filter_nll_fused_batched(y, m0, S0, A, Q, C, r, interpret=True)
        )

    tan = jnp.asarray(np.random.default_rng(1).normal(size=ys.shape), ys.dtype)
    val, grad = jax.jvp(loss, (ys,), (tan,))

    def loss_staged(y):
        return jnp.sum(_filter_nll_planes_batched_staged(y, m0, S0, A, Q, C, r))

    val_ref, grad_ref = jax.jvp(loss_staged, (ys,), (tan,))
    np.testing.assert_allclose(float(val), float(val_ref), rtol=2e-5)
    np.testing.assert_allclose(float(grad), float(grad_ref), rtol=2e-4)
    h = 1e-2
    fd = (float(loss(ys + h * tan)) - float(loss(ys - h * tan))) / (2 * h)
    np.testing.assert_allclose(float(grad), fd, rtol=5e-2)


def test_fused_nll_jvp_mixed_tangents_match_staged():
    """Perturbing observations AND model parameters together must route the
    whole JVP through the staged fallback consistently."""
    from eks_tpu.ops.pkalman import _filter_nll_planes_batched_staged

    rng = np.random.default_rng(13)
    ys, m0, S0, A, Q, C, r = _problem(rng, 2, 130, 2, 2)

    def loss(fn, y, s_log):
        s = jnp.exp(s_log)
        return jnp.sum(fn(y, m0, S0, A, s[:, None, None] * Q, C, r))

    import functools

    fused = functools.partial(filter_nll_fused_batched, interpret=True)
    y_tan = jnp.asarray(np.random.default_rng(2).normal(size=ys.shape), ys.dtype)
    s0 = jnp.zeros(2, dtype=ys.dtype)
    s_tan = jnp.ones(2, dtype=ys.dtype)
    val, grad = jax.jvp(lambda y, s: loss(fused, y, s), (ys, s0), (y_tan, s_tan))
    val_ref, grad_ref = jax.jvp(
        lambda y, s: loss(_filter_nll_planes_batched_staged, y, s),
        (ys, s0), (y_tan, s_tan),
    )
    np.testing.assert_allclose(float(val), float(val_ref), rtol=2e-5)
    np.testing.assert_allclose(float(grad), float(grad_ref), rtol=2e-4)


def test_dispatch_gating():
    # follows the Pallas signal by default (off on the CPU test backend),
    # the force context wins either way, and D/O caps always apply
    assert not _use_fused_nll(2, 2)
    with force_fused_nll(True):
        assert _use_fused_nll(2, 2)
        assert not _use_fused_nll(4, 2)   # D cap
        assert not _use_fused_nll(3, 10)  # O cap
        # an explicit force also wins over the VMEM-budget veto at large T
        # (the direct call path clamps to the minimum tile)
        assert _use_fused_nll(3, 8, T=4_000_000)
    with force_fused_nll(False):
        assert not _use_fused_nll(2, 2)


@pytest.mark.slow  # ~30s interpret-mode routing pin; kernel value/grad
# parity keeps fast-tier coverage
def test_batched_entry_routes_to_fused_kernel():
    """filter_nll_parallel_planes_batched must return fused-kernel results
    when the fused path is pinned on (CPU: interpret mode)."""
    from eks_tpu.ops.pkalman import filter_nll_parallel_planes_batched

    rng = np.random.default_rng(5)
    args = _problem(rng, 3, 150, 2, 2)
    with force_fused_nll(True):
        ll_via_entry = filter_nll_parallel_planes_batched(*args)
    ll_direct = filter_nll_fused_batched(*args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ll_via_entry), np.asarray(ll_direct), rtol=1e-6
    )


@pytest.mark.slow
def test_joint_optimizer_through_fused_kernel():
    """The joint s-optimizer converges to the same s through the fused
    kernel as through the staged plane pipeline.

    Slow tier: two trace+compiles of the jitted joint while-loop with the
    interpret-mode kernel inside (~6 min on XLA:CPU); the fast tier keeps
    direct value/jvp parity for both kernels."""
    from eks_tpu.core import _optimize_blocks, force_plane_opt

    rng = np.random.default_rng(21)
    K, T, O, D = 3, 180, 2, 2
    ys, m0, S0, A, Q, C, r = _problem(rng, K, T, O, D)
    yB, rB = ys[:, None], r[:, None]
    m0B, S0B, AB, QB, CB = (
        m0[:, None], S0[:, None], A[:, None], Q[:, None], C[:, None]
    )
    maskB = jnp.ones((K, 1), dtype=ys.dtype)
    s_log0 = jnp.zeros((K,), dtype=ys.dtype)

    def run():
        # the fused/staged choice is resolved at trace time inside the jitted
        # optimizer; drop the cached executable so the flag flip re-traces
        jax.clear_caches()
        with force_plane_opt(True):
            s_log, loss, iters = _optimize_blocks(
                yB, rB, m0B, S0B, AB, QB, CB, maskB, s_log0,
                joint=True, safety_cap=60,
            )
        return np.asarray(s_log), np.asarray(loss)

    with force_fused_nll(True):
        s_fused, loss_fused = run()
    with force_fused_nll(False):
        s_staged, loss_staged = run()
    np.testing.assert_allclose(s_fused, s_staged, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(loss_fused, loss_staged, rtol=1e-4)


# --------------------------------------------------------------------------- #
# time-varying-R fused kernel (the pupil optimizer's loss)
# --------------------------------------------------------------------------- #
def _tv_problem(rng, N, T, O, D, dtype=jnp.float32):
    ys, m0, S0, A, Q, C, _ = _problem(rng, N, T, O, D, dtype)
    A = A * 0.95
    r = jnp.asarray(np.abs(rng.normal(size=(N, T, O))) * 0.5 + 0.2, dtype)
    return ys, m0, S0, A, Q, C, r


@pytest.mark.parametrize(
    "N,T,O,D",
    [
        pytest.param(3, 300, 8, 3, marks=pytest.mark.slow),  # pupil shape
        (2, 130, 2, 2),
        pytest.param(5, 256, 4, 3, marks=pytest.mark.slow),  # aligned T
    ],
)
def test_fused_tv_nll_matches_sequential(N, T, O, D):
    from eks_tpu.ops.pallas_nll import filter_nll_fused_tv_batched

    rng = np.random.default_rng(31 + N)
    args = _tv_problem(rng, N, T, O, D)
    ll_fused = filter_nll_fused_tv_batched(*args, interpret=True)
    ll_seq = _seq_lls(*args)
    np.testing.assert_allclose(
        np.asarray(ll_fused), np.asarray(ll_seq), rtol=2e-5
    )


@pytest.mark.parametrize(
    # O=8/D=3 at T=200 is the pupil shape; interpret-mode compile of the
    # paired kernel's unrolled algebra grows steeply with O and D, so only
    # the smallest paired TV jvp stays in the fast tier
    "O,D,T",
    [
        (2, 2, 96),
        pytest.param(4, 3, 144, marks=pytest.mark.slow),
        pytest.param(8, 3, 200, marks=pytest.mark.slow),
    ],
)
def test_fused_tv_nll_jvp_matches_staged(O, D, T):
    """The paired TV kernel's scalar-table JVP (what the pupil optimizer
    consumes: tangents through A and Q) must match the staged TV plane
    pipeline's jvp and finite differences. The O=8 pupil shape is slow-tier:
    interpret-mode compile of the paired kernel's unrolled 8x8 innovation
    Cholesky costs minutes on XLA:CPU."""
    from eks_tpu.ops.pallas_nll import filter_nll_fused_tv_batched
    from eks_tpu.ops.pkalman import filter_nll_parallel_planes_tv

    rng = np.random.default_rng(37)
    ys, m0, S0, A, Q, C, r = _tv_problem(rng, 2, T, O, D)

    def loss_fused(s_log):
        s = jnp.exp(s_log)[:, None, None]
        return jnp.sum(
            filter_nll_fused_tv_batched(
                ys, m0, S0, A, s * Q, C, r, interpret=True
            )
        )

    def loss_staged(s_log):
        s = jnp.exp(s_log)
        return jnp.sum(
            vmap(
                lambda y, m, s0, a, q, c, rr: filter_nll_parallel_planes_tv(
                    y, m, s0, a, q, c, rr
                )
            )(ys, m0, S0, A, s[:, None, None] * Q, C, r)
        )

    x = jnp.zeros(2).at[0].set(0.2)
    tan = jnp.ones(2)
    v, g = jax.jvp(loss_fused, (x,), (tan,))
    v_ref, g_ref = jax.jvp(loss_staged, (x,), (tan,))
    np.testing.assert_allclose(float(v), float(v_ref), rtol=2e-5)
    np.testing.assert_allclose(float(g), float(g_ref), rtol=2e-4)
    h = 1e-3
    fd = (float(loss_fused(x + h * tan)) - float(loss_fused(x - h * tan))) / (2 * h)
    np.testing.assert_allclose(float(g), fd, rtol=5e-2)


def test_fused_tv_nll_observation_tangents_fall_back():
    from eks_tpu.ops.pallas_nll import filter_nll_fused_tv_batched
    from eks_tpu.ops.pkalman import filter_nll_parallel_planes_tv

    rng = np.random.default_rng(41)
    ys, m0, S0, A, Q, C, r = _tv_problem(rng, 2, 140, 2, 2)

    def loss(fn, y, rr):
        return jnp.sum(fn(y, rr))

    fused = lambda y, rr: filter_nll_fused_tv_batched(
        y, m0, S0, A, Q, C, rr, interpret=True
    )
    staged = lambda y, rr: vmap(
        lambda yy, m, s0, a, q, c, r2: filter_nll_parallel_planes_tv(
            yy, m, s0, a, q, c, r2
        )
    )(y, m0, S0, A, Q, C, rr)

    y_tan = jnp.asarray(np.random.default_rng(1).normal(size=ys.shape), ys.dtype)
    r_tan = jnp.asarray(
        np.abs(np.random.default_rng(2).normal(size=r.shape)) * 0.1, r.dtype
    )
    v, g = jax.jvp(lambda y, rr: loss(fused, y, rr), (ys, r), (y_tan, r_tan))
    v_ref, g_ref = jax.jvp(
        lambda y, rr: loss(staged, y, rr), (ys, r), (y_tan, r_tan)
    )
    np.testing.assert_allclose(float(v), float(v_ref), rtol=2e-5)
    np.testing.assert_allclose(float(g), float(g_ref), rtol=2e-4)


@pytest.mark.slow
def test_pupil_adam_trajectory_through_fused_tv_kernel():
    """The pupil optimizer's fused loss+grad (the 2-lane paired-kernel jvp
    that _pupil_optimize_jit(fused=True) evaluates each Adam step) must
    reproduce the generic AoS loss's Adam trajectory step for step.

    The loop runs HOST-side over a per-step jitted loss: forcing the fused
    kernel inside the jitted while-loop program on XLA:CPU is the exact
    LLVM compile explosion CLAUDE.md bans from CPU tests (the TPU product
    path compiles the real kernel, exercised by the bench)."""
    import optax

    from eks_tpu.models.ibl_pupil import PUPIL_C, _pupil_model
    from eks_tpu.ops.pallas_nll import filter_nll_fused_tv_batched
    from eks_tpu.ops.pkalman import kalman_filter_parallel

    rng = np.random.default_rng(43)
    T = 200  # shares the paired-kernel executable with the O=8 jvp test
    ys = jnp.asarray((rng.normal(size=(T, 8)).cumsum(0) * 0.05), jnp.float32)
    r = jnp.asarray(np.abs(rng.normal(size=(T, 8))) * 0.2 + 0.05, jnp.float32)
    C = jnp.asarray(PUPIL_C, jnp.float32)
    m0 = jnp.array([10.0, 0.0, 0.0], jnp.float32)
    S0 = jnp.asarray(np.diag([1.0, 0.5, 0.5]), jnp.float32)
    dvar, xvar, yvar = 1.0, 0.5, 0.5
    eps = 1e-3

    @jax.jit
    def lg_fused(u):
        two = lambda a: jnp.broadcast_to(a[None], (2,) + a.shape)

        def nll2(u2):
            s2 = jax.nn.sigmoid(u2) * (1.0 - 2 * eps) + eps
            A2, Q2 = jax.vmap(
                lambda s: _pupil_model(s[0], s[1], dvar, xvar, yvar)
            )(s2)
            lls = filter_nll_fused_tv_batched(
                two(ys), two(m0), two(S0), A2, Q2, two(C), two(r),
                interpret=True,
            )
            return jnp.where(jnp.isfinite(-lls), -lls, 1e12)

        losses, grads = jax.jvp(nll2, (two(u),), (jnp.eye(2, dtype=u.dtype),))
        return losses[0], grads

    @jax.jit
    def lg_plain(u):
        def nll(u_):
            s = jax.nn.sigmoid(u_) * (1.0 - 2 * eps) + eps
            A, Q = _pupil_model(s[0], s[1], dvar, xvar, yvar)
            res = kalman_filter_parallel(ys, m0, S0, A, Q, C, r)
            return jnp.where(
                jnp.isfinite(-res.log_likelihood), -res.log_likelihood, 1e12
            )

        tangents = jnp.eye(2, dtype=u.dtype)
        losses, grads = jax.vmap(lambda t: jax.jvp(nll, (u,), (t,)))(tangents)
        return losses[0], grads

    def run(lg, steps=5):
        opt = optax.adam(5e-3)
        u = jnp.array([4.59512, 3.89182], jnp.float32)  # sigmoid ~ [.99, .98]
        state = opt.init(u)
        traj = []
        for _ in range(steps):
            loss, grad = lg(u)
            updates, state = opt.update(grad, state)
            u = optax.apply_updates(u, updates)
            traj.append((float(loss), np.asarray(u)))
        return traj

    for (l_f, u_f), (l_p, u_p) in zip(run(lg_fused), run(lg_plain)):
        np.testing.assert_allclose(l_f, l_p, rtol=1e-5)
        np.testing.assert_allclose(u_f, u_p, rtol=1e-4, atol=1e-5)
