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
        (9, 130, 4, 3),     # multicam-linear shape (2 cams), N % 8 != 0
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


def test_joint_optimizer_through_fused_kernel():
    """The joint s-optimizer converges to the same s through the fused
    kernel as through the staged plane pipeline."""
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
