"""Mesh sharding: multi-device smoothing step on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eks_tpu.core import run_kalman_smoother
from eks_tpu.parallel import make_mesh, optimize_and_smooth_sharded


def _toy(rng, K, T=80, O=2, D=2):
    ys = rng.normal(size=(K, T, O)).cumsum(axis=1) * 0.1
    ev = np.abs(rng.normal(size=(K, T, O))) * 0.2 + 0.05
    eye = np.tile(np.eye(D), (K, 1, 1))
    m0s = np.zeros((K, D))
    S0s = eye.copy()
    return ys, m0s, S0s, eye, eye, eye, ev


def test_mesh_creation():
    mesh = make_mesh()
    assert int(np.prod(mesh.devices.shape)) == len(jax.devices())
    mesh4 = make_mesh(4)
    assert int(np.prod(mesh4.devices.shape)) == 4


@pytest.mark.parametrize("K", [8, 5])  # even and uneven (padding) cases
def test_sharded_matches_single_device(rng, K):
    ys, m0s, S0s, As, Qs, Cs, ev = _toy(rng, K)
    mesh = make_mesh(4)
    s_sh, ms_sh, Vs_sh = optimize_and_smooth_sharded(
        ys, m0s, S0s, As, Qs, Cs, ev, mesh=mesh
    )
    # single-device core path with matching optimizer configuration
    s_ref, ms_ref, Vs_ref = run_kalman_smoother(
        jnp.asarray(ys), jnp.asarray(m0s), jnp.asarray(S0s), jnp.asarray(As),
        jnp.asarray(Cs), jnp.asarray(Qs), np.swapaxes(ev, 0, 1),
        smooth_param=list(map(float, s_sh)),
    )
    assert s_sh.shape == (K,)
    assert np.isfinite(s_sh).all() and (s_sh > 0).all()
    np.testing.assert_allclose(ms_sh, ms_ref, atol=1e-4)
    np.testing.assert_allclose(Vs_sh, Vs_ref, atol=1e-4)


def test_sharded_outputs_are_distributed(rng):
    ys, m0s, S0s, As, Qs, Cs, ev = _toy(rng, 8)
    mesh = make_mesh(8)
    s, ms, Vs = optimize_and_smooth_sharded(ys, m0s, S0s, As, Qs, Cs, ev, mesh=mesh)
    assert ms.shape == (8, 80, 2)
    assert np.isfinite(ms).all()


def test_time_axis_sharded_smoother_matches(rng):
    from eks_tpu.ops.kalman import kalman_smoother
    from eks_tpu.parallel.mesh import smooth_time_sharded

    T = 512
    ys = (rng.normal(size=(T, 2)).cumsum(0) * 0.1).astype(np.float32)
    r = rng.uniform(0.1, 1.0, (T, 2)).astype(np.float32)
    m0 = np.zeros(2, np.float32)
    S0 = np.eye(2, dtype=np.float32)
    A = (0.95 * np.eye(2)).astype(np.float32)
    Q = (0.3 * np.eye(2)).astype(np.float32)
    C = np.eye(2, dtype=np.float32)

    mesh = make_mesh(8)
    ll, sm, sP = smooth_time_sharded(ys, m0, S0, A, Q, C, r, mesh=mesh)

    ref = kalman_smoother(
        jnp.asarray(ys), jnp.asarray(m0), jnp.asarray(S0), jnp.asarray(A),
        jnp.asarray(Q), C=jnp.asarray(C), r_diag=jnp.asarray(r),
    )
    np.testing.assert_allclose(float(ll), float(ref.log_likelihood), rtol=1e-4)
    np.testing.assert_allclose(sm, np.asarray(ref.smoothed_means), atol=2e-3)
    np.testing.assert_allclose(sP, np.asarray(ref.smoothed_covs), atol=2e-3)


def test_time_axis_sharding_requires_divisible_T(rng):
    from eks_tpu.parallel.mesh import smooth_time_sharded

    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="divisible"):
        smooth_time_sharded(
            np.zeros((100, 2), np.float32), np.zeros(2, np.float32),
            np.eye(2, dtype=np.float32), np.eye(2, dtype=np.float32),
            np.eye(2, dtype=np.float32), np.eye(2, dtype=np.float32),
            np.ones((100, 2), np.float32), mesh=mesh,
        )


def test_devices_flag_in_run_kalman_smoother(rng):
    """run_kalman_smoother(devices=8) must agree with the single-device run:
    the product-facing multi-chip path (VERDICT round-1 item 8)."""
    from eks_tpu.core import run_kalman_smoother

    K, T = 5, 120  # K not a multiple of 8: exercises padding
    eye = np.tile(np.eye(2), (K, 1, 1))
    ys = rng.normal(size=(K, T, 2)).cumsum(axis=1).astype(np.float32) * 0.1
    ev = np.abs(rng.normal(size=(T, K, 2))).astype(np.float32) + 0.05
    args = dict(
        m0s=np.zeros((K, 2)), S0s=eye.copy(), As=eye.copy(),
        Cs=eye.copy(), Qs=eye.copy(), ensemble_vars=ev,
    )
    s1, m1, v1 = run_kalman_smoother(ys=ys, **args)
    s8, m8, v8 = run_kalman_smoother(ys=ys, **args, devices=8)
    np.testing.assert_allclose(s8, s1, rtol=1e-4)
    np.testing.assert_allclose(m8, m1, atol=1e-4)
    np.testing.assert_allclose(v8, v1, atol=1e-4)
    assert m8.shape == (K, T, 2)


def test_devices_flag_cli_singlecam(tmp_path, rng):
    """One user-facing command exercising DP sharding end-to-end on the
    8-device CPU mesh."""
    import sys
    from unittest import mock

    import pandas as pd

    from eks_tpu.cli.main import main

    kps = ["a", "b", "c"]
    cols = pd.MultiIndex.from_product(
        [["m"], kps, ["x", "y", "likelihood"]],
        names=["scorer", "bodyparts", "coords"],
    )
    for i in range(3):
        df = pd.DataFrame(
            rng.random((60, len(kps) * 3)).astype(np.float32), columns=cols
        )
        df.to_csv(tmp_path / f"preds.rng={i}.csv")

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for f in tmp_path.glob("*.csv"):
        f.rename(in_dir / f.name)
    for n_dev, out in [(None, "one.csv"), (8, "mesh.csv")]:
        argv = [
            "eks-tpu", "singlecam",
            "--input-dir", str(in_dir),
            "--save-dir", str(tmp_path),
            "--save-filename", out,
            "--s", "2.0",
        ] + ([] if n_dev is None else ["--devices", str(n_dev)])
        with mock.patch.object(sys, "argv", argv):
            main()
    one = pd.read_csv(tmp_path / "one.csv", header=[0, 1, 2], index_col=0)
    mesh = pd.read_csv(tmp_path / "mesh.csv", header=[0, 1, 2], index_col=0)
    np.testing.assert_allclose(
        mesh.to_numpy(), one.to_numpy(), rtol=0, atol=1e-4
    )


def test_time_partition_through_driver(rng):
    """run_kalman_smoother(partition='time') — the product sequence-parallel
    path — agrees with the single-device run through optimizer + final pass."""
    from eks_tpu.core import run_kalman_smoother

    K, T = 2, 256
    eye = np.tile(np.eye(2), (K, 1, 1))
    ys = rng.normal(size=(K, T, 2)).cumsum(axis=1).astype(np.float32) * 0.1
    ev = np.abs(rng.normal(size=(T, K, 2))).astype(np.float32) + 0.05
    args = dict(
        m0s=np.zeros((K, 2)), S0s=eye.copy(), As=eye.copy(),
        Cs=eye.copy(), Qs=eye.copy(), ensemble_vars=ev,
    )
    s1, m1, v1 = run_kalman_smoother(ys=ys, **args)
    st, mt, vt = run_kalman_smoother(ys=ys, **args, devices=8, partition="time")
    np.testing.assert_allclose(st, s1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mt), np.asarray(m1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(vt), np.asarray(v1), atol=2e-3)


def test_time_partition_rejects_unknown(rng):
    from eks_tpu.core import run_kalman_smoother

    with pytest.raises(ValueError, match="partition"):
        run_kalman_smoother(
            ys=np.zeros((1, 8, 2), np.float32), m0s=np.zeros((1, 2)),
            S0s=np.eye(2)[None], As=np.eye(2)[None], Cs=np.eye(2)[None],
            Qs=np.eye(2)[None], ensemble_vars=np.ones((8, 1, 2), np.float32),
            devices=8, partition="banana",
        )


def test_devices_with_forced_pallas(rng):
    """The fused Pallas kernels now run under the mesh (shard_map maps them
    per-device, so no SPMD partitioning of the pallas_call is needed);
    interpret mode stands in for the TPU compile on the CPU test mesh."""
    from eks_tpu.core import run_kalman_smoother
    from eks_tpu.ops.pallas_filter import force_pallas_scan

    K, T = 5, 120
    eye = np.tile(np.eye(2), (K, 1, 1))
    ys = rng.normal(size=(K, T, 2)).cumsum(axis=1).astype(np.float32) * 0.1
    ev = np.abs(rng.normal(size=(T, K, 2))).astype(np.float32) + 0.05
    args = dict(
        m0s=np.zeros((K, 2)), S0s=eye.copy(), As=eye.copy(),
        Cs=eye.copy(), Qs=eye.copy(), ensemble_vars=ev,
    )
    s1, m1, v1 = run_kalman_smoother(ys=ys, **args)
    with force_pallas_scan(True):
        s8, m8, v8 = run_kalman_smoother(ys=ys, **args, devices=8)
    np.testing.assert_allclose(s8, s1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(m8), np.asarray(m1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v8), np.asarray(v1), atol=1e-4)


def test_devices_with_correlated_blocks(rng):
    """Mesh sharding composes with multi-member block structures (the padded
    block axis is what gets sharded)."""
    from eks_tpu.core import run_kalman_smoother

    K, T = 5, 80
    eye = np.tile(np.eye(2), (K, 1, 1))
    ys = rng.normal(size=(K, T, 2)).cumsum(axis=1).astype(np.float32) * 0.1
    ev = np.abs(rng.normal(size=(T, K, 2))).astype(np.float32) + 0.05
    blocks = [[0, 2], [1], [3, 4]]
    args = dict(
        m0s=np.zeros((K, 2)), S0s=eye.copy(), As=eye.copy(),
        Cs=eye.copy(), Qs=eye.copy(), ensemble_vars=ev, blocks=blocks,
    )
    s1, m1, _ = run_kalman_smoother(ys=ys, **args)
    s8, m8, _ = run_kalman_smoother(ys=ys, **args, devices=8)
    assert s1[0] == s1[2] and s1[3] == s1[4]  # members share s
    np.testing.assert_allclose(s8, s1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(m8), np.asarray(m1), atol=1e-4)
