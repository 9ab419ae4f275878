"""Pallas fused prefix-scan filter: parity with the XLA parallel filter.

The large interpret-mode cases run in fresh subprocesses: interpret-mode
Pallas programs at T >= 1k segfault the shared pytest process once ~100+
earlier tests have populated the XLA CPU client (reproduced repeatedly at
the same point; passes in isolation at any T). A small case stays
in-process so the kernel logic is exercised inside the suite itself.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from eks_tpu.ops.kalman import kalman_filter
from eks_tpu.ops.pallas_filter import kalman_filter_pallas

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _problem(rng, T):
    A = 0.95 * np.eye(2)
    Q = 0.3 * np.eye(2)
    C = np.eye(2)
    m0 = rng.normal(size=2)
    S0 = np.diag(rng.uniform(0.5, 2.0, 2))
    r = rng.uniform(0.05, 2.0, size=(T, 2))
    ys = rng.normal(size=(T, 2)).cumsum(axis=0) * 0.1
    return [jnp.asarray(a, dtype=jnp.float32) for a in (ys, m0, S0, A, Q, C, r)]


def run_parity(T: int) -> None:
    """Assert pallas-vs-sequential parity for one problem size (also the
    subprocess entry point)."""
    rng = np.random.default_rng(0)
    ys, m0, S0, A, Q, C, r = _problem(rng, T)
    ref = kalman_filter(ys, m0, S0, A, Q, C=C, r_diag=r)
    out = kalman_filter_pallas(ys, m0, S0, A, Q, C, r, interpret=True)
    np.testing.assert_allclose(
        float(out.log_likelihood), float(ref.log_likelihood), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.filtered_means), np.asarray(ref.filtered_means), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.filtered_covs), np.asarray(ref.filtered_covs), atol=2e-3
    )


def _run_parity_isolated(T: int) -> None:
    script = (
        "import os; os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from tests.test_pallas_filter import run_parity\n"
        f"run_parity({T})\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"isolated parity run failed:\n{proc.stderr[-2000:]}"


def test_pallas_matches_sequential_small():
    # in-process: small T is stable regardless of prior suite state
    run_parity(256)


@pytest.mark.parametrize("T", [1000, 4096])
def test_pallas_matches_sequential_large_isolated(T):
    _run_parity_isolated(T)


def test_pallas_handles_unaligned_T(rng):
    # T not a multiple of 128: identity-element padding must be neutral
    ys, m0, S0, A, Q, C, r = _problem(rng, 300)
    ref = kalman_filter(ys, m0, S0, A, Q, C=C, r_diag=r)
    out = kalman_filter_pallas(ys, m0, S0, A, Q, C, r, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.filtered_means), np.asarray(ref.filtered_means), atol=2e-3
    )
    np.testing.assert_allclose(
        float(out.log_likelihood), float(ref.log_likelihood), rtol=2e-4
    )


# ------------------------------------------------------------------ #
# smoother kernel, D=3 shapes, custom JVP, dispatch
# ------------------------------------------------------------------ #
def _problem_d3(rng, T, O=8):
    # pupil-like: D=3 latent, O=8 observations
    A = np.diag([0.99, 0.98, 0.98])
    Q = np.diag([0.5, 0.2, 0.2])
    C = rng.normal(size=(O, 3))
    m0 = rng.normal(size=3)
    S0 = np.diag(rng.uniform(0.5, 2.0, 3))
    r = rng.uniform(0.05, 2.0, size=(T, O))
    ys = rng.normal(size=(T, O)).cumsum(axis=0) * 0.05
    return [jnp.asarray(a, dtype=jnp.float32) for a in (ys, m0, S0, A, Q, C, r)]


def test_pallas_smoother_matches_sequential():
    from eks_tpu.ops.kalman import kalman_smoother
    from eks_tpu.ops.pallas_filter import kalman_smoother_pallas

    rng = np.random.default_rng(1)
    ys, m0, S0, A, Q, C, r = _problem(rng, 300)
    ref = kalman_smoother(ys, m0, S0, A, Q, C=C, r_diag=r)
    out = kalman_smoother_pallas(ys, m0, S0, A, Q, C, r, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.smoothed_means), np.asarray(ref.smoothed_means), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.smoothed_covs), np.asarray(ref.smoothed_covs), atol=2e-3
    )


@pytest.mark.slow  # ~45s of interpret-mode runtime; the D=3/O=8 kernel
# also runs on real TPU hardware every bench round
def test_pallas_d3_o8_pupil_shapes():
    from eks_tpu.ops.kalman import kalman_smoother
    from eks_tpu.ops.pallas_filter import kalman_smoother_pallas

    rng = np.random.default_rng(2)
    ys, m0, S0, A, Q, C, r = _problem_d3(rng, 257)  # unaligned T too
    ref = kalman_smoother(ys, m0, S0, A, Q, C=C, r_diag=r)
    out = kalman_smoother_pallas(ys, m0, S0, A, Q, C, r, interpret=True)
    np.testing.assert_allclose(
        float(out.log_likelihood), float(ref.log_likelihood), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.smoothed_means), np.asarray(ref.smoothed_means), atol=5e-3
    )


def test_pallas_custom_jvp_matches_sequential_grad():
    """d(NLL)/d(log s) through the fused kernel == through the lax.scan
    filter: what core._optimize_blocks needs to consume the Pallas path."""
    import jax

    from eks_tpu.ops.pallas_filter import kalman_filter_pallas

    rng = np.random.default_rng(3)
    ys, m0, S0, A, Q, C, r = _problem(rng, 256)

    def nll_pallas(s_log):
        s = jnp.exp(s_log)
        return -kalman_filter_pallas(
            ys, m0, S0, A, s * Q, C, r, interpret=True
        ).log_likelihood

    def nll_seq(s_log):
        s = jnp.exp(s_log)
        return -kalman_filter(ys, m0, S0, A, s * Q, C=C, r_diag=r).log_likelihood

    x = jnp.asarray(0.3, jnp.float32)
    v, g = jax.jvp(nll_pallas, (x,), (jnp.ones_like(x),))
    v2, g2 = jax.jvp(nll_seq, (x,), (jnp.ones_like(x),))
    np.testing.assert_allclose(float(v), float(v2), rtol=2e-4)
    np.testing.assert_allclose(float(g), float(g2), rtol=5e-3)


@pytest.mark.slow  # dispatch flags are exercised throughout the plane
# tests; this explicit ~30s pin stays in the slow tier
def test_pallas_dispatch_via_force_flag():
    """kalman_smoother_parallel routes through the fused kernel under
    force_pallas_scan and still matches its own XLA path."""
    from eks_tpu.ops.pallas_filter import force_pallas_scan
    from eks_tpu.ops.pkalman import kalman_smoother_parallel

    rng = np.random.default_rng(4)
    ys, m0, S0, A, Q, C, r = _problem(rng, 200)
    base = kalman_smoother_parallel(ys, m0, S0, A, Q, C, r)
    with force_pallas_scan(True):
        fused = kalman_smoother_parallel(ys, m0, S0, A, Q, C, r)
    np.testing.assert_allclose(
        np.asarray(fused.smoothed_means), np.asarray(base.smoothed_means),
        atol=2e-3,
    )
    np.testing.assert_allclose(
        float(fused.log_likelihood), float(base.log_likelihood), rtol=2e-4
    )
