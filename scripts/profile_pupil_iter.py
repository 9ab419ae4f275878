"""Per-iteration cost of the pupil joint Adam loop on the TPU (VERDICT r4
item 6): slope between two forced iteration caps isolates the steady-state
per-iter cost from compile/dispatch/transfer, and a single fused-kernel eval
gives the kernel's own share.

Run with the ambient TPU env: python scripts/profile_pupil_iter.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from eks_tpu.models.ibl_pupil import PUPIL_C, _pupil_optimize_jit  # noqa: E402
from eks_tpu.ops.pallas_nll import _use_fused_nll_tv  # noqa: E402

T = 10_000


def problem(rng):
    """Delegates to the bench's canonical builder so the script and the
    bench roofline always measure the same problem."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_for_problem", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._synthetic_pupil_problem(rng, T)


def run(y, r, m0, S0, cap, fused):
    u0 = np.log(np.array([0.99, 0.98]) / (1 - np.array([0.99, 0.98])))
    t0 = time.perf_counter()
    s, loss, iters = _pupil_optimize_jit(
        jnp.asarray(y), jnp.asarray(r), jnp.asarray(m0), jnp.asarray(S0),
        jnp.asarray(PUPIL_C), jnp.asarray(u0),
        diameters_var=jnp.asarray(25.0), x_var=jnp.asarray(4.0),
        y_var=jnp.asarray(4.0),
        lr=5e-3, tol=0.0, safety_cap=cap, plane=False, fused=fused,
    )
    it = int(iters)  # pull fences completion
    return time.perf_counter() - t0, it


def main():
    rng = np.random.default_rng(0)
    y, r, m0, S0 = problem(rng)
    fused = _use_fused_nll_tv(3, 8, T)
    print("fused kernel path:", fused)

    for cap in (100, 400):
        run(y, r, m0, S0, cap, fused)  # compile + warm
    for cap in (100, 400):
        times = [run(y, r, m0, S0, cap, fused) for _ in range(3)]
        best = min(t for t, _ in times)
        print(f"cap={cap}: best {best:.4f}s  iters={times[0][1]}")
    t100 = min(run(y, r, m0, S0, 100, fused)[0] for _ in range(3))
    t400 = min(run(y, r, m0, S0, 400, fused)[0] for _ in range(3))
    per_iter = (t400 - t100) / 300
    print(f"per-iteration (slope): {per_iter * 1e6:.1f} us")
    print(f"fixed overhead (extrapolated to 0 iters): {t100 - 100 * per_iter:.4f}s")


if __name__ == "__main__":
    main()
