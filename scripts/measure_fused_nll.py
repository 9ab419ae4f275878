"""Measure the joint s-optimizer loop at the headline shape (K=20 lanes,
T=10k, D=2, O=2) on the ambient accelerator: fused single-kernel NLL vs the
staged plane pipeline. Prints ms per joint loop iteration for both."""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from eks_tpu.core import _optimize_blocks, force_plane_opt
from eks_tpu.ops.pallas_nll import force_fused_nll

K, T, O, D = 20, 10000, 2, 2
CAP = 50

rng = np.random.default_rng(0)
ys = (rng.normal(size=(K, 1, T, O)).cumsum(axis=2) * 0.1).astype(np.float32)
r = (np.abs(rng.normal(size=(K, 1, O))) * 0.5 + 0.2).astype(np.float32)
m0 = np.zeros((K, 1, D), np.float32)
eye = np.tile(np.eye(D, dtype=np.float32), (K, 1, 1, 1))
S0, A, Q, C = eye * 1.3, eye.copy(), eye * 0.7, eye.copy()
mask = np.ones((K, 1), np.float32)
s0 = np.zeros((K,), np.float32)

dev_args = [jnp.asarray(a) for a in (ys, r, m0, S0, A, Q, C, mask, s0)]


def run(fused: bool):
    jax.clear_caches()  # dispatch is a trace-time signal; force a re-trace
    with force_plane_opt(True), force_fused_nll(fused):
        for tag in ("warmup", "timed"):
            t0 = time.perf_counter()
            s_log, loss, iters = _optimize_blocks(
                *dev_args, joint=True, safety_cap=CAP, tol=1e-12
            )
            it = int(np.max(jax.device_get(iters)))
            el = time.perf_counter() - t0
            print(
                f"  fused={fused} {tag}: {el:.3f}s total, {it} iters, "
                f"{1e3 * el / max(it, 1):.3f} ms/iter"
            )
    return el, it


print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
print("staged plane pipeline:")
e0, i0 = run(False)
print("fused single kernel:")
e1, i1 = run(True)
print(f"speedup on the loop: {(e0 / i0) / (e1 / i1):.2f}x")
