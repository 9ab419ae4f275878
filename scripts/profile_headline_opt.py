"""Where does the headline optimizer stage's wall time go on the ambient
accelerator? Splits optimize_smooth_param into (a) eager prep dispatches,
(b) the jitted joint loop, (c) the result pull, each fenced by a small-result
device_get (the only reliable completion signal over the tunnel)."""

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

from eks_tpu import core

K, T, O, D = 20, 10000, 2, 2
SEEDS = 5

rng = np.random.default_rng(0)
ys_np = (rng.normal(size=(K, T, O)).cumsum(axis=1) * 0.1).astype(np.float32)
ev_np = (np.abs(rng.normal(size=(T, K, O))) * 0.5 + 0.2).astype(np.float32)

ys = jnp.asarray(ys_np)
ens_vars = jnp.asarray(ev_np)
eye = jnp.asarray(np.tile(np.eye(2, dtype=np.float32), (K, 1, 1)))
m0s = jnp.zeros((K, 2), np.float32)
S0s = eye * 1.3
s_guess = jnp.full(K, 2.0)
jax.device_get(ys[0, :1])  # fence uploads

print(f"backend: {jax.default_backend()}")


def full_once():
    t0 = time.perf_counter()
    s_dev = core.optimize_smooth_param(
        ys=ys, m0s=m0s, S0s=S0s, As=eye, Cs=eye, Qs=eye,
        ensemble_vars=ens_vars, blocks=None, s_frames=None,
        s_guess_per_k=s_guess, safety_cap=300, return_device=True,
    )
    np.asarray(s_dev)
    return time.perf_counter() - t0


full_once()
print(f"full optimize+pull: {min(full_once() for _ in range(3)) * 1e3:.1f} ms")


# tunnel round-trip latency
def rt():
    t0 = time.perf_counter()
    jax.device_get(ys[0, :1])
    return time.perf_counter() - t0


print(f"roundtrip: {min(rt() for _ in range(5)) * 1e3:.1f} ms")

# prep only: constant R + gathers + s init, fence with tiny pull
idx = np.arange(K)[:, None]
mask_np = np.ones((K, 1))


def prep_once():
    t0 = time.perf_counter()
    r_const = core._device_constant_r(jnp.swapaxes(ens_vars, 0, 1), 1e-4)
    gB = s_guess[jnp.asarray(idx)]
    mB = jnp.asarray(mask_np, dtype=gB.dtype)
    s0 = jnp.sum(gB * mB, axis=1) / jnp.sum(mB, axis=1)
    s_log_init = jnp.log(jnp.clip(s0, 1e-6, 1e3))
    jidx = jnp.asarray(idx)
    ops = [a[jidx] for a in (ys, r_const, m0s, S0s, eye, eye, eye)]
    jax.device_get(s_log_init[:1])
    jax.device_get(ops[0][0, 0, :1])
    return time.perf_counter() - t0


prep_once()
print(f"prep (eager gathers + median) + fence: {min(prep_once() for _ in range(3)) * 1e3:.1f} ms")

# the jitted loop alone on pre-gathered operands
r_const = core._device_constant_r(jnp.swapaxes(ens_vars, 0, 1), 1e-4)
jidx = jnp.asarray(idx)
yB, rB, m0B, S0B, AB, QB, CB = (
    ys[jidx], r_const[jidx], m0s[jidx], S0s[jidx], eye[jidx], eye[jidx], eye[jidx]
)
maskB = jnp.asarray(mask_np)
s_log0 = jnp.log(jnp.full(K, 2.0, ys.dtype))
jax.device_get(yB[0, 0, :1])


def loop_once():
    t0 = time.perf_counter()
    s_log_f, last_loss, iters = core._optimize_blocks(
        yB, rB, m0B, S0B, AB, QB, CB, maskB, s_log0,
        h_fn=None, sequential=False, lr=0.25, s_lo=-8.0, s_hi=8.0,
        tol=1e-2, safety_cap=300, joint=core._plane_opt_enabled(None),
    )
    it = int(np.max(jax.device_get(iters)))
    return time.perf_counter() - t0, it


loop_once()
times = [loop_once() for _ in range(3)]
el, it = min(times)
print(f"jitted loop + pull: {el * 1e3:.1f} ms ({it} iters, "
      f"{el * 1e3 / max(it, 1):.3f} ms/iter incl. pull)")
