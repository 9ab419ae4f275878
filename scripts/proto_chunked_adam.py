"""Prototype: chunked fori_loop Adam (masked updates) vs the per-iteration
while_loop, on the real pupil problem shapes. Iterates are IDENTICAL by
construction (steps after the stop rule fires are masked out); the question
is only the per-iteration overhead. Run on the ambient TPU env.
"""

import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from eks_tpu.models.ibl_pupil import PUPIL_C, _pupil_model  # noqa: E402
from eks_tpu.ops.linalg import highest_precision  # noqa: E402
from scripts.profile_pupil_iter import problem  # noqa: E402

T = 10_000


@partial(jax.jit, static_argnames=("lr", "tol", "safety_cap", "chunk", "unroll"))
@highest_precision
def chunked_opt(y_loss, r_loss, m0, S0, C, u0, diameters_var, x_var, y_var,
                lr, tol, safety_cap, chunk, unroll):
    eps = 1e-3

    def to_s(u):
        return jax.nn.sigmoid(u) * (1.0 - 2 * eps) + eps

    def loss_and_grad_fused(u):
        from eks_tpu.ops.pallas_nll import filter_nll_fused_tv_batched

        two = lambda a: jnp.broadcast_to(a[None], (2,) + a.shape)

        def nll2(u2):
            s2 = jax.nn.sigmoid(u2) * (1.0 - 2 * eps) + eps
            A2, Q2 = jax.vmap(
                lambda s: _pupil_model(s[0], s[1], diameters_var, x_var, y_var)
            )(s2)
            lls = filter_nll_fused_tv_batched(
                two(y_loss), two(m0), two(S0), A2, Q2, two(C), two(r_loss),
                interpret=False,
            )
            return jnp.where(jnp.isfinite(-lls), -lls, 1e12)

        losses, grads = jax.jvp(nll2, (two(u),), (jnp.eye(2, dtype=u.dtype),))
        return losses[0], grads

    opt = optax.adam(lr)
    opt_state0 = opt.init(u0)

    def step(carry, _):
        u, opt_state, prev_loss, iters, done = carry
        live = jnp.logical_and(~done, iters < safety_cap)
        loss, grad = loss_and_grad_fused(u)
        updates, new_state = opt.update(grad, opt_state)
        new_u = optax.apply_updates(u, updates)
        rel_tol = tol * jnp.abs(jnp.log(jnp.maximum(prev_loss, 1e-12)))
        new_done = jnp.where(
            jnp.isfinite(prev_loss),
            jnp.abs(loss - prev_loss) < (rel_tol + 1e-6),
            False,
        )
        sel = lambda a, b: jnp.where(live, a, b)
        u = jax.tree_util.tree_map(sel, new_u, u)
        opt_state = jax.tree_util.tree_map(sel, new_state, opt_state)
        prev_loss = jnp.where(live, loss, prev_loss)
        iters = jnp.where(live, iters + 1, iters)
        done = jnp.where(live, new_done, done)
        return (u, opt_state, prev_loss, iters, done), None

    def outer_cond(carry):
        _, _, _, iters, done = carry
        return jnp.logical_and(~done, iters < safety_cap)

    def outer_body(carry):
        carry, _ = lax.scan(step, carry, None, length=chunk, unroll=unroll)
        return carry

    u_f, _, last_loss, iters_f, _ = lax.while_loop(
        outer_cond, outer_body,
        (u0, opt_state0, jnp.inf, jnp.array(0), jnp.array(False)),
    )
    return to_s(u_f), last_loss, iters_f


def run(fn, y, r, m0, S0, cap, **kw):
    u0 = np.log(np.array([0.99, 0.98]) / (1 - np.array([0.99, 0.98])))
    t0 = time.perf_counter()
    s, loss, iters = fn(
        jnp.asarray(y), jnp.asarray(r), jnp.asarray(m0), jnp.asarray(S0),
        jnp.asarray(PUPIL_C), jnp.asarray(u0),
        jnp.asarray(25.0), jnp.asarray(4.0), jnp.asarray(4.0),
        **kw,
    )
    it = int(iters)
    return time.perf_counter() - t0, it, np.asarray(s), float(loss)


def main():
    rng = np.random.default_rng(0)
    y, r, m0, S0 = problem(rng)

    from eks_tpu.models.ibl_pupil import _pupil_optimize_jit

    def base(yj, rj, m0j, S0j, Cj, u0j, dv, xv, yv, lr, tol, safety_cap):
        return _pupil_optimize_jit(
            yj, rj, m0j, S0j, Cj, u0j, diameters_var=dv, x_var=xv, y_var=yv,
            lr=lr, tol=tol, safety_cap=safety_cap, plane=False, fused=True,
        )

    for chunk, unroll in [(8, 1), (16, 1), (16, 4), (32, 1), (32, 8), (64, 1)]:
        fn = lambda *a, **k: chunked_opt(*a, chunk=chunk, unroll=unroll, **k)
        run(fn, y, r, m0, S0, 400, lr=5e-3, tol=0.0, safety_cap=400)  # warm
        t, it, s, ll = min(
            (run(fn, y, r, m0, S0, 400, lr=5e-3, tol=0.0, safety_cap=400)
             for _ in range(3)),
            key=lambda x: x[0],
        )
        print(f"chunk={chunk} unroll={unroll}: {t:.4f}s  iters={it}  "
              f"({t / it * 1e6:.1f} us/iter)  s={s}")

    run(base, y, r, m0, S0, 400, lr=5e-3, tol=0.0, safety_cap=400)
    t, it, s, ll = min(
        (run(base, y, r, m0, S0, 400, lr=5e-3, tol=0.0, safety_cap=400)
         for _ in range(3)),
        key=lambda x: x[0],
    )
    print(f"baseline while: {t:.4f}s  iters={it}  ({t / it * 1e6:.1f} us/iter)  s={s}")

    # iterate parity at a real tolerance (early stop mid-chunk)
    fn = lambda *a, **k: chunked_opt(*a, chunk=32, unroll=8, **k)
    tb, ib, sb, llb = run(base, y, r, m0, S0, 5000, lr=5e-3, tol=1e-6,
                          safety_cap=5000)
    tc, ic, sc, llc = run(fn, y, r, m0, S0, 5000, lr=5e-3, tol=1e-6,
                          safety_cap=5000)
    print(f"parity: base iters={ib} s={sb} | chunked iters={ic} s={sc} "
          f"| equal={np.array_equal(sb, sc)} loss_eq={llb == llc}")
    print(f"convergence timing: base {tb:.3f}s chunked {tc:.3f}s")


if __name__ == "__main__":
    main()
