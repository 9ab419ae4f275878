"""Fully fused Pallas loss kernel for the s-optimizer: element build +
parallel-prefix scan + Gaussian-likelihood epilogue in ONE kernel.

The lane-batched plane pipeline (ops/pkalman.py:filter_nll_parallel_planes_
batched) materializes the (N, P, T) element table in HBM, scans it through
the Pallas prefix kernel (read + write), then streams the filtered-moment
planes back through the XLA epilogue — three T-sized HBM passes over
P = 3D² + 2D planes per lane (doubled again under the optimizer's jvp).
This kernel keeps everything T-sized in VMEM: the only tensor that ever
touches HBM is the raw observation planes (O per lane, O << P) plus a
per-lane scalar table; the output is one number per lane.

Recompute-instead-of-store structure (constant diagonal R, D <= 3):

  pass 1   sequential fori over the L rows of the (L, NC) time layout
           (t = c·L + i): build each row's filtering element on the fly
           from the y planes and the per-lane scalar table (every element
           matrix is time-invariant when R is constant — only b and eta
           depend on y_t), combine into the NC per-chunk totals. Nothing
           is stored.
  phase 2  log2(NC)-step shift-and-combine sweep over the chunk totals —
           exclusive chunk prefixes (same as ops/pallas_filter.py).
  pass 3   rebuild the rows, carry combine(excl, within-chunk prefix)
           incrementally. The carry BEFORE absorbing row i is exactly the
           filtered posterior at t-1 (at a chunk start it is the exclusive
           chunk prefix itself), so the one-step predictive moments, the
           unrolled innovation Cholesky, and the per-step log-density are
           evaluated in place and accumulated — no filtered moments are
           ever written out.

Differentiation: a ``custom_jvp`` (symbolic-zero aware) reruns the same
kernel on a paired scalar table — the per-row build, the combine, and the
epilogue are each JVP-extended with ``jax.jvp`` over (primal, tangent)
plane tuples, the same trick as ops/pallas_filter.py's paired algebra. The
optimizer differentiates only through the process-noise scale s, which
enters exclusively via the scalar table (observations carry a symbolic-zero
tangent), so the y planes never need pairing.

Replaces the reference's optimizer hot loop (dynamax EKF NLL inside
value_and_grad inside lax.while_loop, eks/core.py:450-517,640-687).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax, vmap
from jax.custom_derivatives import SymbolicZero
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eks_tpu.ops.linalg import highest_precision, psd_solve
from eks_tpu.ops.pallas_filter import NC, _filter_algebra, _paired_algebra

__all__ = [
    "filter_nll_fused_batched",
    "filter_nll_fused_tv_batched",
    "force_fused_nll",
]

_LOG_2PI = math.log(2.0 * math.pi)


# --------------------------------------------------------------------------- #
# dispatch control: rides the Pallas dispatch signal (so mesh_dispatch /
# force_pallas_scan pinning governs it too) unless explicitly forced
# --------------------------------------------------------------------------- #
_FORCE_FUSED: bool | None = None


def _use_fused_nll(D: int, O: int, T: int | None = None) -> bool:
    from eks_tpu.ops.pallas_filter import _use_pallas

    if not (D <= 3 and O <= 8):
        return False
    if _FORCE_FUSED is not None:
        # an explicit force wins over the VMEM-budget gate below (the direct
        # call path clamps to the minimum 8-lane tile), so forced fused-vs-
        # staged comparisons never silently time staged against staged
        return _FORCE_FUSED
    if T is not None:
        # the fused kernel holds the full padded time axis of every lane in
        # VMEM; when even 8 lanes of the paired (JVP) kernel don't fit, the
        # staged plane pipeline (which tiles time across grid steps) wins
        offs, n_scal = _scalar_offsets(D, O)
        _, _, n_planes = _filter_algebra(D)
        if _fused_batch_tile(O, n_scal, n_planes, 2, T) < 8:
            return False
    return _use_pallas(D)


class force_fused_nll:
    """Context manager pinning the fused single-kernel NLL on or off
    regardless of backend/Pallas dispatch (tests use it to compare the fused
    kernel against the staged plane pipeline on one backend). ``None``
    restores auto dispatch (follows the Pallas signal)."""

    def __init__(self, enabled: bool | None = True):
        self.enabled = enabled

    def __enter__(self):
        global _FORCE_FUSED
        self._prev = _FORCE_FUSED
        _FORCE_FUSED = self.enabled
        return self

    def __exit__(self, *exc):
        global _FORCE_FUSED
        _FORCE_FUSED = self._prev
        return False


# --------------------------------------------------------------------------- #
# per-lane scalar table: every time-invariant quantity the kernel needs
# --------------------------------------------------------------------------- #
def _scalar_offsets(D: int, O: int) -> tuple[dict, int]:
    """Layout of the flat per-lane scalar vector. Row-major blocks."""
    dd = D * D
    offs, n = {}, 0
    for name, size in (
        ("A_el", dd),      # (I - K C) A
        ("K_c", D * O),    # steady gain: b_t = K_c y_t
        ("C_el", dd),      # (I - K C) Q
        ("M_cT", D * O),   # (S⁻¹ C A)ᵀ: eta_t = M_cᵀ y_t
        ("J_el", dd),      # (C A)ᵀ S⁻¹ C A
        ("b_first", D),    # t=0 posterior mean (assimilates y_0 vs the prior)
        ("C_first", dd),   # t=0 posterior covariance
        ("A", dd),         # epilogue: transition
        ("Q", dd),         # epilogue: process noise (already s-scaled)
        ("Cobs", O * D),   # epilogue: emission
        ("r", O),          # epilogue: constant diagonal observation noise
        ("m0", D),         # epilogue: prior mean (t=0 predictive)
        ("S0", dd),        # epilogue: prior covariance
    ):
        offs[name] = n
        n += size
    return offs, n


def _pack_scalars(y0, m0, S0, A, Q, C, r):
    """One lane's scalar table — identical math to
    pkalman._plane_nll_pre's time-invariant prep."""
    D = m0.shape[0]
    eye = jnp.eye(D, dtype=y0.dtype)
    CQ = C @ Q
    CA = C @ A
    S_c = CQ @ C.T + jnp.diag(r)
    K_c = psd_solve(S_c, CQ).T                     # (D, O)
    IKC = eye - K_c @ C
    M_c = psd_solve(S_c, CA)                       # (O, D)
    A_el = IKC @ A
    C_el = IKC @ Q
    J_el = CA.T @ M_c
    S_0 = C @ S0 @ C.T + jnp.diag(r)
    K_0 = psd_solve(S_0, C @ S0).T
    b_first = m0 + K_0 @ (y0 - C @ m0)
    C_first = (eye - K_0 @ C) @ S0
    return jnp.concatenate([
        A_el.ravel(), K_c.ravel(), C_el.ravel(), M_c.T.ravel(),
        J_el.ravel(), b_first, C_first.ravel(),
        A.ravel(), Q.ravel(), C.ravel(), r, m0, S0.ravel(),
    ])


# --------------------------------------------------------------------------- #
# the fused kernel
# --------------------------------------------------------------------------- #
def _make_fused_kernel(D: int, O: int, L: int, T: int, paired: bool):
    combine, ident_vec, n_planes = _filter_algebra(D)
    offs, n_scal = _scalar_offsets(D, O)
    if paired:
        comb, identv, _ = _paired_algebra(combine, ident_vec)
    else:
        comb, identv = combine, ident_vec
    dd = D * D
    nm = 2 if paired else 1

    def build(scv, yv, t0):
        """One row of filtering elements, flat _FilterElement plane order.
        scv: n_scal planes; yv: O observation planes; t0: t==0 mask."""

        def W(name, k):
            return scv[offs[name] + k]

        rows = []
        for k in range(dd):                       # A planes (zero at t=0)
            rows.append(jnp.where(t0, 0.0, W("A_el", k)))
        for d in range(D):                        # b = K_c y_t | b_first
            b = sum(W("K_c", d * O + o) * yv[o] for o in range(O))
            rows.append(jnp.where(t0, W("b_first", d), b))
        for k in range(dd):                       # C planes | C_first
            rows.append(jnp.where(t0, W("C_first", k), W("C_el", k)))
        for d in range(D):                        # eta = M_cᵀ y_t (zero at t=0)
            e = sum(W("M_cT", d * O + o) * yv[o] for o in range(O))
            rows.append(jnp.where(t0, 0.0, e))
        for k in range(dd):                       # J planes (zero at t=0)
            rows.append(jnp.where(t0, 0.0, W("J_el", k)))
        return tuple(rows)

    def epilogue(prev, scv, yv, t0, valid):
        """Per-step marginal log-density from the carry BEFORE this row
        (the t-1 filtered posterior; masked to the prior at t=0)."""

        def W(name, k):
            return scv[offs[name] + k]

        m_prev = [prev[dd + d] for d in range(D)]
        P_prev = [[prev[dd + D + a * D + b] for b in range(D)] for a in range(D)]
        # predictive moments: prior at t=0, else A m_{t-1}, A P A' + Q
        pred_m = [
            jnp.where(
                t0, W("m0", d),
                sum(W("A", d * D + k) * m_prev[k] for k in range(D)),
            )
            for d in range(D)
        ]
        pred_P = [
            [
                jnp.where(
                    t0, W("S0", a * D + b),
                    sum(
                        W("A", a * D + k) * P_prev[k][l] * W("A", b * D + l)
                        for k in range(D) for l in range(D)
                    ) + W("Q", a * D + b),
                )
                for b in range(D)
            ]
            for a in range(D)
        ]
        S = [
            [
                sum(
                    W("Cobs", o * D + k) * pred_P[k][l] * W("Cobs", p * D + l)
                    for k in range(D) for l in range(D)
                ) + (W("r", o) if o == p else 0.0)
                for p in range(O)
            ]
            for o in range(O)
        ]
        d_pl = [
            yv[o] - sum(W("Cobs", o * D + k) * pred_m[k] for k in range(D))
            for o in range(O)
        ]
        # unrolled Cholesky + forward solve + logdet (as pkalman._pchol)
        Lc = [[None] * O for _ in range(O)]
        for i in range(O):
            for j in range(i + 1):
                s = S[i][j]
                for k in range(j):
                    s = s - Lc[i][k] * Lc[j][k]
                Lc[i][j] = jnp.sqrt(s) if i == j else s / Lc[j][j]
        z = [None] * O
        logdet = 0.0
        for i in range(O):
            s = d_pl[i]
            for k in range(i):
                s = s - Lc[i][k] * z[k]
            z[i] = s / Lc[i][i]
            logdet = logdet + jnp.log(Lc[i][i])
        quad = sum(zi * zi for zi in z)
        ll = -0.5 * quad - logdet - 0.5 * O * _LOG_2PI
        # padded steps may have produced NaN through sqrt of a garbage S;
        # where() drops them (the untaken branch never propagates)
        return jnp.where(valid, ll, 0.0)

    def kernel(y_ref, scal_ref, out_ref):
        # y_ref: (O, L, KB, NC); scal_ref: (nm*n_scal, KB, NC);
        # out_ref: (nm, KB, NC)
        KB = y_ref.shape[2]
        c_iota = lax.broadcasted_iota(jnp.int32, (1, KB, NC), 2)

        sc_all = tuple(scal_ref[pl.ds(j, 1)] for j in range(nm * n_scal))
        sc_p = sc_all[:n_scal]
        sc_t = sc_all[n_scal:]

        def y_row(i):
            return tuple(y_ref[o, pl.ds(i, 1)] for o in range(O))

        def masks(i):
            t0 = jnp.logical_and(i == 0, c_iota == 0)
            valid = (c_iota * L + i) < T
            return t0, valid

        if paired:

            def row_fn(i):
                yv = y_row(i)
                t0, _ = masks(i)
                p, t = jax.jvp(lambda s: build(s, yv, t0), (sc_p,), (sc_t,))
                return (*p, *t)

            def ll_fn(prev, i):
                yv = y_row(i)
                t0, valid = masks(i)
                return jax.jvp(
                    lambda pr, s: epilogue(pr, s, yv, t0, valid),
                    (prev[:n_planes], sc_p),
                    (prev[n_planes:], sc_t),
                )
        else:

            def row_fn(i):
                t0, _ = masks(i)
                return build(sc_p, y_row(i), t0)

            def ll_fn(prev, i):
                t0, valid = masks(i)
                return (epilogue(prev, sc_p, y_row(i), t0, valid),)

        # pass 1: per-chunk totals (no stores)
        totals = lax.fori_loop(
            1, L, lambda i, c: comb(c, row_fn(i)), row_fn(0)
        )

        # phase 2: exclusive chunk prefixes via log shift-and-combine
        def identity_like(x):
            return tuple(
                jnp.full_like(x, v) if v != 0.0 else jnp.zeros_like(x)
                for v in identv
            )

        prefix = totals
        shift = 1
        while shift < NC:
            shifted = tuple(pltpu.roll(t, shift, 2) for t in prefix)
            ident = identity_like(prefix[0])
            mask = c_iota >= shift
            shifted = tuple(
                jnp.where(mask, s, i0) for s, i0 in zip(shifted, ident)
            )
            prefix = comb(shifted, prefix)
            shift *= 2
        excl = tuple(pltpu.roll(t, 1, 2) for t in prefix)
        ident = identity_like(prefix[0])
        excl = tuple(jnp.where(c_iota >= 1, e, i0) for e, i0 in zip(excl, ident))

        # pass 3: rebuild rows, fold in the chunk prefixes, accumulate the NLL
        def step(i, carry, acc):
            lls = ll_fn(carry, i)
            acc = tuple(a + l for a, l in zip(acc, lls))
            return comb(carry, row_fn(i)), acc

        zero = jnp.zeros((1, KB, NC), dtype=y_ref.dtype)
        carry, acc = step(0, excl, (zero,) * nm)
        carry, acc = lax.fori_loop(
            1, L, lambda i, ca: step(i, ca[0], ca[1]), (carry, acc)
        )
        for m in range(nm):
            out_ref[pl.ds(m, 1)] = acc[m]

    return kernel, n_scal, n_planes


def _fused_batch_tile(O: int, n_scal: int, n_planes: int, nm: int, T: int) -> int:
    """Lanes per grid step: multiple of 8, bounded so the y block, the scalar
    block, and the carry/epilogue working set stay under ~8 MB of VMEM."""
    Tp = -(-T // NC) * NC
    per_lane = (O * Tp + nm * n_scal * NC) * 4       # resident refs
    per_lane += 6 * nm * n_planes * NC * 4           # carries + temps (rough)
    kb = 8 * ((8 << 20) // max(8 * per_lane, 1))
    return min(64, kb)  # 0 = even 8 lanes exceed the budget (caller gates)


def _fused_call(kernel, nm, y_planes, scal, L, T, interpret, kb_max):
    """y_planes: (N, O, T); scal: (N, nm*n_scal). Returns (nm, N) sums."""
    N, O, _ = y_planes.shape
    nst = scal.shape[1]
    Tp = NC * L
    if Tp != T:
        y_planes = jnp.concatenate(
            [y_planes, jnp.zeros((N, O, Tp - T), dtype=y_planes.dtype)], axis=2
        )
    kb = min(kb_max, -(-N // 8) * 8)
    Np = -(-N // kb) * kb
    if Np != N:
        # replicate lane 0 so padding lanes stay numerically tame
        y_planes = jnp.concatenate(
            [y_planes, jnp.tile(y_planes[:1], (Np - N, 1, 1))], axis=0
        )
        scal = jnp.concatenate([scal, jnp.tile(scal[:1], (Np - N, 1))], axis=0)
    # time layout t = c*L + i: chunk on the lane axis, row on the sublane grid
    y_elems = y_planes.reshape(Np, O, NC, L).transpose(1, 3, 0, 2)
    scal_b = jnp.broadcast_to(
        scal[:, :, None], (Np, nst, NC)
    ).transpose(1, 0, 2)
    out = pl.pallas_call(
        kernel,
        grid=(Np // kb,),
        out_shape=jax.ShapeDtypeStruct((nm, Np, NC), y_planes.dtype),
        in_specs=[
            pl.BlockSpec(
                (O, L, kb, NC), lambda n: (0, 0, n, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nst, kb, NC), lambda n: (0, n, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (nm, kb, NC), lambda n: (0, n, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(y_elems, scal_b)
    return jnp.sum(out, axis=2)[:, :N]


def _unpack_scalars(scal, D: int, O: int):
    """Inverse of the epilogue blocks of :func:`_pack_scalars`: slice the raw
    model parameters (m0, S0, A, Q, C, r) back out of a (N, n_scal) scalar
    table. The table carries them verbatim (they feed the kernel's
    epilogue), so both primal values AND tangents round-trip exactly."""
    offs, _ = _scalar_offsets(D, O)

    def block(name, *shape):
        n = math.prod(shape)
        seg = scal[:, offs[name]: offs[name] + n]
        return seg.reshape((scal.shape[0],) + shape)

    return (
        block("m0", D),
        block("S0", D, D),
        block("A", D, D),
        block("Q", D, D),
        block("Cobs", O, D),
        block("r", O),
    )


@functools.lru_cache(maxsize=None)
def _fused_fn(D: int, O: int, T: int, interpret: bool):
    """Differentiable fused NLL over (scal (N, n_scal), y_planes (N, O, T)).
    The custom JVP reruns the kernel on a paired scalar table when only the
    scalar table is perturbed (the s-optimizer's case — s enters exclusively
    through it); observation tangents fall back to the staged plane
    pipeline, which supports JVPs w.r.t. every input."""
    L = -(-T // NC)
    kernel_p, n_scal, n_planes = _make_fused_kernel(D, O, L, T, paired=False)
    kernel_t, _, _ = _make_fused_kernel(D, O, L, T, paired=True)
    # dispatch (_use_fused_nll) gates on the paired budget; direct callers at
    # extreme T get the minimum tile and may hit Mosaic's VMEM check
    kb_p = max(8, _fused_batch_tile(O, n_scal, n_planes, 1, T))
    kb_t = max(8, _fused_batch_tile(O, n_scal, n_planes, 2, T))

    @jax.custom_jvp
    def f(scal, y_planes):
        return _fused_call(kernel_p, 1, y_planes, scal, L, T, interpret, kb_p)[0]

    @functools.partial(f.defjvp, symbolic_zeros=True)
    def f_jvp(primals, tangents):
        scal, y_planes = primals
        dscal, dy = tangents
        if not isinstance(dy, SymbolicZero):
            # observation tangents: the fused kernel has no paired-y variant,
            # so differentiate the staged plane pipeline at the same point.
            # The scalar table carries the raw model parameters verbatim, so
            # primals and tangents both unpack exactly; values agree with the
            # fused kernel at float tolerance.
            from eks_tpu.ops.pkalman import _filter_nll_planes_batched_staged

            ys = jnp.swapaxes(y_planes, 1, 2)
            dys = jnp.swapaxes(dy, 1, 2)
            params = _unpack_scalars(scal, D, O)
            if isinstance(dscal, SymbolicZero):
                dparams = tuple(jnp.zeros_like(p) for p in params)
            else:
                dparams = _unpack_scalars(dscal, D, O)
            return jax.jvp(
                _filter_nll_planes_batched_staged,
                (ys, *params),
                (dys, *dparams),
            )
        if isinstance(dscal, SymbolicZero):
            return f(scal, y_planes), jnp.zeros(scal.shape[:1], scal.dtype)
        paired = jnp.concatenate([scal, dscal], axis=1)
        out = _fused_call(kernel_t, 2, y_planes, paired, L, T, interpret, kb_t)
        return out[0], out[1]

    return f


# --------------------------------------------------------------------------- #
# time-varying diagonal R: the pupil optimizer's loss
# --------------------------------------------------------------------------- #
def _scalar_offsets_tv(D: int, O: int) -> tuple[dict, int]:
    """Per-lane scalar layout for the TV kernel. R_t varies per step, so the
    element matrices are built per row (information form) from these
    time-invariant pieces instead of being precomputed."""
    dd = D * D
    offs, n = {}, 0
    for name, size in (
        ("Qi", dd),       # Q⁻¹ (element build)
        ("QiA", dd),      # Q⁻¹ A
        ("S0i", dd),      # S0⁻¹ (t=0 element)
        ("S0i_m0", D),    # S0⁻¹ m0
        ("A", dd),        # element eta/J + epilogue transition
        ("Q", dd),        # epilogue process noise (already s-scaled)
        ("Cobs", O * D),  # emission (element build + epilogue)
        ("m0", D),        # epilogue prior mean
        ("S0", dd),       # epilogue prior covariance
    ):
        offs[name] = n
        n += size
    return offs, n


def _pack_scalars_tv(m0, S0, A, Q, C):
    """One lane's TV scalar table — the same time-invariant prep as
    pkalman._plane_nll_pre_tv (information/Woodbury form)."""
    from eks_tpu.ops.linalg import small_inv

    Qi = small_inv(Q)
    S0i = small_inv(S0)
    return jnp.concatenate([
        Qi.ravel(), (Qi @ A).ravel(), S0i.ravel(), S0i @ m0,
        A.ravel(), Q.ravel(), C.ravel(), m0, S0.ravel(),
    ])


def _unpack_scalars_tv(scal, D: int, O: int):
    """Slice the raw (m0, S0, A, Q, C) back out of a TV scalar table (they
    ride verbatim for the epilogue, so tangents round-trip exactly)."""
    offs, _ = _scalar_offsets_tv(D, O)

    def block(name, *shape):
        n = math.prod(shape)
        seg = scal[:, offs[name]: offs[name] + n]
        return seg.reshape((scal.shape[0],) + shape)

    return (
        block("m0", D),
        block("S0", D, D),
        block("A", D, D),
        block("Q", D, D),
        block("Cobs", O, D),
    )


def _make_fused_kernel_tv(D: int, O: int, L: int, T: int, paired: bool):
    """TV twin of :func:`_make_fused_kernel`: the input ref carries 2O planes
    per lane (y rows 0:O, r rows O:2O); each row's filtering element is built
    in the information form — one unrolled D x D plane inverse per step
    instead of the covariance form's O x O solve (pkalman._plane_nll_pre_tv,
    same push-through identities)."""
    from eks_tpu.ops.pkalman import _pinv

    combine, ident_vec, n_planes = _filter_algebra(D)
    offs, n_scal = _scalar_offsets_tv(D, O)
    if paired:
        comb, identv, _ = _paired_algebra(combine, ident_vec)
    else:
        comb, identv = combine, ident_vec
    dd = D * D
    nm = 2 if paired else 1

    def build(scv, yv, rv, t0):
        def W(name, k):
            return scv[offs[name] + k]

        ri = [1.0 / rv[o] for o in range(O)]
        Wt = [
            [
                sum(W("Cobs", o * D + a) * W("Cobs", o * D + b) * ri[o]
                    for o in range(O))
                for b in range(D)
            ]
            for a in range(D)
        ]
        v = [
            sum(W("Cobs", o * D + a) * ri[o] * yv[o] for o in range(O))
            for a in range(D)
        ]
        # one inverse serves t=0 and t>0: select the prior information there
        M = _pinv([
            [Wt[a][b] + jnp.where(t0, W("S0i", a * D + b), W("Qi", a * D + b))
             for b in range(D)]
            for a in range(D)
        ])
        v_eff = [v[a] + jnp.where(t0, W("S0i_m0", a), 0.0) for a in range(D)]
        b_el = [sum(M[i][k] * v_eff[k] for k in range(D)) for i in range(D)]
        w = [
            v[a] - sum(Wt[a][k] * b_el[k] for k in range(D)) for a in range(D)
        ]
        MW = [
            [sum(M[a][k] * Wt[k][b] for k in range(D)) for b in range(D)]
            for a in range(D)
        ]
        WMW = [
            [sum(Wt[a][k] * MW[k][b] for k in range(D)) for b in range(D)]
            for a in range(D)
        ]

        rows = []
        for i in range(D):  # A_el = M QiA (zero at t=0)
            for j in range(D):
                a_ij = sum(M[i][k] * W("QiA", k * D + j) for k in range(D))
                rows.append(jnp.where(t0, 0.0, a_ij))
        for i in range(D):  # b planes (t=0 variant folded in via v_eff/M)
            rows.append(b_el[i])
        for i in range(D):  # C planes = M (t=0: M0 — same selected inverse)
            for j in range(D):
                rows.append(M[i][j])
        for i in range(D):  # eta = Aᵀ w (zero at t=0)
            e = sum(W("A", k * D + i) * w[k] for k in range(D))
            rows.append(jnp.where(t0, 0.0, e))
        for i in range(D):  # J = Aᵀ (W - W M W) A (zero at t=0)
            for j in range(D):
                jv = sum(
                    W("A", k * D + i) * (Wt[k][l] - WMW[k][l]) * W("A", l * D + j)
                    for k in range(D) for l in range(D)
                )
                rows.append(jnp.where(t0, 0.0, jv))
        return tuple(rows)

    def epilogue(prev, scv, yv, rv, t0, valid):
        def W(name, k):
            return scv[offs[name] + k]

        m_prev = [prev[dd + d] for d in range(D)]
        P_prev = [[prev[dd + D + a * D + b] for b in range(D)] for a in range(D)]
        pred_m = [
            jnp.where(
                t0, W("m0", d),
                sum(W("A", d * D + k) * m_prev[k] for k in range(D)),
            )
            for d in range(D)
        ]
        pred_P = [
            [
                jnp.where(
                    t0, W("S0", a * D + b),
                    sum(
                        W("A", a * D + k) * P_prev[k][l] * W("A", b * D + l)
                        for k in range(D) for l in range(D)
                    ) + W("Q", a * D + b),
                )
                for b in range(D)
            ]
            for a in range(D)
        ]
        S = [
            [
                sum(
                    W("Cobs", o * D + k) * pred_P[k][l] * W("Cobs", p * D + l)
                    for k in range(D) for l in range(D)
                ) + (rv[o] if o == p else 0.0)
                for p in range(O)
            ]
            for o in range(O)
        ]
        d_pl = [
            yv[o] - sum(W("Cobs", o * D + k) * pred_m[k] for k in range(D))
            for o in range(O)
        ]
        Lc = [[None] * O for _ in range(O)]
        for i in range(O):
            for j in range(i + 1):
                s = S[i][j]
                for k in range(j):
                    s = s - Lc[i][k] * Lc[j][k]
                Lc[i][j] = jnp.sqrt(s) if i == j else s / Lc[j][j]
        z = [None] * O
        logdet = 0.0
        for i in range(O):
            s = d_pl[i]
            for k in range(i):
                s = s - Lc[i][k] * z[k]
            z[i] = s / Lc[i][i]
            logdet = logdet + jnp.log(Lc[i][i])
        quad = sum(zi * zi for zi in z)
        ll = -0.5 * quad - logdet - 0.5 * O * _LOG_2PI
        return jnp.where(valid, ll, 0.0)

    def kernel(yr_ref, scal_ref, out_ref):
        # yr_ref: (2O, L, KB, NC) — y planes then r planes;
        # scal_ref: (nm*n_scal, KB, NC); out_ref: (nm, KB, NC)
        KB = yr_ref.shape[2]
        c_iota = lax.broadcasted_iota(jnp.int32, (1, KB, NC), 2)

        sc_all = tuple(scal_ref[pl.ds(j, 1)] for j in range(nm * n_scal))
        sc_p = sc_all[:n_scal]
        sc_t = sc_all[n_scal:]

        def y_row(i):
            return tuple(yr_ref[o, pl.ds(i, 1)] for o in range(O))

        def r_row(i):
            return tuple(yr_ref[O + o, pl.ds(i, 1)] for o in range(O))

        def masks(i):
            t0 = jnp.logical_and(i == 0, c_iota == 0)
            valid = (c_iota * L + i) < T
            return t0, valid

        if paired:

            def row_fn(i):
                yv, rv = y_row(i), r_row(i)
                t0, valid = masks(i)
                # padded steps carry r = 0 -> 1/r = inf; substitute a benign
                # 1.0 (their log-density is masked by `valid`, and the chunk
                # combine is immune: elements beyond T sit in chunks whose
                # prefixes no valid step consumes)
                rv = tuple(jnp.where(valid, r, 1.0) for r in rv)
                p, t = jax.jvp(lambda s: build(s, yv, rv, t0), (sc_p,), (sc_t,))
                return (*p, *t)

            def ll_fn(prev, i):
                yv, rv = y_row(i), r_row(i)
                t0, valid = masks(i)
                rv = tuple(jnp.where(valid, r, 1.0) for r in rv)
                return jax.jvp(
                    lambda pr, s: epilogue(pr, s, yv, rv, t0, valid),
                    (prev[:n_planes], sc_p),
                    (prev[n_planes:], sc_t),
                )
        else:

            def row_fn(i):
                t0, valid = masks(i)
                rv = tuple(jnp.where(valid, r, 1.0) for r in r_row(i))
                return build(sc_p, y_row(i), rv, t0)

            def ll_fn(prev, i):
                t0, valid = masks(i)
                rv = tuple(jnp.where(valid, r, 1.0) for r in r_row(i))
                return (epilogue(prev, sc_p, y_row(i), rv, t0, valid),)

        totals = lax.fori_loop(
            1, L, lambda i, c: comb(c, row_fn(i)), row_fn(0)
        )

        def identity_like(x):
            return tuple(
                jnp.full_like(x, v) if v != 0.0 else jnp.zeros_like(x)
                for v in identv
            )

        prefix = totals
        shift = 1
        while shift < NC:
            shifted = tuple(pltpu.roll(t, shift, 2) for t in prefix)
            ident = identity_like(prefix[0])
            mask = c_iota >= shift
            shifted = tuple(
                jnp.where(mask, s, i0) for s, i0 in zip(shifted, ident)
            )
            prefix = comb(shifted, prefix)
            shift *= 2
        excl = tuple(pltpu.roll(t, 1, 2) for t in prefix)
        ident = identity_like(prefix[0])
        excl = tuple(jnp.where(c_iota >= 1, e, i0) for e, i0 in zip(excl, ident))

        def step(i, carry, acc):
            lls = ll_fn(carry, i)
            acc = tuple(a + l for a, l in zip(acc, lls))
            return comb(carry, row_fn(i)), acc

        zero = jnp.zeros((1, KB, NC), dtype=yr_ref.dtype)
        carry, acc = step(0, excl, (zero,) * nm)
        carry, acc = lax.fori_loop(
            1, L, lambda i, ca: step(i, ca[0], ca[1]), (carry, acc)
        )
        for m in range(nm):
            out_ref[pl.ds(m, 1)] = acc[m]

    return kernel, n_scal, n_planes


def _use_fused_nll_tv(D: int, O: int, T: int | None = None) -> bool:
    from eks_tpu.ops.pallas_filter import _use_pallas

    if not (D <= 3 and O <= 8):
        return False
    if _FORCE_FUSED is not None:
        return _FORCE_FUSED
    if T is not None:
        offs, n_scal = _scalar_offsets_tv(D, O)
        _, _, n_planes = _filter_algebra(D)
        # 2O resident planes per lane (y + r)
        if _fused_batch_tile(2 * O, n_scal, n_planes, 2, T) < 8:
            return False
    return _use_pallas(D)


@functools.lru_cache(maxsize=None)
def _fused_tv_fn(D: int, O: int, T: int, interpret: bool):
    """Differentiable fused TV-R NLL over (scal (N, n_scal),
    yr_planes (N, 2O, T)). Same pairing strategy as :func:`_fused_fn`;
    observation/noise tangents fall back to the staged TV plane pipeline."""
    L = -(-T // NC)
    kernel_p, n_scal, n_planes = _make_fused_kernel_tv(D, O, L, T, paired=False)
    kernel_t, _, _ = _make_fused_kernel_tv(D, O, L, T, paired=True)
    kb_p = max(8, _fused_batch_tile(2 * O, n_scal, n_planes, 1, T))
    kb_t = max(8, _fused_batch_tile(2 * O, n_scal, n_planes, 2, T))

    @jax.custom_jvp
    def f(scal, yr_planes):
        return _fused_call(kernel_p, 1, yr_planes, scal, L, T, interpret, kb_p)[0]

    @functools.partial(f.defjvp, symbolic_zeros=True)
    def f_jvp(primals, tangents):
        scal, yr_planes = primals
        dscal, dyr = tangents
        if not isinstance(dyr, SymbolicZero):
            from eks_tpu.ops.pkalman import filter_nll_parallel_planes_tv

            def staged(ys, r, m0, S0, A, Q, C):
                return vmap(filter_nll_parallel_planes_tv)(
                    ys, m0, S0, A, Q, C, r
                )

            ys = jnp.swapaxes(yr_planes[:, :O], 1, 2)
            r = jnp.swapaxes(yr_planes[:, O:], 1, 2)
            dys = jnp.swapaxes(dyr[:, :O], 1, 2)
            dr = jnp.swapaxes(dyr[:, O:], 1, 2)
            params = _unpack_scalars_tv(scal, D, O)
            if isinstance(dscal, SymbolicZero):
                dparams = tuple(jnp.zeros_like(p) for p in params)
            else:
                dparams = _unpack_scalars_tv(dscal, D, O)
            return jax.jvp(staged, (ys, r, *params), (dys, dr, *dparams))
        if isinstance(dscal, SymbolicZero):
            return f(scal, yr_planes), jnp.zeros(scal.shape[:1], scal.dtype)
        paired = jnp.concatenate([scal, dscal], axis=1)
        out = _fused_call(kernel_t, 2, yr_planes, paired, L, T, interpret, kb_t)
        return out[0], out[1]

    return f


@highest_precision
def filter_nll_fused_tv_batched(
    ys: jnp.ndarray,   # (N, T, O)
    m0: jnp.ndarray,   # (N, D)
    S0: jnp.ndarray,   # (N, D, D)
    A: jnp.ndarray,    # (N, D, D)
    Q: jnp.ndarray,    # (N, D, D)
    C: jnp.ndarray,    # (N, O, D)
    r: jnp.ndarray,    # (N, T, O) time-varying diagonal observation noise
    interpret: bool = False,
) -> jnp.ndarray:
    """Marginal log-likelihoods (N,) of N independent TIME-VARYING-diag-R
    linear filters in one fused kernel (the pupil optimizer's loss — its R
    is the per-frame ensemble variance). Matches
    :func:`eks_tpu.ops.pkalman.filter_nll_parallel_planes_tv` and the
    sequential filter at float tolerance; forward-mode differentiable w.r.t.
    every model parameter through the paired scalar table, with
    observation/noise tangents routed through the staged plane pipeline.
    Requires Q and S0 invertible (information form)."""
    N, T, O = ys.shape
    D = m0.shape[1]
    scal = vmap(_pack_scalars_tv)(m0, S0, A, Q, C)
    yr_planes = jnp.concatenate(
        [jnp.swapaxes(ys, 1, 2), jnp.swapaxes(r, 1, 2)], axis=1
    )
    return _fused_tv_fn(D, O, T, bool(interpret))(scal, yr_planes)


@highest_precision
def filter_nll_fused_batched(
    ys: jnp.ndarray,   # (N, T, O)
    m0: jnp.ndarray,   # (N, D)
    S0: jnp.ndarray,   # (N, D, D)
    A: jnp.ndarray,    # (N, D, D)
    Q: jnp.ndarray,    # (N, D, D)
    C: jnp.ndarray,    # (N, O, D)
    r: jnp.ndarray,    # (N, O) constant diagonal observation noise
    interpret: bool = False,
) -> jnp.ndarray:
    """Marginal log-likelihoods (N,) of N independent constant-diag-R linear
    filters, computed by the fully fused kernel. Matches
    :func:`eks_tpu.ops.pkalman.filter_nll_parallel_planes_batched` and the
    sequential filter at float tolerance; differentiable w.r.t. every model
    parameter (forward mode), NOT w.r.t. ``ys``."""
    N, T, O = ys.shape
    D = m0.shape[1]
    scal = vmap(_pack_scalars)(ys[:, 0], m0, S0, A, Q, C, r)
    y_planes = jnp.swapaxes(ys, 1, 2)
    return _fused_fn(D, O, T, bool(interpret))(scal, y_planes)
