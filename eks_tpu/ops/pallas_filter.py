"""Pallas TPU kernels: fused parallel-prefix Kalman filter AND smoother.

One kernel per lane computes a full prefix/suffix combination pass entirely
in VMEM, eliminating the inter-level HBM traffic and relayouts of the XLA
``lax.associative_scan`` lowering. Generic over the state dimension
(D <= 3 covers every model family: singlecam D=2, multicam latent D=3,
pupil D=3) and over the combine algebra, so the SAME kernel factory serves:

  * the forward filter scan (Särkkä & García-Fernández elements
    ``(A, b, C, eta, J)`` — 3D² + 2D scalar planes),
  * the backward RTS smoother scan (elements ``(E, g, L)`` — 2D² + D
    planes, combined in reversed time order),
  * the forward-mode derivative of either: a ``custom_jvp`` runs the same
    kernel on paired (primal, tangent) planes with the JVP-extended combine
    — which is associative because it is the differential of an associative
    op. This is what lets the s-optimizer (``core._optimize_blocks``, which
    differentiates the NLL with ``jax.jvp``) consume the fused kernel.

Layout: the time axis is reshaped to (L, NC) with NC = 128 contiguous chunks
on the lane axis; phase 1 runs a sequential ``fori_loop`` over L rows
combining 128 independent prefixes at once, phase 2 combines the 128 chunk
totals with a log2(128)-step shift-and-combine sweep (``pltpu.roll`` +
identity masking), phase 3 folds the exclusive chunk prefixes back into the
stored partials.

Dispatch: ``ops/pkalman.py`` routes its prefix scans here automatically on
the TPU backend (see ``force_pallas_scan`` to pin either way); CPU tests
exercise the kernels in interpret mode. Replaces the reference's sequential
dynamax scan hot loop (eks/core.py:290-291,469,648).
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eks_tpu.ops.kalman import FilterResult, SmootherResult, _as_time_varying
from eks_tpu.ops.linalg import highest_precision, mvn_logpdf

__all__ = [
    "kalman_filter_pallas",
    "kalman_smoother_pallas",
    "filter_prefix_pallas",
    "smoother_suffix_pallas",
    "force_pallas_scan",
]

NC = 128  # chunks = TPU lane width


# --------------------------------------------------------------------------- #
# dispatch control
# --------------------------------------------------------------------------- #
_FORCE_PALLAS: bool | None = None


def _use_pallas(D: int) -> bool:
    if _FORCE_PALLAS is not None:
        return _FORCE_PALLAS and D <= 3
    return jax.default_backend() == "tpu" and D <= 3


class force_pallas_scan:
    """Context manager pinning the fused-Pallas prefix scan on or off
    regardless of backend (tests use it to exercise the kernel on CPU in
    interpret mode). ``None`` restores backend auto-dispatch."""

    def __init__(self, enabled: Optional[bool] = True):
        self.enabled = enabled

    def __enter__(self):
        global _FORCE_PALLAS
        self._prev = _FORCE_PALLAS
        _FORCE_PALLAS = self.enabled
        return self

    def __exit__(self, *exc):
        global _FORCE_PALLAS
        _FORCE_PALLAS = self._prev
        return False


# --------------------------------------------------------------------------- #
# plane algebra: flatten / unflatten between (P,)-tuples of arrays and the
# tuple-of-tuples structures ops/pkalman.py's combines operate on
# --------------------------------------------------------------------------- #
def _mat_planes(flat, off, d):
    return tuple(tuple(flat[off + i * d + j] for j in range(d)) for i in range(d))


def _vec_planes(flat, off, d):
    return tuple(flat[off + i] for i in range(d))


def _filter_algebra(D: int):
    """(combine, identity_vec, n_planes) for the filter element algebra."""
    from eks_tpu.ops.pkalman import _combine_filter, _FilterElement

    dd = D * D
    n_planes = 3 * dd + 2 * D

    def unflatten(flat):
        return _FilterElement(
            A=_mat_planes(flat, 0, D),
            b=_vec_planes(flat, dd, D),
            C=_mat_planes(flat, dd + D, D),
            eta=_vec_planes(flat, 2 * dd + D, D),
            J=_mat_planes(flat, 2 * dd + 2 * D, D),
        )

    def flatten(e):
        out = []
        out += [e.A[i][j] for i in range(D) for j in range(D)]
        out += list(e.b)
        out += [e.C[i][j] for i in range(D) for j in range(D)]
        out += list(e.eta)
        out += [e.J[i][j] for i in range(D) for j in range(D)]
        return tuple(out)

    def combine(f1, f2):
        return flatten(_combine_filter(unflatten(f1), unflatten(f2)))

    # identity of the combine: A = I, everything else 0
    ident = [0.0] * n_planes
    for i in range(D):
        ident[i * D + i] = 1.0
    return combine, tuple(ident), n_planes


def _smoother_algebra(D: int):
    """(combine, identity_vec, n_planes) for the RTS element algebra in
    REVERSED time order: scanning z_i = elem_{T-1-i}, the suffix recursion is
    ``S_i = combine_smoother(later=S_{i-1}, earlier=z_i)`` — associative
    (reversed monoid composition)."""
    from eks_tpu.ops.pkalman import _combine_smoother, _SmootherElement

    dd = D * D
    n_planes = 2 * dd + D

    def unflatten(flat):
        return _SmootherElement(
            E=_mat_planes(flat, 0, D),
            g=_vec_planes(flat, dd, D),
            L=_mat_planes(flat, dd + D, D),
        )

    def flatten(e):
        out = [e.E[i][j] for i in range(D) for j in range(D)]
        out += list(e.g)
        out += [e.L[i][j] for i in range(D) for j in range(D)]
        return tuple(out)

    def combine(f1, f2):
        # f1 earlier in SCAN order == later in time
        return flatten(_combine_smoother(unflatten(f1), unflatten(f2)))

    ident = [0.0] * n_planes
    for i in range(D):
        ident[i * D + i] = 1.0  # E = I
    return combine, tuple(ident), n_planes


def _paired_algebra(combine, ident_vec):
    """JVP-extend a flat combine: planes double to (primal..., tangent...);
    the paired combine is the differential of the original, hence still
    associative. Identity pairs the original identity with zero tangents."""
    n = len(ident_vec)

    def paired(f1, f2):
        prim, tang = jax.jvp(
            lambda a, b: combine(a, b), (f1[:n], f2[:n]), (f1[n:], f2[n:])
        )
        return (*prim, *tang)

    return paired, (*ident_vec, *([0.0] * n)), 2 * n


# --------------------------------------------------------------------------- #
# the generic three-phase prefix kernel
# --------------------------------------------------------------------------- #
def _make_scan_kernel(n_planes: int, combine, ident_vec):
    def identity_like(x):
        return tuple(
            jnp.full_like(x, v) if v != 0.0 else jnp.zeros_like(x)
            for v in ident_vec
        )

    def kernel(elems_ref, out_ref, partial_ref):
        L = elems_ref.shape[1]

        # all phase-1/2 values stay (1, NC)-shaped: Mosaic has no 1-D vectors
        def row(i):
            return tuple(elems_ref[p, pl.ds(i, 1), :] for p in range(n_planes))

        def body(i, carry):
            new = combine(carry, row(i))
            for p in range(n_planes):
                partial_ref[p, pl.ds(i, 1), :] = new[p]
            return new

        carry = row(0)
        for p in range(n_planes):
            partial_ref[p, 0:1, :] = carry[p]
        totals = jax.lax.fori_loop(1, L, body, carry)

        # phase 2: exclusive prefix of the NC chunk totals (log shift-sweep)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, NC), 1)
        prefix = totals
        shift = 1
        while shift < NC:
            shifted = tuple(pltpu.roll(t, shift, 1) for t in prefix)
            ident = identity_like(prefix[0])
            mask = idx >= shift
            shifted = tuple(
                jnp.where(mask, s, i0) for s, i0 in zip(shifted, ident)
            )
            prefix = combine(shifted, prefix)
            shift *= 2
        excl = tuple(pltpu.roll(t, 1, 1) for t in prefix)
        ident = identity_like(prefix[0])
        excl = tuple(jnp.where(idx >= 1, e, i0) for e, i0 in zip(excl, ident))

        # phase 3: fold exclusive chunk prefixes into the stored partials
        parts = tuple(partial_ref[p, :, :] for p in range(n_planes))
        final = combine(excl, parts)
        for p in range(n_planes):
            out_ref[p, :, :] = final[p]

    return kernel


def _run_kernel(kernel, elems, interpret):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(elems.shape, elems.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(elems.shape, elems.dtype)],
        interpret=interpret,
    )(elems)


# --------------------------------------------------------------------------- #
# lane-batched variant: KB independent sequences per grid step
# --------------------------------------------------------------------------- #
def _make_scan_kernel_batched(n_planes: int, combine, ident_vec):
    """Same three-phase prefix scan, but every tile is (1, KB, NC): KB
    independent lanes ride the sublane axis, so one vector op advances KB
    sequences at once instead of the single-lane kernel's 1/8 sublane
    utilization. Partials live in the output ref (no scratch)."""

    def identity_like(x):
        return tuple(
            jnp.full_like(x, v) if v != 0.0 else jnp.zeros_like(x)
            for v in ident_vec
        )

    def kernel(elems_ref, out_ref):
        # refs: (n_planes, L, KB, NC)
        L = elems_ref.shape[1]

        def row(i):
            return tuple(
                elems_ref[p, pl.ds(i, 1), :, :] for p in range(n_planes)
            )

        def body(i, carry):
            new = combine(carry, row(i))
            for p in range(n_planes):
                out_ref[p, pl.ds(i, 1), :, :] = new[p]
            return new

        carry = row(0)
        for p in range(n_planes):
            out_ref[p, 0:1, :, :] = carry[p]
        totals = jax.lax.fori_loop(1, L, body, carry)

        # phase 2: exclusive prefix of the NC chunk totals per lane
        idx = jax.lax.broadcasted_iota(jnp.int32, totals[0].shape, 2)
        prefix = totals
        shift = 1
        while shift < NC:
            shifted = tuple(pltpu.roll(t, shift, 2) for t in prefix)
            ident = identity_like(prefix[0])
            mask = idx >= shift
            shifted = tuple(
                jnp.where(mask, s, i0) for s, i0 in zip(shifted, ident)
            )
            prefix = combine(shifted, prefix)
            shift *= 2
        excl = tuple(pltpu.roll(t, 1, 2) for t in prefix)
        ident = identity_like(prefix[0])
        excl = tuple(jnp.where(idx >= 1, e, i0) for e, i0 in zip(excl, ident))

        # phase 3: fold exclusive chunk prefixes into the stored partials
        parts = tuple(out_ref[p, :, :, :] for p in range(n_planes))
        final = combine(excl, parts)
        for p in range(n_planes):
            out_ref[p, :, :, :] = final[p]

    return kernel


def _batch_tile(n_planes: int, T: int) -> int:
    """Lanes per grid step: a multiple of 8 (Mosaic requires the sublane
    block dim divisible by 8), as many as keep in+out VMEM under ~10 MB,
    capped at 64. Returns 0 when even 8 lanes of the full padded time axis
    exceed the budget — the caller then falls back to the vmapped
    single-lane kernel."""
    Tp = -(-T // NC) * NC
    per_lane = 2 * n_planes * Tp * 4  # in + out, f32
    kb = 8 * ((10 << 20) // max(8 * per_lane, 1))
    return min(64, kb)


def _scan_planes_batched(planes, kernel, ident_vec, max_kb, interpret):
    """(N, P, T) stacked lanes -> inclusive prefix (N, P, T)."""
    N, P, T = planes.shape
    Tp = -(-T // NC) * NC
    if Tp != T:
        pad = jnp.tile(
            jnp.asarray(ident_vec, dtype=planes.dtype)[None, :, None],
            (N, 1, Tp - T),
        )
        planes = jnp.concatenate([planes, pad], axis=2)
    kb = min(max_kb, -(-N // 8) * 8)  # both multiples of 8
    Np = -(-N // kb) * kb
    if Np != N:
        planes = jnp.concatenate(
            [planes, jnp.tile(planes[:1], (Np - N, 1, 1))], axis=0
        )
    L = Tp // NC
    # [n, p, t] -> [p, i, n, c] with t = c * L + i (chunk-contiguous in time,
    # lanes on the sublane axis)
    elems = planes.reshape(Np, P, NC, L).transpose(1, 3, 0, 2)
    out = pl.pallas_call(
        kernel,
        grid=(Np // kb,),
        out_shape=jax.ShapeDtypeStruct((P, L, Np, NC), planes.dtype),
        in_specs=[
            pl.BlockSpec(
                (P, L, kb, NC), lambda n: (0, 0, n, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (P, L, kb, NC), lambda n: (0, 0, n, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(elems)
    return out.transpose(2, 0, 3, 1).reshape(Np, P, Tp)[:N, :, :T]


@functools.lru_cache(maxsize=None)
def _scan_fn_batched(kind: str, D: int, T: int, interpret: bool):
    """Differentiable lane-batched prefix scan over (N, P, T) planes; the
    custom JVP pairs primal/tangent planes through the same kernel."""
    algebra = _filter_algebra if kind == "filter" else _smoother_algebra
    combine, ident_vec, n_planes = algebra(D)
    pcombine, pident, _ = _paired_algebra(combine, ident_vec)
    kb = _batch_tile(n_planes, T)
    pkb = _batch_tile(2 * n_planes, T)
    if min(kb, pkb) == 0:
        # full-T tiles for 8 lanes exceed VMEM: fall back to the vmapped
        # single-lane kernel (pallas serializes the batch as a grid dim).
        # This is the NORMAL path at long T — e.g. the 10k-frame flagship,
        # where the paired-JVP tile for 8 lanes needs ~21 MB. A time-chunked
        # carry-across-grid kernel was built and measured SLOWER there
        # (padding + 5-D relayouts ate the sublane win), so the fallback is
        # the deliberate choice, not a gap.
        logging.getLogger("eks_tpu.ops").debug(
            f"lane-batched scan: T={T} exceeds the VMEM budget for 8 "
            f"{kind}/D={D} lanes; using the vmapped single-lane kernel"
        )
        return jax.vmap(_scan_fn(kind, D, interpret))
    kernel = _make_scan_kernel_batched(n_planes, combine, ident_vec)
    pkernel = _make_scan_kernel_batched(2 * n_planes, pcombine, pident)

    @jax.custom_jvp
    def scan(planes):
        return _scan_planes_batched(planes, kernel, ident_vec, kb, interpret)

    @scan.defjvp
    def scan_jvp(primals, tangents):
        (p,), (dp,) = primals, tangents
        paired = jnp.concatenate([p, dp], axis=1)
        out = _scan_planes_batched(paired, pkernel, pident, pkb, interpret)
        return out[:, :n_planes], out[:, n_planes:]

    return scan


def _scan_planes(planes, kernel, ident_vec, interpret):
    """(P, T) planes -> inclusive prefix (P, T), identity-padded to NC."""
    P, T = planes.shape
    Tp = -(-T // NC) * NC
    if Tp != T:
        pad = jnp.tile(
            jnp.asarray(ident_vec, dtype=planes.dtype)[:, None], (1, Tp - T)
        )
        planes = jnp.concatenate([planes, pad], axis=1)
    L = Tp // NC
    # [p, t] -> [p, i, c] with t = c * L + i (chunk-contiguous layout)
    elems = planes.reshape(P, NC, L).transpose(0, 2, 1)
    out = _run_kernel(kernel, elems, interpret)
    return out.transpose(0, 2, 1).reshape(P, Tp)[:, :T]


# one differentiable scan fn per (algebra, D, interpret); the custom JVP
# reruns the kernel on paired planes so jax.jvp through the filter works
@functools.lru_cache(maxsize=None)
def _scan_fn(kind: str, D: int, interpret: bool):
    algebra = _filter_algebra if kind == "filter" else _smoother_algebra
    combine, ident_vec, n_planes = algebra(D)
    kernel = _make_scan_kernel(n_planes, combine, ident_vec)
    pcombine, pident, _ = _paired_algebra(combine, ident_vec)
    pkernel = _make_scan_kernel(2 * n_planes, pcombine, pident)

    @jax.custom_jvp
    def scan(planes):
        return _scan_planes(planes, kernel, ident_vec, interpret)

    @scan.defjvp
    def scan_jvp(primals, tangents):
        (p,), (dp,) = primals, tangents
        paired = jnp.concatenate([p, dp], axis=0)
        out = _scan_planes(paired, pkernel, pident, interpret)
        return out[:n_planes], out[n_planes:]

    return scan


# --------------------------------------------------------------------------- #
# element (AoS) <-> plane packing
# --------------------------------------------------------------------------- #
def _pack_filter_planes(e) -> jnp.ndarray:
    """_FilterElementAoS (T-leading tensors) -> (P, T) scalar planes."""
    T, D = e.b.shape
    rows = (
        [e.A[:, i, j] for i in range(D) for j in range(D)]
        + [e.b[:, i] for i in range(D)]
        + [e.C[:, i, j] for i in range(D) for j in range(D)]
        + [e.eta[:, i] for i in range(D)]
        + [e.J[:, i, j] for i in range(D) for j in range(D)]
    )
    return jnp.stack(rows)


def filter_prefix_pallas(elems, interpret: bool = False):
    """Prefix-combine filtering elements in one fused kernel.

    elems: _FilterElementAoS with (T, D[, D]) leaves -> filtered (ms, Ps).
    Differentiable via the paired-plane custom JVP.
    """
    T, D = elems.b.shape
    planes = _pack_filter_planes(elems)
    out = _scan_fn("filter", D, bool(interpret))(planes)
    dd = D * D
    ms = out[dd:dd + D].T  # b planes
    Ps = out[dd + D:2 * dd + D].reshape(D, D, T).transpose(2, 0, 1)  # C planes
    return ms, Ps


def smoother_suffix_pallas(E_all, g_all, L_all, interpret: bool = False):
    """Suffix-combine RTS smoothing elements in one fused kernel.

    Inputs are (T, D, D)/(T, D) tensors in FORWARD time order; the kernel
    scans them reversed (prefix over reversed time == suffix) and returns
    (smoothed means (T, D), smoothed covs (T, D, D)).
    """
    T, D = g_all.shape
    dd = D * D
    rows = (
        [E_all[::-1, i, j] for i in range(D) for j in range(D)]
        + [g_all[::-1, i] for i in range(D)]
        + [L_all[::-1, i, j] for i in range(D) for j in range(D)]
    )
    out = _scan_fn("smoother", D, bool(interpret))(jnp.stack(rows))
    sm = out[dd:dd + D].T[::-1]
    sP = out[dd + D:].reshape(D, D, T).transpose(2, 0, 1)[::-1]
    return sm, sP


# --------------------------------------------------------------------------- #
# standalone fused filter/smoother entry points (tests, benchmarking)
# --------------------------------------------------------------------------- #
@functools.partial(jax.jit, static_argnames=("interpret",))
@highest_precision
def kalman_filter_pallas(
    ys: jnp.ndarray,  # (T, O)
    m0: jnp.ndarray,  # (D,)
    S0: jnp.ndarray,
    A: jnp.ndarray,
    Q: jnp.ndarray,
    C: jnp.ndarray,  # (O, D)
    r_diag: jnp.ndarray,  # (T, O) or (O,)
    interpret: bool = False,
) -> FilterResult:
    """Linear Kalman filter with the prefix scan fused in one Pallas kernel
    (D <= 3). T is padded up to a multiple of 128 internally."""
    from eks_tpu.ops.pkalman import _make_filter_elements, _predictive_moments

    T = ys.shape[0]
    r = _as_time_varying(r_diag, T)
    # raw r: the builder hoists the innovation solve when R is constant
    elems = _make_filter_elements(ys, m0, S0, A, Q, C, r_diag)
    ms, Ps = filter_prefix_pallas(elems, interpret=interpret)

    pred_m, pred_P = _predictive_moments(ms, Ps, m0, S0, A, Q)

    def step_ll(y_t, r_t, mp, Pp):
        S = C @ Pp @ C.T + jnp.diag(r_t)
        return mvn_logpdf(y_t, C @ mp, S)

    ll = jnp.sum(jax.vmap(step_ll)(ys, r, pred_m, pred_P))
    return FilterResult(ll, ms, Ps)


@functools.partial(jax.jit, static_argnames=("interpret",))
@highest_precision
def kalman_smoother_pallas(
    ys: jnp.ndarray,
    m0: jnp.ndarray,
    S0: jnp.ndarray,
    A: jnp.ndarray,
    Q: jnp.ndarray,
    C: jnp.ndarray,
    r_diag: jnp.ndarray,
    interpret: bool = False,
) -> SmootherResult:
    """Fused filter + fused backward RTS pass."""
    from eks_tpu.ops.pkalman import _make_smoother_elements

    fr = kalman_filter_pallas(ys, m0, S0, A, Q, C, r_diag, interpret=interpret)
    E_all, g_all, L_all = _make_smoother_elements(
        fr.filtered_means, fr.filtered_covs, A, Q
    )
    sm, sP = smoother_suffix_pallas(E_all, g_all, L_all, interpret=interpret)
    return SmootherResult(
        fr.log_likelihood, fr.filtered_means, fr.filtered_covs, sm, sP
    )
