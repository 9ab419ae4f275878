"""Pallas TPU kernel: fused parallel-prefix Kalman filter (D = 2).

One kernel per keypoint lane computes the full filtering pass — element
construction, prefix combination, and per-step NLL — entirely in VMEM,
eliminating the inter-level HBM traffic and relayouts of the XLA
``lax.associative_scan`` lowering.

Algorithm: Särkkä & García-Fernández filtering elements
``(A, b, C, eta, J)`` (see ops/pkalman.py) combined with a two-level
chunked scan laid out for the VPU:

  * the time axis is reshaped to (L, NC) with NC = 128 contiguous chunks on
    the lane axis and L = T / NC steps on the sublane axis;
  * phase 1: a sequential ``fori_loop`` over L rows combines a running
    per-chunk carry (128 independent prefixes at once) and stores the
    inclusive within-chunk prefix;
  * phase 2: the 128 chunk aggregates are combined into exclusive
    chunk-prefixes with a log2(128)-step shift-and-combine sweep
    (``pltpu.roll`` + identity masking);
  * phase 3: one vectorized pass folds the exclusive chunk prefix into every
    stored within-chunk prefix.

The observation model is the singlecam family's (D = O = 2, diagonal R);
the general path stays in ops/pkalman.py. ``kalman_filter_pallas`` matches
``kalman_filter_parallel`` to float32 roundoff; parity is enforced in
tests/test_pallas_filter.py (interpret mode on CPU, compiled on TPU).

Note on expectations: at bundled-workload sizes the XLA scan already runs in
tens of microseconds and end-to-end time is host-transfer-bound, so this
kernel is about keeping the hot op at speed-of-light for large T and about
owning the kernel layer, not about end-to-end wins at T = 10k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eks_tpu.ops.kalman import FilterResult, _as_time_varying
from eks_tpu.ops.linalg import highest_precision, mvn_logpdf

__all__ = ["kalman_filter_pallas"]

NC = 128  # chunks = TPU lane width

# element planes: A(4) b(2) C(4) eta(2) J(4) = 16 per-step scalars
_N_PLANES = 16


def _combine(p1, p2):
    """Combine two filtering elements held as 16-tuples of equal-shape
    arrays; p1 precedes p2 in time. Closed-form D=2 algebra, elementwise."""
    a1_00, a1_01, a1_10, a1_11, b1_0, b1_1, c1_00, c1_01, c1_10, c1_11, n1_0, n1_1, j1_00, j1_01, j1_10, j1_11 = p1
    a2_00, a2_01, a2_10, a2_11, b2_0, b2_1, c2_00, c2_01, c2_10, c2_11, n2_0, n2_1, j2_00, j2_01, j2_10, j2_11 = p2

    # M = I + C1 @ J2 ; Z = M^{-1}
    m00 = 1.0 + c1_00 * j2_00 + c1_01 * j2_10
    m01 = c1_00 * j2_01 + c1_01 * j2_11
    m10 = c1_10 * j2_00 + c1_11 * j2_10
    m11 = 1.0 + c1_10 * j2_01 + c1_11 * j2_11
    inv_det = 1.0 / (m00 * m11 - m01 * m10)
    z00 = m11 * inv_det
    z01 = -m01 * inv_det
    z10 = -m10 * inv_det
    z11 = m00 * inv_det

    # A2Z = A2 @ Z
    a2z00 = a2_00 * z00 + a2_01 * z10
    a2z01 = a2_00 * z01 + a2_01 * z11
    a2z10 = a2_10 * z00 + a2_11 * z10
    a2z11 = a2_10 * z01 + a2_11 * z11

    # A = A2Z @ A1
    A00 = a2z00 * a1_00 + a2z01 * a1_10
    A01 = a2z00 * a1_01 + a2z01 * a1_11
    A10 = a2z10 * a1_00 + a2z11 * a1_10
    A11 = a2z10 * a1_01 + a2z11 * a1_11

    # b = A2Z @ (b1 + C1 @ eta2) + b2
    t0 = b1_0 + c1_00 * n2_0 + c1_01 * n2_1
    t1 = b1_1 + c1_10 * n2_0 + c1_11 * n2_1
    B0 = a2z00 * t0 + a2z01 * t1 + b2_0
    B1 = a2z10 * t0 + a2z11 * t1 + b2_1

    # C = A2Z @ C1 @ A2ᵀ + C2
    w00 = a2z00 * c1_00 + a2z01 * c1_10
    w01 = a2z00 * c1_01 + a2z01 * c1_11
    w10 = a2z10 * c1_00 + a2z11 * c1_10
    w11 = a2z10 * c1_01 + a2z11 * c1_11
    C00 = w00 * a2_00 + w01 * a2_01 + c2_00
    C01 = w00 * a2_10 + w01 * a2_11 + c2_01
    C10 = w10 * a2_00 + w11 * a2_01 + c2_10
    C11 = w10 * a2_10 + w11 * a2_11 + c2_11

    # Zt = inv(I + J2 C1) = Zᵀ (C, J symmetric); A1tZt = A1ᵀ @ Zᵀ
    u00 = a1_00 * z00 + a1_10 * z01
    u01 = a1_00 * z10 + a1_10 * z11
    u10 = a1_01 * z00 + a1_11 * z01
    u11 = a1_01 * z10 + a1_11 * z11

    # eta = A1tZt @ (eta2 - J2 @ b1) + eta1
    s0 = n2_0 - (j2_00 * b1_0 + j2_01 * b1_1)
    s1 = n2_1 - (j2_10 * b1_0 + j2_11 * b1_1)
    N0 = u00 * s0 + u01 * s1 + n1_0
    N1 = u10 * s0 + u11 * s1 + n1_1

    # J = A1tZt @ J2 @ A1 + J1
    v00 = u00 * j2_00 + u01 * j2_10
    v01 = u00 * j2_01 + u01 * j2_11
    v10 = u10 * j2_00 + u11 * j2_10
    v11 = u10 * j2_01 + u11 * j2_11
    J00 = v00 * a1_00 + v01 * a1_10 + j1_00
    J01 = v00 * a1_01 + v01 * a1_11 + j1_01
    J10 = v10 * a1_00 + v11 * a1_10 + j1_10
    J11 = v10 * a1_01 + v11 * a1_11 + j1_11

    return (A00, A01, A10, A11, B0, B1, C00, C01, C10, C11,
            N0, N1, J00, J01, J10, J11)


def _identity_like(x):
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    # identity element of the combine: A = I, everything else 0
    return (one, zero, zero, one, zero, zero, zero, zero, zero, zero,
            zero, zero, zero, zero, zero, zero)


def _scan_kernel(elems_ref, out_ref, partial_ref):
    """Prefix-combine one lane's elements.

    elems_ref / out_ref: (16, L, NC) VMEM blocks, [p, i, c] = plane p of the
    element at time t = c * L + i.
    """
    L = elems_ref.shape[1]

    # ---- phase 1: within-chunk inclusive prefix, 128 chunks at once -------
    # all phase-1/2 values are kept (1, NC)-shaped: Mosaic has no 1-D vectors
    def row(i):
        return tuple(elems_ref[p, pl.ds(i, 1), :] for p in range(_N_PLANES))

    def body(i, carry):
        new = _combine(carry, row(i))
        for p in range(_N_PLANES):
            partial_ref[p, pl.ds(i, 1), :] = new[p]
        return new

    carry = row(0)
    for p in range(_N_PLANES):
        partial_ref[p, 0:1, :] = carry[p]
    totals = jax.lax.fori_loop(1, L, body, carry)

    # ---- phase 2: exclusive prefix of the 128 chunk totals -----------------
    # log-sweep: shift the (1, NC) vectors right by 2^k along lanes and
    # combine, masking the wrapped entries to the identity
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, NC), 1)
    prefix = totals  # inclusive across chunks after the sweep
    shift = 1
    while shift < NC:
        shifted = tuple(pltpu.roll(t, shift, 1) for t in prefix)
        ident = _identity_like(prefix[0])
        mask = idx >= shift
        shifted = tuple(
            jnp.where(mask, s, i) for s, i in zip(shifted, ident)
        )
        prefix = _combine(shifted, prefix)
        shift *= 2
    # exclusive: shift the inclusive prefix right by one chunk
    excl = tuple(pltpu.roll(t, 1, 1) for t in prefix)
    ident = _identity_like(prefix[0])
    excl = tuple(jnp.where(idx >= 1, e, i) for e, i in zip(excl, ident))

    # ---- phase 3: fold exclusive chunk prefixes into the stored partials ---
    # (1, NC) exclusive prefixes broadcast against the (L, NC) partials
    parts = tuple(partial_ref[p, :, :] for p in range(_N_PLANES))
    final = _combine(excl, parts)
    for p in range(_N_PLANES):
        out_ref[p, :, :] = final[p]


def _run_scan(elems, interpret=False):
    """elems: (16, L, NC) -> inclusive prefix (16, L, NC)."""
    return pl.pallas_call(
        _scan_kernel,
        out_shape=jax.ShapeDtypeStruct(elems.shape, elems.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(elems.shape, elems.dtype)],
        interpret=interpret,
    )(elems)


@functools.partial(jax.jit, static_argnames=("interpret",))
@highest_precision
def kalman_filter_pallas(
    ys: jnp.ndarray,  # (T, 2)
    m0: jnp.ndarray,  # (2,)
    S0: jnp.ndarray,  # (2, 2)
    A: jnp.ndarray,  # (2, 2)
    Q: jnp.ndarray,  # (2, 2)
    C: jnp.ndarray,  # (2, 2)
    r_diag: jnp.ndarray,  # (T, 2) or (2,)
    interpret: bool = False,
) -> FilterResult:
    """D=2 linear Kalman filter with the prefix scan fused in one Pallas
    kernel. T is padded up to a multiple of 128 internally."""
    from eks_tpu.ops.pkalman import _make_filter_elements

    T = ys.shape[0]
    r = _as_time_varying(r_diag, T)
    e = _make_filter_elements(ys, m0, S0, A, Q, C, r)

    # pack to (16, T) planes
    planes = jnp.stack(
        [
            e.A[:, 0, 0], e.A[:, 0, 1], e.A[:, 1, 0], e.A[:, 1, 1],
            e.b[:, 0], e.b[:, 1],
            e.C[:, 0, 0], e.C[:, 0, 1], e.C[:, 1, 0], e.C[:, 1, 1],
            e.eta[:, 0], e.eta[:, 1],
            e.J[:, 0, 0], e.J[:, 0, 1], e.J[:, 1, 0], e.J[:, 1, 1],
        ]
    )

    # pad T to a multiple of NC with identity elements (prefix-neutral)
    Tp = -(-T // NC) * NC
    if Tp != T:
        pad = jnp.zeros((_N_PLANES, Tp - T), dtype=planes.dtype)
        pad = pad.at[0].set(1.0).at[3].set(1.0)  # A = I
        planes = jnp.concatenate([planes, pad], axis=1)
    L = Tp // NC

    # [p, t] -> [p, i, c] with t = c * L + i (chunk-contiguous layout)
    elems = planes.reshape(_N_PLANES, NC, L).transpose(0, 2, 1)
    prefix = _run_scan(elems, interpret=interpret)
    planes_out = prefix.transpose(0, 2, 1).reshape(_N_PLANES, Tp)[:, :T]

    ms = jnp.stack([planes_out[4], planes_out[5]], axis=-1)  # (T, 2)
    Ps = jnp.stack(
        [
            jnp.stack([planes_out[6], planes_out[7]], axis=-1),
            jnp.stack([planes_out[8], planes_out[9]], axis=-1),
        ],
        axis=-2,
    )  # (T, 2, 2)

    # NLL pass (same as ops/pkalman.py)
    m_prev = jnp.concatenate([m0[None], ms[:-1]], axis=0)
    P_prev = jnp.concatenate([S0[None], Ps[:-1]], axis=0)
    pred_m = m_prev.at[1:].set(m_prev[1:] @ A.T)
    pred_P = P_prev.at[1:].set(jnp.einsum("ij,tjk,lk->til", A, P_prev[1:], A) + Q)

    def step_ll(y_t, r_t, mp, Pp):
        S = C @ Pp @ C.T + jnp.diag(r_t)
        return mvn_logpdf(y_t, C @ mp, S)

    ll = jnp.sum(jax.vmap(step_ll)(ys, r, pred_m, pred_P))
    return FilterResult(ll, ms, Ps)
