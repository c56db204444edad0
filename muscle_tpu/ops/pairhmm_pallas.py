"""Pallas TPU kernels for the pair-HMM Forward/Backward and MEA DP.

Same math as ops/pairhmm.py (the XLA-scan reference implementation,
validated against the per-cell oracle), restructured for the TPU
memory/compute model:

* One grid program processes a tile of P pairs; the inner grid axis
  walks DP rows, with the five state rows living in VMEM scratch across
  grid steps. Emissions are precomputed as (B, L, L) matrices by two
  one-hot MXU matmuls and streamed row-by-row through the pipelined
  BlockSpec — the kernel itself does no gathers.
* The within-row IY/JY dependence u_j = LOG_ADD(u_{j-1}+a_j, c_j) is a
  log-semiring affine recurrence solved with a Hillis-Steele scan:
  log2(L) rounds of lane-roll + LOG_ADD on the (P, L) block.
* Backward runs as a forward-style scan over reversed sequences
  (identical trick to ops/pairhmm.py) so right-padded batches stay
  correct.

reference: src/fwdflat3.cpp, src/bwdflat3.cpp, src/calcposteriorflat.cpp,
src/calcalnscoreflat.cpp (semantics); SURVEY §3.4 / §7 (why this is the
primary Pallas target).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .logspace import LOG_ZERO, LOG_UNDERFLOW, logexp1
from .pairhmm import MIN_SPARSE_SCORE

NEG_BIG = -1e30  # sentinel more negative than any reachable score sum

# per-pair params layout, (B, 16) VMEM rows: [tSM, tSI, tSJ, tMM, tMI,
# tMJ, tII, tIM, tJJ, tJM, tot, 0...] — each pair can carry its own HMM
# transitions (ensemble replicate batching); the kernel reads (P, 1)
# columns that broadcast like the former shared scalars. Lane 10 (tot)
# is the pair's total log-probability, filled between the forward and
# the fused backward+posterior pass.
P_TSM, P_TSI, P_TSJ, P_TMM, P_TMI, P_TMJ, P_TII, P_TIM, P_TJJ, P_TJM = range(10)
P_TOT = 10


def _params_rows(start, tv, b):
    """Shared-HMM (B, 16) params block from (5,) start + (7,) tv."""
    row = jnp.zeros((16,), jnp.float32)
    row = row.at[P_TSM].set(start[0])
    row = row.at[P_TSI].set(start[1])
    row = row.at[P_TSJ].set(start[3])
    row = row.at[3:10].set(tv[:7])
    return jnp.broadcast_to(row, (b, 16))


def _params_rows_multi(start_b, tv_b):
    """Per-pair (B, 16) params block from (B, 5) start + (B, 7) tv."""
    b = start_b.shape[0]
    p = jnp.zeros((b, 16), jnp.float32)
    p = p.at[:, P_TSM].set(start_b[:, 0])
    p = p.at[:, P_TSI].set(start_b[:, 1])
    p = p.at[:, P_TSJ].set(start_b[:, 3])
    p = p.at[:, 3:10].set(tv_b[:, :7])
    return p


def _logexp1_sel(x):
    """logexp1 via coefficient selection: pick the segment's cubic
    coefficients first, then evaluate ONE Horner cubic — bit-identical
    to evaluating the selected cubic directly (same coefficients, same
    cutoffs; reference src/scoretype.h:100-109) but ~2.5x fewer VPU
    flops than evaluating all four cubics."""
    from .logspace import _C0, _C1, _C2, _C3
    s1 = x <= 1.0
    s2 = x <= 2.5
    s3 = x <= 4.5

    def pick(i):
        return jnp.where(s2, jnp.where(s1, _C0[i], _C1[i]),
                         jnp.where(s3, _C2[i], _C3[i]))
    c0, c1, c2, c3 = pick(0), pick(1), pick(2), pick(3)
    return ((c0 * x + c1) * x + c2) * x + c3


def _log_add(x, y):
    hi = jnp.maximum(x, y)
    lo = jnp.minimum(x, y)
    d = hi - lo
    small = (lo <= LOG_ZERO) | (d >= LOG_UNDERFLOW)
    return jnp.where(small, hi,
                     lo + _logexp1_sel(jnp.clip(d, 0.0, LOG_UNDERFLOW)))


def _log_add5(x1, x2, x3, x4, x5):
    return _log_add(x1, _log_add(x2, _log_add(x3, _log_add(x4, x5))))


def _shift_fill(x, fill):
    """Shift lanes right by one; lane 0 takes `fill` ((P,1) or scalar)."""
    rolled = pltpu.roll(x, 1, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == 0, fill, rolled)


def _affine_scan(a, c, width, log_add_fn=None):
    """Inclusive scan of T_j(u) = LOG_ADD(u + a_j, c_j) with u_0 = -inf.

    Returns u_j = C_j of the composed transform. Hillis-Steele over
    lanes: compose(s_j, s_{j-k}) = (a_j + a_{j-k},
    LOG_ADD(c_{j-k} + a_j, c_j))."""
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    k = 1
    while k < width:
        a_s = pltpu.roll(a, k, 1)
        c_s = pltpu.roll(c, k, 1)
        valid = lane >= k
        a_prev = jnp.where(valid, a_s, 0.0)
        c_prev = jnp.where(valid, c_s, NEG_BIG)
        c = (log_add_fn or _log_add)(c_prev + a, c)
        a = a + a_prev
        k *= 2
    return c


def _affine_scan2(a1, c1, a2, c2, width):
    """Two affine scans fused by stacking along sublanes — halves the
    number of roll/select/LOG_ADD invocations (the per-row cost is
    dominated by these scans)."""
    p = a1.shape[0]
    a = jnp.concatenate([a1, a2], axis=0)
    c = jnp.concatenate([c1, c2], axis=0)
    c = _affine_scan(a, c, width)
    return c[:p], c[p:]


# Least-squares degree-8 fit of log(1 + e^x) on [0, 7.5]: max error
# 8.3e-5 vs exact, where the reference's 4-segment cubic is 2.6e-4
# (src/scoretype.h:100-109). One Horner chain, NO per-segment
# coefficient selection — the selection (3 compares + 12 selects per
# LOG_ADD) dominated the scan's per-round cost. Used only inside the
# within-row scans ("poly" impl), whose LOG_ADD association already
# differs from the reference's sequential order; the M/IX/JX updates
# keep the reference cubic for closest tracking.
#
# (A log-cumsum-exp scan via MXU triangular-matmul prefix sums was
# tried and REMOVED: any global/block max scaling floors the log-sum
# for prefixes before the row's peak — measured +40 log-unit
# overestimates that corrupt posteriors. The log-semiring scan is the
# numerically sound parallel form.)
_P8 = (-6.73338208e-07, 2.39144278e-05, -3.51821887e-04, 2.68814008e-03,
       -1.01874083e-02, 4.79808334e-03, 1.22831020e-01, 5.00330250e-01,
       6.93143978e-01)


def _logexp1_poly8(x):
    r = jnp.float32(_P8[0])
    for c in _P8[1:]:
        r = r * x + c
    return r


def _log_add_p(x, y):
    hi = jnp.maximum(x, y)
    lo = jnp.minimum(x, y)
    d = jnp.minimum(hi - lo, LOG_UNDERFLOW)
    small = (lo <= LOG_ZERO) | (d >= LOG_UNDERFLOW)
    return jnp.where(small, hi, lo + _logexp1_poly8(d))


def _affine_scan2_poly(a1, c1, a2, c2, width):
    """_affine_scan2 with the selection-free degree-8 LOG_ADD."""
    p = a1.shape[0]
    a = jnp.concatenate([a1, a2], axis=0)
    c = jnp.concatenate([c1, c2], axis=0)
    c = _affine_scan(a, c, width, log_add_fn=_log_add_p)
    return c[:p], c[p:]


_SEG = 64   # segment width for the two-level scan


def _affine_scan_seg(a, c, width, log_add_fn):
    """Two-level affine scan: log2(SEG) masked Hillis-Steele rounds
    within SEG-lane segments, a tiny sequential carry chain over the
    width/SEG segment transforms, then ONE combine LOG_ADD per lane.
    Rounds drop from log2(L) to log2(SEG)+1 — at L=2048 that is 7 vs
    11 LOG_ADD+roll rounds per state per row."""
    seg = min(_SEG, width)
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    seg_pos = lane - (lane // seg) * seg     # lane index within segment
    k = 1
    while k < seg:
        a_s = pltpu.roll(a, k, 1)
        c_s = pltpu.roll(c, k, 1)
        valid = seg_pos >= k
        a_prev = jnp.where(valid, a_s, 0.0)
        c_prev = jnp.where(valid, c_s, NEG_BIG)
        c = log_add_fn(c_prev + a, c)
        a = a + a_prev
        k *= 2
    n_seg = width // seg
    if n_seg <= 1:
        return c
    # carry chain over segment-total transforms (A_s, C_s) — (2P, 1)
    # scalars per segment, sequential but tiny
    carry_a = jnp.zeros_like(a[:, :1])
    carry_c = jnp.full_like(a[:, :1], NEG_BIG)
    carries = [carry_c]
    for s in range(n_seg - 1):
        tot_a = a[:, (s + 1) * seg - 1:(s + 1) * seg]
        tot_c = c[:, (s + 1) * seg - 1:(s + 1) * seg]
        carry_c = log_add_fn(carry_c + tot_a, tot_c)
        carries.append(carry_c)
    carry_vec = jnp.concatenate(
        [jnp.broadcast_to(cc, (a.shape[0], seg)) for cc in carries],
        axis=1)
    return log_add_fn(carry_vec + a, c)


def _affine_scan2_seg(a1, c1, a2, c2, width, log_add_fn=None):
    p = a1.shape[0]
    a = jnp.concatenate([a1, a2], axis=0)
    c = jnp.concatenate([c1, c2], axis=0)
    c = _affine_scan_seg(a, c, width, log_add_fn or _log_add)
    return c[:p], c[p:]


def _affine_scan2_segpoly(a1, c1, a2, c2, width):
    return _affine_scan2_seg(a1, c1, a2, c2, width,
                             log_add_fn=_log_add_p)


def _log_add5_p(x1, x2, x3, x4, x5):
    return _log_add_p(x1, _log_add_p(x2, _log_add_p(
        x3, _log_add_p(x4, x5))))


# scan impl for the IY/JY within-row recurrence, keyed by name:
#   hillis  — log-semiring Hillis-Steele, reference-cubic LOG_ADD
#   poly    — same scan, selection-free degree-8 LOG_ADD
#   seg     — two-level segmented scan (fewer rounds), cubic LOG_ADD
#   segpoly — segmented + degree-8 (fastest measured, tools/ab_scan.py)
# "+all" suffix (e.g. "segpolyall") additionally switches the M/IX/JX
# cell updates to the degree-8 LOG_ADD (max err 8.3e-5, BETTER than the
# reference cubic's 2.6e-4 — src/scoretype.h:100-109); without it the
# base updates keep the reference cubic for closest tracking.
_SCAN2_IMPLS = {
    "hillis": _affine_scan2,
    "poly": _affine_scan2_poly,
    "seg": _affine_scan2_seg,
    "segpoly": _affine_scan2_segpoly,
}


def _impl_fns(impl):
    """(scan2, log_add, log_add5) for an impl name."""
    base = impl[:-3] if impl.endswith("all") else impl
    scan2 = _SCAN2_IMPLS.get(base, _affine_scan2)
    if impl.endswith("all"):
        return scan2, _log_add_p, _log_add5_p
    return scan2, _log_add, _log_add5


def _cumsum_lanes(x, width):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < width:
        s = pltpu.roll(x, k, 1)
        x = x + jnp.where(lane >= k, s, 0.0)
        k *= 2
    return x


def _max_scan_lanes(x, width):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < width:
        s = pltpu.roll(x, k, 1)
        x = jnp.maximum(x, jnp.where(lane >= k, s, NEG_BIG))
        k *= 2
    return x


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _emission_row(xm_ref, oy_ref, kk):
    """Per-row emission from streamed match-score rows + persistent
    one-hot y: e_row[p, j] = sum_k xm[p, k] * oy[p, k, j]. Exactly one
    k contributes per (p, j) (one-hot), and adding exact zeros is
    exact, so this equals the fp32 table lookup bit-for-bit — same
    guarantee as the one-hot MXU matmul it replaces, without the
    K=21-padded-to-128 MXU waste or the (B,Lx,Ly) HBM lattice."""
    e = xm_ref[0, :, 0:1] * oy_ref[:, 0, :]
    for k in range(1, kk):
        e = e + xm_ref[0, :, k:k + 1] * oy_ref[:, k, :]
    return e


def _fwd_kernel(n_rows, kk, impl, params, *refs):
    """Grid step i computes DP row i+1; scratch carries row i.

    Refs (row-major layouts put the large axes in the tiled minor
    positions): with kk=None, e (1,P,L) emission row block of the
    (Lx,B,Ly) lattice; with kk=K (fused letter path), instead
    xm (1,P,128) streamed match-score rows + oy (P,KP,L) persistent
    one-hot y, and the emission row is built in-VMEM (no (B,Lx,Ly)
    HBM lattice at all).
    insx (1,P,1) this row's x insert scores (streamed from (Lx,B,1));
    insy/lymask (P,L); lxf (P,128) per-pair lx broadcast; m_out (1,P,L)
    row of the (Lx,B,Ly) M lattice; sly (P,128) 5 final states at
    (lx, ly), written on the last grid step.
    Scratch: five (P,L) state rows, c0 (P,128) col-0 IX/JX, and five
    (P,L) accumulators capturing each pair's final (row lx) state row.
    """
    if kk is None:
        (e_ref, insx_ref, insy_ref, lymask_ref, lxf_ref,
         m_out_ref, sly_ref,
         m_s, ix_s, iy_s, jx_s, jy_s, c0_s,
         am_s, aix_s, aiy_s, ajx_s, ajy_s) = refs
        e_row = e_ref[0, :, :]
    else:
        (xm_ref, oy_ref, insx_ref, insy_ref, lymask_ref, lxf_ref,
         m_out_ref, sly_ref,
         m_s, ix_s, iy_s, jx_s, jy_s, c0_s,
         am_s, aix_s, aiy_s, ajx_s, ajy_s) = refs
        e_row = _emission_row(xm_ref, oy_ref, kk)
    i = pl.program_id(1)
    L = insy_ref.shape[1]
    scan2, log_add, log_add5 = _impl_fns(impl)
    # per-pair transition scores as (P, 1) columns — broadcast against
    # the (P, L) state rows exactly like the former SMEM scalars, but
    # each pair may carry its own (e.g. ensemble-perturbed) HMM
    tSM = params[:, P_TSM:P_TSM + 1]
    tSI = params[:, P_TSI:P_TSI + 1]
    tSJ = params[:, P_TSJ:P_TSJ + 1]
    tMM = params[:, P_TMM:P_TMM + 1]
    tMI = params[:, P_TMI:P_TMI + 1]
    tMJ = params[:, P_TMJ:P_TMJ + 1]
    tII = params[:, P_TII:P_TII + 1]
    tIM = params[:, P_TIM:P_TIM + 1]
    tJJ = params[:, P_TJJ:P_TJJ + 1]
    tJM = params[:, P_TJM:P_TJM + 1]

    insy = insy_ref[:, :]

    @pl.when(i == 0)
    def _():
        # row 0 boundary (reference: src/fwdflat3.cpp:35-93)
        lz = jnp.full(insy.shape, LOG_ZERO, jnp.float32)
        cum = _cumsum_lanes(insy + tII, L)
        m_s[:, :] = lz
        ix_s[:, :] = lz
        jx_s[:, :] = lz
        iy_s[:, :] = tSI - tII + cum
        cumj = _cumsum_lanes(insy + tJJ, L)
        jy_s[:, :] = tSJ - tJJ + cumj
        c0_s[:, :] = jnp.full(c0_s.shape, LOG_ZERO, jnp.float32)

    m_p = m_s[:, :]
    ix_p = ix_s[:, :]
    iy_p = iy_s[:, :]
    jx_p = jx_s[:, :]
    jy_p = jy_s[:, :]
    ix0_p = c0_s[:, 0:1]
    jx0_p = c0_s[:, 1:2]

    insx = insx_ref[0, :, :]   # (P, 1)

    lane = jax.lax.broadcasted_iota(jnp.int32, e_row.shape, 1)

    # M row: all five predecessor terms shift by the same one lane, so
    # fold first and shift the combined row once; the shifted-in lane-0
    # value is the fold of the per-term fills (LOG_ZERO, ix0, jx0,
    # LOG_ZERO, LOG_ZERO), which the LOG_ZERO clamp reduces exactly to
    # LOG_ADD(ix0+tIM, jx0+tJM) — bit-identical to per-term shifting.
    comb = log_add5(m_p + tMM, ix_p + tIM, jx_p + tJM,
                    iy_p + tIM, jy_p + tJM)
    fill = log_add(ix0_p + tIM, jx0_p + tJM)
    m_new = _shift_fill(comb, fill) + e_row
    m_new = jnp.where((i == 0) & (lane == 0), tSM + e_row, m_new)

    # IX/JX rows (predecessors at (i-1, j))
    ix_new = log_add(ix_p + tII, m_p + tMI) + insx
    jx_new = log_add(jx_p + tJJ, m_p + tMJ) + insx

    # column-0 chain
    ix0_new = jnp.where(i == 0, tSI + insx, ix0_p + tII + insx)
    jx0_new = jnp.where(i == 0, tSJ + insx, jx0_p + tJJ + insx)

    # IY/JY rows: affine recurrence along lanes (fused into one scan)
    m_sh = _shift_fill(m_new, LOG_ZERO)
    iy_new, jy_new = scan2(insy + tII, m_sh + tMI + insy,
                           insy + tJJ, m_sh + tMJ + insy, L)

    m_s[:, :] = m_new
    ix_s[:, :] = ix_new
    iy_s[:, :] = iy_new
    jx_s[:, :] = jx_new
    jy_s[:, :] = jy_new
    c0_s[:, 0:1] = ix0_new
    c0_s[:, 1:2] = jx0_new

    m_out_ref[0, :, :] = m_new

    # capture each pair's final state row (i == lx-1) into accumulators;
    # the column-ly extraction runs once, on the last grid step
    is_last_row = lxf_ref[:, 0:1] == jnp.float32(1.0) * (i + 1)

    @pl.when(i == 0)
    def _():
        for acc in (am_s, aix_s, aiy_s, ajx_s, ajy_s):
            acc[:, :] = jnp.full(insy.shape, LOG_ZERO, jnp.float32)

    am_s[:, :] = jnp.where(is_last_row, m_new, am_s[:, :])
    aix_s[:, :] = jnp.where(is_last_row, ix_new, aix_s[:, :])
    aiy_s[:, :] = jnp.where(is_last_row, iy_new, aiy_s[:, :])
    ajx_s[:, :] = jnp.where(is_last_row, jx_new, ajx_s[:, :])
    ajy_s[:, :] = jnp.where(is_last_row, jy_new, ajy_s[:, :])

    @pl.when(i == n_rows - 1)
    def _():
        sel = lymask_ref[:, :] > 0.5
        stacked = jnp.concatenate(
            [am_s[:, :], aix_s[:, :], aiy_s[:, :],
             ajx_s[:, :], ajy_s[:, :]], axis=0)
        sel5 = jnp.concatenate([sel] * 5, axis=0)
        vals = jnp.max(jnp.where(sel5, stacked, NEG_BIG), axis=1)  # (5P,)
        pcount = insy.shape[0]
        sly_ref[:, :] = jnp.concatenate(
            [vals.reshape(5, pcount).T,
             jnp.zeros((pcount, 128 - 5), jnp.float32)], axis=1)


# ---------------------------------------------------------------------------
# Backward kernel (forward-style over reversed sequences)
# ---------------------------------------------------------------------------

def _bwd_kernel(kk, impl, params, *refs):
    """Grid step u computes RB row u; m_out row u holds RB_M(u, v) for
    v = 0..L-1 (column v=0 included via the shifted write). kk dispatch
    as in _fwd_kernel (None = streamed emission row, K = fused).
    reference: src/bwdflat3.cpp:10-190.
    """
    if kk is None:
        (e_ref, insx_ref, insy_ref, m_out_ref,
         m_s, ix_s, iy_s, jx_s, jy_s, c0_s) = refs
    else:
        (xm_ref, oy_ref, insx_ref, insy_ref, m_out_ref,
         m_s, ix_s, iy_s, jx_s, jy_s, c0_s) = refs
    u = pl.program_id(1)
    L = insy_ref.shape[1]
    scan2, log_add, log_add5 = _impl_fns(impl)
    tSM = params[:, P_TSM:P_TSM + 1]
    tSI = params[:, P_TSI:P_TSI + 1]
    tSJ = params[:, P_TSJ:P_TSJ + 1]
    tMM = params[:, P_TMM:P_TMM + 1]
    tMI = params[:, P_TMI:P_TMI + 1]
    tMJ = params[:, P_TMJ:P_TMJ + 1]
    tII = params[:, P_TII:P_TII + 1]
    tIM = params[:, P_TIM:P_TIM + 1]
    tJJ = params[:, P_TJJ:P_TJJ + 1]
    tJM = params[:, P_TJM:P_TJM + 1]

    insy = insy_ref[:, :]

    @pl.when(u == 0)
    def _():
        lz = jnp.full(insy.shape, LOG_ZERO, jnp.float32)
        iy0 = tSI + _cumsum_lanes(insy + tII, L)
        jy0 = tSJ + _cumsum_lanes(insy + tJJ, L)
        m0 = log_add(tMI + _shift_fill(iy0, tSI) + insy,
                     tMJ + _shift_fill(jy0, tSJ) + insy)
        m_s[:, :] = m0
        ix_s[:, :] = lz
        jx_s[:, :] = lz
        iy_s[:, :] = iy0
        jy_s[:, :] = jy0
        c0lane = jax.lax.broadcasted_iota(jnp.int32, c0_s.shape, 1)
        # lanes: 0 = IX(0,0)=tSI, 1 = JX(0,0)=tSJ, 2 = M(0,0)=tSM
        c0_s[:, :] = jnp.where(
            c0lane == 0, tSI,
            jnp.where(c0lane == 1, tSJ,
                      jnp.where(c0lane == 2, tSM, 0.0)))
        m_out_ref[0, :, :] = _shift_fill(m0, tSM)

    @pl.when(u > 0)
    def _():
        m_p = m_s[:, :]
        ix_p = ix_s[:, :]
        iy_p = iy_s[:, :]
        jx_p = jx_s[:, :]
        jy_p = jy_s[:, :]
        ix0_p = c0_s[:, 0:1]
        jx0_p = c0_s[:, 1:2]
        m0_p = c0_s[:, 2:3]

        if kk is None:
            e_row = e_ref[0, :, :]
        else:
            e_row = _emission_row(xm_ref, oy_ref, kk)
        insx = insx_ref[0, :, :]   # (P, 1), row u-1 via the BlockSpec

        next_m = _shift_fill(m_p, m0_p) + e_row   # (u-1, v-1)
        next_ix = ix_p + insx                      # (u-1, v)
        next_jx = jx_p + insx

        ix_new = log_add(tII + next_ix, tIM + next_m)
        jx_new = log_add(tJJ + next_jx, tJM + next_m)
        ix0_new = tII + ix0_p + insx
        jx0_new = tJJ + jx0_p + insx
        m0_new = log_add(tMI + ix0_p + insx, tMJ + jx0_p + insx)

        iy_new, jy_new = scan2(insy + tII, tIM + next_m,
                               insy + tJJ, tJM + next_m, L)

        next_iy = _shift_fill(iy_new, LOG_ZERO) + insy
        next_jy = _shift_fill(jy_new, LOG_ZERO) + insy
        m_new = log_add5(tMM + next_m,
                         tMI + next_ix,
                         tMJ + next_jx,
                         tMI + next_iy,
                         tMJ + next_jy)

        m_s[:, :] = m_new
        ix_s[:, :] = ix_new
        iy_s[:, :] = iy_new
        jx_s[:, :] = jx_new
        jy_s[:, :] = jy_new
        c0_s[:, 0:1] = ix0_new
        c0_s[:, 1:2] = jx0_new
        c0_s[:, 2:3] = m0_new

        m_out_ref[0, :, :] = _shift_fill(m_new, m0_new)


# ---------------------------------------------------------------------------
# Fused backward + posterior kernel
# ---------------------------------------------------------------------------

def _flip_lanes(x):
    """Reverse the lane (minor) axis of a (P, L) block: static reorder
    of 128-lane chunks + one exchange-matrix MXU matmul per chunk
    (P*L*128 MACs per row — negligible next to the VPU scan cost;
    Mosaic has no native lane reversal)."""
    p, L = x.shape
    ra = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ca = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    jmat = (ra + ca == 127).astype(jnp.float32)
    # HIGHEST precision: the default MXU pass truncates the f32
    # log-space values to bf16 (measured: corrupts posteriors on chip
    # while interpret mode passes)
    parts = [jnp.dot(x[:, k * 128:(k + 1) * 128], jmat,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
             for k in range(L // 128)]
    parts.reverse()
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def _bwd_post_kernel(n_rows, kk, impl, with_mea, flip_e, params, *refs):
    """Backward recurrence + posterior combine in ONE pass.

    Consumes PLAIN-FLIPPED padded sequences (x_flip[p] = x_pad[Bx-1-p],
    same for y): the reversed sequence sits at the END of the buffer, so
    the state at grid step u, lane q is B(i = Bx-u, j = By-q) — STATIC
    in (u, q) across pairs of different lengths. The forward M lattice
    row Bx-1-u (= F(i=Bx-u, .)) is streamed in via the BlockSpec, the
    backward M row is lane-flipped into forward column order, and the
    posterior row exp(F + B - total) is written directly at forward
    coordinates. The RB lattice never exists, and the per-pair
    roll/gather of the old _finish_posteriors disappears.

    Leading padding is handled in-kernel:
      * rows u <= u0 = Bx-lx keep the boundary-init state (per-pair
        pinning select), so the real recurrence starts at u0 exactly
        like row 0 of the start-aligned kernel;
      * padding lanes q < q0 = By-ly of the M/IX/JX state rows CARRY
        the column-0 boundary chains (m0/ix0/jx0): with the emission
        and insy forced to LOG_ZERO there, the ordinary row updates
        degenerate to exactly the chain recurrences, so the one-lane
        shift delivers the correct boundary value into lane q0 with no
        per-pair logic. Pairs with ly == By (q0 = 0) use the c0_s
        side-channel fills, as before.

    reference: src/bwdflat3.cpp:10-190 (recurrence),
    src/calcposteriorflat.cpp:4-27 (combine + 0.01 threshold).
    """
    if kk is None:
        (e_ref, insx_ref, insy_ref, fm_ref, lens_ref, post_ref,
         *rest) = refs
    else:
        (xm_ref, oy_ref, insx_ref, insy_ref, fm_ref, lens_ref, post_ref,
         *rest) = refs
    if with_mea:
        (mea_ref, m_s, ix_s, iy_s, jx_s, jy_s, c0_s, mea_s) = rest
    else:
        (m_s, ix_s, iy_s, jx_s, jy_s, c0_s) = rest
    u = pl.program_id(1)
    L = insy_ref.shape[1]
    scan2, log_add, log_add5 = _impl_fns(impl)
    tSM = params[:, P_TSM:P_TSM + 1]
    tSI = params[:, P_TSI:P_TSI + 1]
    tSJ = params[:, P_TSJ:P_TSJ + 1]
    tMM = params[:, P_TMM:P_TMM + 1]
    tMI = params[:, P_TMI:P_TMI + 1]
    tMJ = params[:, P_TMJ:P_TMJ + 1]
    tII = params[:, P_TII:P_TII + 1]
    tIM = params[:, P_TIM:P_TIM + 1]
    tJJ = params[:, P_TJJ:P_TJJ + 1]
    tJM = params[:, P_TJM:P_TJM + 1]
    tot = params[:, P_TOT:P_TOT + 1]

    lxv = lens_ref[:, 0:1]                     # (P, 1) f32 lx
    lyv = lens_ref[:, 1:2]                     # (P, 1) f32 ly
    u0 = jnp.float32(n_rows) - lxv             # first REAL row
    lane = jax.lax.broadcasted_iota(jnp.int32, insy_ref.shape, 1)
    lanef = lane.astype(jnp.float32)
    q0 = jnp.float32(L) - lyv                  # first REAL lane
    padmask = lanef < q0

    insy_raw = insy_ref[:, :]
    insy = jnp.where(padmask, LOG_ZERO, insy_raw)

    @pl.when(u == 0)
    def _():
        # boundary row B(lx, .) — identical math to the start-aligned
        # init, with the cumsum summand masked to zero over padding so
        # real lanes accumulate from q0, and padding lanes set to the
        # chain inits (tSI/tSJ/tSM)
        cum_i = _cumsum_lanes(jnp.where(padmask, 0.0, insy_raw + tII), L)
        iy0 = jnp.where(padmask, tSI, tSI + cum_i)
        cum_j = _cumsum_lanes(jnp.where(padmask, 0.0, insy_raw + tJJ), L)
        jy0 = jnp.where(padmask, tSJ, tSJ + cum_j)
        m0r = log_add(tMI + _shift_fill(iy0, tSI) + insy,
                      tMJ + _shift_fill(jy0, tSJ) + insy)
        m0r = jnp.where(padmask, tSM, m0r)
        m_s[:, :] = m0r
        ix_s[:, :] = jnp.where(padmask, tSI,
                               jnp.full(insy.shape, LOG_ZERO, jnp.float32))
        jx_s[:, :] = jnp.where(padmask, tSJ,
                               jnp.full(insy.shape, LOG_ZERO, jnp.float32))
        iy_s[:, :] = iy0
        jy_s[:, :] = jy0
        c0lane = jax.lax.broadcasted_iota(jnp.int32, c0_s.shape, 1)
        c0_s[:, :] = jnp.where(
            c0lane == 0, tSI,
            jnp.where(c0lane == 1, tSJ,
                      jnp.where(c0lane == 2, tSM, 0.0)))

    @pl.when(u > 0)
    def _():
        m_p = m_s[:, :]
        ix_p = ix_s[:, :]
        jx_p = jx_s[:, :]
        ix0_p = c0_s[:, 0:1]
        jx0_p = c0_s[:, 1:2]
        m0_p = c0_s[:, 2:3]

        if kk is None:
            e_row = e_ref[0, :, :]
            if flip_e:
                # streamed from the FORWARD emission lattice (row map
                # lx-u); lane-flip here instead of materializing a
                # flipped copy in HBM
                e_row = _flip_lanes(e_row)
        else:
            e_row = _emission_row(xm_ref, oy_ref, kk)
        e_row = jnp.where(padmask, LOG_ZERO, e_row)
        insx = insx_ref[0, :, :]   # (P, 1), row u-1 via the BlockSpec

        next_m = _shift_fill(m_p, m0_p) + e_row   # (u-1, v-1)
        next_ix = ix_p + insx                      # (u-1, v)
        next_jx = jx_p + insx

        ix_new = log_add(tII + next_ix, tIM + next_m)
        jx_new = log_add(tJJ + next_jx, tJM + next_m)
        ix0_new = tII + ix0_p + insx
        jx0_new = tJJ + jx0_p + insx
        m0_new = log_add(tMI + ix0_p + insx, tMJ + jx0_p + insx)

        iy_new, jy_new = scan2(insy + tII, tIM + next_m,
                               insy + tJJ, tJM + next_m, L)

        next_iy = _shift_fill(iy_new, LOG_ZERO) + insy
        next_jy = _shift_fill(jy_new, LOG_ZERO) + insy
        m_new = log_add5(tMM + next_m,
                         tMI + next_ix,
                         tMJ + next_jx,
                         tMI + next_iy,
                         tMJ + next_jy)

        # pin rows before the pair's boundary at their init state
        pin = jnp.float32(u) <= u0
        m_s[:, :] = jnp.where(pin, m_p, m_new)
        ix_s[:, :] = jnp.where(pin, ix_p, ix_new)
        iy_s[:, :] = jnp.where(pin, iy_s[:, :], iy_new)
        jx_s[:, :] = jnp.where(pin, jx_p, jx_new)
        jy_s[:, :] = jnp.where(pin, jy_s[:, :], jy_new)
        c0_s[:, 0:1] = jnp.where(pin, ix0_p, ix0_new)
        c0_s[:, 1:2] = jnp.where(pin, jx0_p, jx0_new)
        c0_s[:, 2:3] = jnp.where(pin, m0_p, m0_new)

    # combine: B_M row (shifted) + streamed F_M row (lane-flipped into
    # the backward's native column order) - total, thresholded at 0.01
    # (reference: src/calcposteriorflat.cpp:4-27). Rows with i > lx and
    # lanes with j > ly are masked to zero. Native-lane combine lets
    # the fused MEA row-scan consume the both-axes-reversed stream
    # (which preserves the MEA optimum — monotone paths map to
    # monotone paths); the row is lane-flipped once more for the
    # forward-coordinate lattice write.
    b_nat = _shift_fill(m_s[:, :], c0_s[:, 2:3])
    fm_nat = _flip_lanes(fm_ref[0, :, :])
    score = fm_nat + b_nat - tot
    pf = jnp.float32(n_rows) - 1.0 - jnp.float32(u)   # forward row index
    row_ok = pf < lxv
    valid = row_ok & jnp.logical_not(padmask)
    post_nat = jnp.where((score >= MIN_SPARSE_SCORE) & valid,
                         jnp.exp(jnp.minimum(score, 0.0)), 0.0)
    post_ref[0, :, :] = _flip_lanes(post_nat)

    if with_mea:
        # MEA running row over the reversed stream (the final corner
        # (i=1, j=1) lands at the last lane of the last grid step for
        # every pair — end-aligned). reference:
        # src/calcalnscoreflat.cpp:4-32.
        @pl.when(u == 0)
        def _():
            mea_s[:, :] = jnp.zeros(mea_s.shape, jnp.float32)

        old_row = mea_s[:, :]
        e = jnp.maximum(_shift_fill(old_row, 0.0) + post_nat, old_row)
        new_row = _max_scan_lanes(jnp.maximum(e, 0.0), L)
        mea_s[:, :] = new_row

        @pl.when(u == n_rows - 1)
        def _():
            pcount = new_row.shape[0]
            mea_ref[:, :] = jnp.concatenate(
                [new_row[:, L - 1:L],
                 jnp.zeros((pcount, 127), jnp.float32)], axis=1)


def _bwd_post_pallas(xm_flip_t, oy_flip, insx_flip_t, insy_flip, fm_t,
                     lens2, params_tot, tile_p, kk, impl="hillis",
                     with_mea=True, interpret=False):
    """Fused-emission backward + posterior (+ MEA score). xm_flip_t
    (Lx, B, 128) streamed match rows of the plain-flipped x; oy_flip
    (B, KP, Ly) one-hot of the plain-flipped y; fm_t (Lx, B, Ly)
    forward M lattice (start-aligned); lens2 (B, 128) with lane0=lx,
    lane1=ly; params_tot (B, 16) with lane 10 = total log-prob.
    Returns the (Lx, B, Ly) posterior lattice in forward coordinates
    and, with_mea, the (B, 128) MEA scores (lane 0)."""
    lx, b, _ = xm_flip_t.shape
    kp, ly = oy_flip.shape[1], oy_flip.shape[2]
    grid = (b // tile_p, lx)
    out_specs = [pl.BlockSpec((1, tile_p, ly),
                              lambda t, i: (lx - 1 - i, t, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((lx, b, ly), jnp.float32)]
    scratch = [pltpu.VMEM((tile_p, ly), jnp.float32)] * 5         + [pltpu.VMEM((tile_p, 128), jnp.float32)]
    if with_mea:
        out_specs.append(pl.BlockSpec((tile_p, 128),
                                      lambda t, i: (t, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, 128), jnp.float32))
        scratch.append(pltpu.VMEM((tile_p, ly), jnp.float32))
    res = pl.pallas_call(
        partial(_bwd_post_kernel, lx, kk, impl, with_mea, False),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_p, 16), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, 128),
                         lambda t, i: (jnp.maximum(i - 1, 0), t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, kp, ly), lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, 1),
                         lambda t, i: (jnp.maximum(i - 1, 0), t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, ly), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            # forward M row Bx-1-u — static flip of the row axis
            pl.BlockSpec((1, tile_p, ly),
                         lambda t, i: (lx - 1 - i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, 128), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if with_mea else out_specs[0],
        out_shape=out_shape if with_mea else out_shape[0],
        scratch_shapes=scratch,
        interpret=interpret,
    )(params_tot, xm_flip_t, oy_flip, insx_flip_t, insy_flip, fm_t,
      lens2)
    return res if with_mea else (res, None)


def _bwd_post_pallas_emissions(e_t, insx_t, insy_flip, fm_t,
                               lens2, params_tot, tile_p,
                               impl="hillis", with_mea=True,
                               interpret=False):
    """Fused backward+posterior from a precomputed emission lattice
    (letter and Muscle-3D profile paths): e_t (Lx, B, Ly) and insx_t
    (Lx, B, 1) are the SAME forward-layout arrays the forward kernel
    consumed — the backward streams them through flipped row maps and
    lane-flips in-kernel, so no flipped lattice copy ever exists in
    HBM. insy_flip (B, Ly) is the lane-flipped y insert row (small).
    Other args as _bwd_post_pallas."""
    lx, b, ly = e_t.shape
    grid = (b // tile_p, lx)
    out_specs = [pl.BlockSpec((1, tile_p, ly),
                              lambda t, i: (lx - 1 - i, t, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((lx, b, ly), jnp.float32)]
    scratch = [pltpu.VMEM((tile_p, ly), jnp.float32)] * 5         + [pltpu.VMEM((tile_p, 128), jnp.float32)]
    if with_mea:
        out_specs.append(pl.BlockSpec((tile_p, 128),
                                      lambda t, i: (t, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, 128), jnp.float32))
        scratch.append(pltpu.VMEM((tile_p, ly), jnp.float32))
    res = pl.pallas_call(
        partial(_bwd_post_kernel, lx, None, impl, with_mea, True),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_p, 16), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            # forward e row lx-u (step u consumes x char Bx-u); the
            # u=0 boundary step reads a clamped dummy row
            pl.BlockSpec((1, tile_p, ly),
                         lambda t, i: (jnp.minimum(lx - i, lx - 1),
                                       t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, 1),
                         lambda t, i: (jnp.minimum(lx - i, lx - 1),
                                       t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, ly), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, ly),
                         lambda t, i: (lx - 1 - i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, 128), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if with_mea else out_specs[0],
        out_shape=out_shape if with_mea else out_shape[0],
        scratch_shapes=scratch,
        interpret=interpret,
    )(params_tot, e_t, insx_t, insy_flip, fm_t, lens2)
    return res if with_mea else (res, None)


def _total_prob(f_end5, bstart):
    """Total log-prob fold from the forward final states — same LOG_ADD
    order as the reference (src/totalprobflat.cpp:3-16). bstart (B, 5)
    per-pair start scores in kernel sly order [M, IX, IY, JX, JY]."""
    b = f_end5.shape[0]
    tot = jnp.full((b,), LOG_ZERO, jnp.float32)
    for s in range(5):
        tot = _log_add(tot, f_end5[:, s] + bstart[:, s])
    return tot


# ---------------------------------------------------------------------------
# MEA score kernel
# ---------------------------------------------------------------------------

def _mea_kernel(post_ref, out_ref, row_s):
    """Row-scan MEA DP; out holds the running row and after the final
    grid step its last lane is the alignment score at (lx, ly)
    (posterior is zero outside the valid region, values monotone).
    reference: src/calcalnscoreflat.cpp:4-32.
    """
    i = pl.program_id(1)
    L = post_ref.shape[2]

    @pl.when(i == 0)
    def _():
        row_s[:, :] = jnp.zeros(row_s.shape, jnp.float32)

    old = row_s[:, :]
    p = post_ref[0, :, :]
    e = jnp.maximum(_shift_fill(old, 0.0) + p, old)
    new = _max_scan_lanes(jnp.maximum(e, 0.0), L)
    row_s[:, :] = new
    out_ref[:, :] = new[:, L - 1:L]


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------

def emission_matrix(codes_x, codes_y, match):
    """(B, Lx), (B, Ly) int codes -> (B, Lx, Ly) match-score lattice via
    two one-hot MXU matmuls (exact selection; no gathers)."""
    k = match.shape[0]
    ox = jax.nn.one_hot(codes_x, k, dtype=jnp.float32)
    oy = jax.nn.one_hot(codes_y, k, dtype=jnp.float32)
    xm = jax.lax.dot_general(ox, match, (((2,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(xm, oy, (((2,), (2,)), ((0,), (0,))),
                               precision=jax.lax.Precision.HIGHEST)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _fwd_pallas(e_t, insx_t, insy, lymask, lxf, params, tile_p,
                impl="hillis", interpret=False):
    """e_t: (Lx, B, Ly) emission lattice; insx_t: (Lx, B, 1) per-row x
    insert scores; lxf: (B, 128) float lx broadcast. Returns
    ((Lx, B, Ly) M lattice, (B, 128) final states at (lx, ly))."""
    lx, b, ly = e_t.shape
    grid = (b // tile_p, lx)
    m_lat, sly = pl.pallas_call(
        partial(_fwd_kernel, lx, None, impl),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_p, 16), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, ly), lambda t, i: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, 1), lambda t, i: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, ly), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, ly), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, 128), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_p, ly), lambda t, i: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, 128), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lx, b, ly), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_p, ly), jnp.float32)] * 5
        + [pltpu.VMEM((tile_p, 128), jnp.float32)]
        + [pltpu.VMEM((tile_p, ly), jnp.float32)] * 5,
        interpret=interpret,
    )(params, e_t, insx_t, insy, lymask, lxf)
    return m_lat, sly


def _bwd_pallas(e_rev_t, insx_rev_t, insy_rev, params, tile_p,
                impl="hillis"):
    """e_rev_t: (Lx, B, Ly) reversed emission lattice; insx_rev_t:
    (Lx, B, 1) reversed x insert scores. Returns the (Lx, B, Ly) RB_M
    lattice (row u, cols v=0..Ly-1)."""
    lx, b, ly = e_rev_t.shape
    grid = (b // tile_p, lx)
    m_lat = pl.pallas_call(
        partial(_bwd_kernel, None, impl),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_p, 16), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            # grid step u consumes emission row u-1 (row 0 is the
            # init-only boundary step and reads a dummy block)
            pl.BlockSpec((1, tile_p, ly),
                         lambda t, i: (jnp.maximum(i - 1, 0), t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, 1),
                         lambda t, i: (jnp.maximum(i - 1, 0), t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, ly), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_p, ly), lambda t, i: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lx, b, ly), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_p, ly), jnp.float32)] * 5
        + [pltpu.VMEM((tile_p, 128), jnp.float32)],
    )(params, e_rev_t, insx_rev_t, insy_rev)
    return m_lat


def _fwd_pallas_fused(xm_t, oy, insx_t, insy, lymask, lxf, params,
                      tile_p, kk, impl="hillis", interpret=False):
    """Fused-emission forward: xm_t (Lx, B, 128) streamed match-score
    rows (lanes 0..kk-1 valid), oy (B, KP, Ly) persistent one-hot of y.
    Returns ((Lx, B, Ly) M lattice, (B, 128) final states)."""
    lx, b, _ = xm_t.shape
    kp, ly = oy.shape[1], oy.shape[2]
    grid = (b // tile_p, lx)
    m_lat, sly = pl.pallas_call(
        partial(_fwd_kernel, lx, kk, impl),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_p, 16), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, 128), lambda t, i: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, kp, ly), lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, 1), lambda t, i: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, ly), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, ly), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, 128), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_p, ly), lambda t, i: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, 128), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lx, b, ly), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_p, ly), jnp.float32)] * 5
        + [pltpu.VMEM((tile_p, 128), jnp.float32)]
        + [pltpu.VMEM((tile_p, ly), jnp.float32)] * 5,
        interpret=interpret,
    )(params, xm_t, oy, insx_t, insy, lymask, lxf)
    return m_lat, sly


def _bwd_pallas_fused(xm_rev_t, oy_rev, insx_rev_t, insy_rev, params,
                      tile_p, kk, impl="hillis"):
    """Fused-emission backward (forward-style over reversed seqs)."""
    lx, b, _ = xm_rev_t.shape
    kp, ly = oy_rev.shape[1], oy_rev.shape[2]
    grid = (b // tile_p, lx)
    m_lat = pl.pallas_call(
        partial(_bwd_kernel, kk, impl),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_p, 16), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, 128),
                         lambda t, i: (jnp.maximum(i - 1, 0), t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, kp, ly), lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, 1),
                         lambda t, i: (jnp.maximum(i - 1, 0), t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, ly), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_p, ly), lambda t, i: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lx, b, ly), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_p, ly), jnp.float32)] * 5
        + [pltpu.VMEM((tile_p, 128), jnp.float32)],
    )(params, xm_rev_t, oy_rev, insx_rev_t, insy_rev)
    return m_lat


def mea_scores_pallas(post_t, tile_p=8, interpret=False):
    """post_t: (Lx, B, Ly) posterior lattice; returns (B,) MEA scores."""
    lx, b, ly = post_t.shape
    grid = (b // tile_p, lx)
    out = pl.pallas_call(
        _mea_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile_p, ly), lambda t, i: (i, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_p, 1), lambda t, i: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_p, ly), jnp.float32)],
        interpret=interpret,
    )(post_t)
    return out[:, 0]


# Default scan impl for the IY/JY within-row recurrence (names: see
# _impl_fns). "segpoly" won the committed on-chip A/B
# (docs/SCAN_AB.md, tools/ab_scan.py r3): vs "hillis" it is +3.6% at
# L=512, +9% at 1024, +13% at 2048; the "+all" variants (degree-8
# LOG_ADD in the M/IX/JX updates too) measured NO faster, so the base
# updates keep the reference cubic. Env override for A/B benchmarking;
# numeric gate: tools/validate_pallas.py.
import os as _os
SCAN_IMPL = _os.environ.get("MUSCLE_TPU_SCAN_IMPL", "segpoly")


_VMEM_BUDGET = 14 * 2 ** 20   # bytes of VMEM the kernel may plan for


def _pick_tile_p(b: int, ly: int | None = None, kp: int = 0) -> int:
    """Largest tile (<= 64) dividing the batch that fits the VMEM
    budget; 64 measured best on TPU at L<=1024, but VMEM scales as
    tile_p * (10 scratch rows + kp one-hot sublanes + pipeline
    buffers) * ly — tile_p=64 fails Mosaic compilation at L=2048
    (ADVICE r1), so longer alignments get smaller tiles."""
    for t in (64, 32, 16, 8):
        if b % t != 0:
            continue
        if ly is None:
            return t
        need = t * 4 * ((10 + kp + 5) * ly + 512)
        if need <= _VMEM_BUDGET:
            return t
    return 8 if b % 8 == 0 else 1


@partial(jax.jit,
         static_argnames=("with_mea", "tile_p", "scan_impl"))
def batch_posteriors_pallas_emissions(e, e_rev, ins_x, ins_y, ins_xr,
                                      ins_yr, lxb, lyb, start, tv,
                                      with_mea: bool = True,
                                      tile_p: int | None = None,
                                      scan_impl: str | None = None):
    """Pallas posterior path from precomputed emission matrices —
    shared by the letter pair-HMM and the Muscle-3D profile HMM."""
    b, bx, by = e.shape
    if tile_p is None:
        tile_p = _pick_tile_p(b, by)
    ii = jnp.arange(bx)
    jj = jnp.arange(by)
    lymask = (jj[None, :] == (lyb[:, None] - 1)).astype(jnp.float32)
    lxf = jnp.broadcast_to(lxb.astype(jnp.float32)[:, None], (b, 128))

    params = _params_rows(start, tv, b)

    impl = scan_impl or SCAN_IMPL
    # the fused bwd+posterior kernel's VMEM scratch scales with the lane
    # (Ly) axis and overflows Mosaic's scoped-vmem limit past ~9.9k even
    # at tile_p=8; larger profile/mega emissions fall back to the legacy
    # two-lattice kernels, which tile Ly and have no lane cap
    if FUSED and by <= FUSED_MAX_LY:
        # plain flips inside — e_rev (per-pair roll-flip) is NOT used
        bstart_b = jnp.broadcast_to(
            jnp.stack([start[0], start[1], start[1], start[3],
                       start[3]]), (b, 5))
        return _emissions_path_fused(e, ins_x, ins_y, lxb, lyb, params,
                                     bstart_b, tile_p, impl, with_mea,
                                     False)
    fm_t, f_end5 = _fwd_pallas(e.transpose(1, 0, 2),
                               ins_x.T[:, :, None], ins_y, lymask, lxf,
                               params, tile_p, impl)
    rbm_t = _bwd_pallas(e_rev.transpose(1, 0, 2),
                        ins_xr.T[:, :, None], ins_yr,
                        params, tile_p, impl)
    return _finish_posteriors(fm_t, rbm_t, f_end5, lxb, lyb, start,
                              with_mea, tile_p)


def _finish_posteriors(fm_t, rbm_t, f_end5, lxb, lyb, start, with_mea,
                       tile_p):
    """Posterior combine in the kernels' native (Lx, B, Ly) layout —
    one transpose total (the final output), not three."""
    bx, b, by = fm_t.shape
    ii = jnp.arange(bx)
    jj = jnp.arange(by)

    # total prob: F[s](lx, ly) + start scores (= B[s](lx, ly))
    bstart = jnp.stack([start[0], start[1], start[1], start[3], start[3]])
    # note kernel sly layout: [M, IX, IY, JX, JY]
    f_end = f_end5[:, :5]                  # (B, 5)
    tot = jnp.full((b,), LOG_ZERO, jnp.float32)
    for s in range(5):
        tot = _log_add(tot, f_end[:, s] + bstart[s])

    # posterior: combine F_M(i,j) with RB_M(lx-i, ly-j); the flip is a
    # full reverse + per-pair roll (valid region only — padding is
    # masked below)
    b_m_t = jax.vmap(
        lambda rb, lx, ly: jnp.roll(rb[::-1, ::-1],
                                    shift=(lx - bx, ly - by), axis=(0, 1)),
        in_axes=(1, 0, 0), out_axes=1,
    )(rbm_t, lxb, lyb)
    score = fm_t + b_m_t - tot[None, :, None]
    valid = (ii[:, None, None] < lxb[None, :, None]) & \
            (jj[None, None, :] < lyb[None, :, None])
    post_t = jnp.where((score >= MIN_SPARSE_SCORE) & valid,
                       jnp.exp(jnp.minimum(score, 0.0)),
                       0.0).astype(jnp.float32)

    if with_mea:
        scores = mea_scores_pallas(post_t, tile_p)
        ea = scores / jnp.minimum(lxb, lyb).astype(jnp.float32)
    else:
        b_ = post_t.shape[1]
        ea = jnp.zeros((b_,), jnp.float32)
    return post_t.transpose(1, 0, 2), ea


# fused backward+posterior path (round 3): the backward kernel streams
# the forward lattice and writes posterior rows directly — no RB
# lattice, no per-pair roll. Opt-out: MUSCLE_TPU_FUSED=0.
FUSED = _os.environ.get("MUSCLE_TPU_FUSED", "1") != "0"

# measured lane-axis (Ly) cap of the fused kernels at the minimum tile
# (scoped VMEM grows linearly in Ly: 19.85M at Ly=12288 vs the 16M
# Mosaic limit; last passing rung 9856). The long-pair router
# (pipeline/posteriors.py) and the emissions entry point both respect
# it; beyond the cap the legacy two-lattice kernels or the
# checkpoint-scan path take over.
FUSED_MAX_LY = 9856

# Letter emissions are PRECOMPUTED as a (B, Lx, Ly) lattice (two
# one-hot MXU matmuls) and streamed into the kernels whenever the four
# live lattices (e, e_flip, fm, post) fit this HBM budget: on-chip A/B
# measured 4.22 vs 3.45 Gcells/s at B=512/L=512 — the 21 in-kernel
# VPU emission passes per row cost more than the HBM round trip. The
# in-kernel build remains for larger-than-budget shapes (long pairs).
# Opt-out: MUSCLE_TPU_ELATTICE=0.
_ELATTICE_BUDGET = 6 << 30
ELATTICE = _os.environ.get("MUSCLE_TPU_ELATTICE", "1") != "0"


def _emissions_path_fused(e, ins_x, ins_y, lxb, lyb, params, bstart_b,
                          tile_p, impl, with_mea, interpret):
    """Fused posterior path from a precomputed (B, Lx, Ly) emission
    lattice (shared by the letter and Muscle-3D profile HMMs)."""
    b, bx, by = e.shape
    jj = jnp.arange(by)
    lymask = (jj[None, :] == (lyb[:, None] - 1)).astype(jnp.float32)
    lxf = jnp.broadcast_to(lxb.astype(jnp.float32)[:, None], (b, 128))
    fm_t, f_end5 = _fwd_pallas(e.transpose(1, 0, 2),
                               ins_x.T[:, :, None], ins_y, lymask, lxf,
                               params, tile_p, impl, interpret=interpret)
    tot = _total_prob(f_end5[:, :5], bstart_b)
    params_tot = params.at[:, P_TOT].set(tot)
    lane128 = jnp.arange(128)[None, :]
    lens2 = jnp.where(
        lane128 == 0, lxb.astype(jnp.float32)[:, None],
        jnp.where(lane128 == 1, lyb.astype(jnp.float32)[:, None], 0.0))
    post_t, mea128 = _bwd_post_pallas_emissions(
        e.transpose(1, 0, 2), ins_x.T[:, :, None], ins_y[:, ::-1],
        fm_t, lens2, params_tot, tile_p, impl, with_mea=with_mea,
        interpret=interpret)
    if with_mea:
        ea = mea128[:, 0] / jnp.minimum(lxb, lyb).astype(jnp.float32)
    else:
        ea = jnp.zeros((b,), jnp.float32)
    return post_t.transpose(1, 0, 2), ea


def _letter_path(xb, yb, lxb, lyb, kk, kp, xmt, oyt, ins, params,
                 bstart_b, tile_p, impl, with_mea, fused, interpret,
                 ematrix=None):
    """Shared device path for the letter pair-HMM (single-table and
    per-pair-table variants parameterize xmt/oyt/ins; ematrix, when
    given, builds the (B, Lx, Ly) emission lattice for the streamed
    path)."""
    b, bx = xb.shape
    by = yb.shape[1]

    if (fused and ematrix is not None and ELATTICE
            and 4 * 4 * b * bx * by <= _ELATTICE_BUDGET):
        return _emissions_path_fused(
            ematrix(xb, yb), ins(xb), ins(yb), lxb, lyb, params,
            bstart_b, _pick_tile_p(b, by), impl, with_mea, interpret)

    jj = jnp.arange(by)
    lymask = (jj[None, :] == (lyb[:, None] - 1)).astype(jnp.float32)
    lxf = jnp.broadcast_to(lxb.astype(jnp.float32)[:, None], (b, 128))

    fm_t, f_end5 = _fwd_pallas_fused(
        xmt(xb), oyt(yb), ins(xb).T[:, :, None], ins(yb),
        lymask, lxf, params, tile_p, kk, impl, interpret=interpret)

    if fused:
        tot = _total_prob(f_end5[:, :5], bstart_b)
        params_tot = params.at[:, P_TOT].set(tot)
        lane128 = jnp.arange(128)[None, :]
        lens2 = jnp.where(
            lane128 == 0, lxb.astype(jnp.float32)[:, None],
            jnp.where(lane128 == 1, lyb.astype(jnp.float32)[:, None],
                      0.0))
        xfl = xb[:, ::-1]
        yfl = yb[:, ::-1]
        post_t, mea128 = _bwd_post_pallas(
            xmt(xfl), oyt(yfl), ins(xfl).T[:, :, None], ins(yfl),
            fm_t, lens2, params_tot, tile_p, kk, impl,
            with_mea=with_mea, interpret=interpret)
        if with_mea:
            ea = mea128[:, 0] / jnp.minimum(lxb, lyb).astype(jnp.float32)
        else:
            ea = jnp.zeros((b,), jnp.float32)
        return post_t.transpose(1, 0, 2), ea

    # legacy two-lattice path (kept for A/B + fallback)
    xr = jax.vmap(lambda x, lx: jnp.roll(x[::-1], lx - bx))(xb, lxb)
    yr = jax.vmap(lambda y, ly: jnp.roll(y[::-1], ly - by))(yb, lyb)
    rbm_t = _bwd_pallas_fused(
        xmt(xr), oyt(yr), ins(xr).T[:, :, None], ins(yr),
        params, tile_p, kk, impl)
    return _finish_posteriors_b(fm_t, rbm_t, f_end5, lxb, lyb,
                                bstart_b, with_mea, tile_p)


@partial(jax.jit,
         static_argnames=("with_mea", "tile_p", "scan_impl", "fused",
                          "interpret"))
def batch_posteriors_pallas(xb, yb, lxb, lyb, match, insert, start, tv,
                            with_mea: bool = True,
                            tile_p: int | None = None,
                            scan_impl: str | None = None,
                            fused: bool | None = None,
                            interpret: bool = False):
    """Drop-in Pallas equivalent of ops.pairhmm.batch_posteriors.

    xb/yb must be padded to a 128-multiple length and B must be a
    multiple of tile_p (posteriors.all_pairs_posteriors arranges this).
    """
    b, bx = xb.shape
    by = yb.shape[1]
    kk = match.shape[0]
    kp = _round_up(kk, 8)
    if tile_p is None:
        tile_p = _pick_tile_p(b, by, kp)

    def xmt(codes):
        # (B, L) codes -> (L, B, 128) match-score rows, lanes 0..kk-1.
        # one-hot built on transposed codes so the big (L, B, 128)
        # output needs no layout change (transposing the tiny int codes
        # instead of the 128-lane f32 lattice).
        oxT = jax.nn.one_hot(codes.T, kk, dtype=jnp.float32)
        xm = jax.lax.dot_general(oxT, match, (((2,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST)
        return jnp.pad(xm, ((0, 0), (0, 0), (0, 128 - kk)))

    def oyt(codes):
        # (B, L) codes -> (B, KP, L) one-hot along sublanes
        oy = jax.nn.one_hot(codes, kk, dtype=jnp.float32,
                            axis=1)          # (B, kk, L)
        return jnp.pad(oy, ((0, 0), (0, kp - kk), (0, 0)))

    params = _params_rows(start, tv, b)
    bstart_b = jnp.broadcast_to(
        jnp.stack([start[0], start[1], start[1], start[3], start[3]]),
        (b, 5))
    impl = scan_impl or SCAN_IMPL
    if fused is None:
        fused = FUSED
    return _letter_path(xb, yb, lxb, lyb, kk, kp, xmt, oyt,
                        lambda c: insert[c], params, bstart_b, tile_p,
                        impl, with_mea, fused, interpret,
                        ematrix=lambda cx, cy: emission_matrix(
                            cx, cy, match))


@partial(jax.jit,
         static_argnames=("with_mea", "tile_p", "scan_impl", "fused",
                          "interpret"))
def batch_posteriors_pallas_multi(xb, yb, lxb, lyb, match_b, insert_b,
                                  start_b, tv_b,
                                  with_mea: bool = True,
                                  tile_p: int | None = None,
                                  scan_impl: str | None = None,
                                  fused: bool | None = None,
                                  interpret: bool = False):
    """batch_posteriors_pallas with per-pair score tables — match_b
    (B, K+1, K+1), insert_b (B, K+1), start_b (B, 5), tv_b (B, 7).

    This is the device path for ensemble replicate batching: pairs from
    differently perturbed HMMs share one kernel launch (the kernels read
    transitions as per-pair (P, 1) columns; emissions/inserts below are
    gathered from each pair's own tables)."""
    b, bx = xb.shape
    by = yb.shape[1]
    kk = match_b.shape[1]
    kp = _round_up(kk, 8)
    if tile_p is None:
        tile_p = _pick_tile_p(b, by, kp)

    def xmt(codes):
        # per-pair match rows, built directly in (L, B, 128) layout
        oxT = jax.nn.one_hot(codes.T, kk, dtype=jnp.float32)
        xm = jnp.einsum("lbk,bkm->lbm", oxT, match_b,
                        precision=jax.lax.Precision.HIGHEST)
        return jnp.pad(xm, ((0, 0), (0, 0), (0, 128 - kk)))

    def oyt(codes):
        oy = jax.nn.one_hot(codes, kk, dtype=jnp.float32, axis=1)
        return jnp.pad(oy, ((0, 0), (0, kp - kk), (0, 0)))

    def ins(codes):
        return jnp.take_along_axis(insert_b, codes, axis=1)

    params = _params_rows_multi(start_b, tv_b)
    bstart_b = jnp.stack([start_b[:, 0], start_b[:, 1], start_b[:, 1],
                          start_b[:, 3], start_b[:, 3]], axis=1)
    impl = scan_impl or SCAN_IMPL
    if fused is None:
        fused = FUSED

    def ematrix(cx, cy):
        # per-pair tables: one-hot x @ match_b @ one-hot y
        ox = jax.nn.one_hot(cx, kk, dtype=jnp.float32)
        xm = jnp.einsum("blk,bkm->blm", ox, match_b,
                        precision=jax.lax.Precision.HIGHEST)
        oy = jax.nn.one_hot(cy, kk, dtype=jnp.float32)
        return jnp.einsum("blm,bjm->blj", xm, oy,
                          precision=jax.lax.Precision.HIGHEST)

    return _letter_path(xb, yb, lxb, lyb, kk, kp, xmt, oyt, ins,
                        params, bstart_b, tile_p, impl, with_mea,
                        fused, interpret, ematrix=ematrix)


def _finish_posteriors_b(fm_t, rbm_t, f_end5, lxb, lyb, bstart_b,
                         with_mea, tile_p):
    """Legacy two-lattice posterior combine with per-pair start scores
    bstart_b (B, 5) in kernel sly order [M, IX, IY, JX, JY]."""
    bx, b, by = fm_t.shape
    ii = jnp.arange(bx)
    jj = jnp.arange(by)
    tot = _total_prob(f_end5[:, :5], bstart_b)

    b_m_t = jax.vmap(
        lambda rb, lx, ly: jnp.roll(rb[::-1, ::-1],
                                    shift=(lx - bx, ly - by), axis=(0, 1)),
        in_axes=(1, 0, 0), out_axes=1,
    )(rbm_t, lxb, lyb)
    score = fm_t + b_m_t - tot[None, :, None]
    valid = (ii[:, None, None] < lxb[None, :, None]) & \
            (jj[None, None, :] < lyb[None, :, None])
    post_t = jnp.where((score >= MIN_SPARSE_SCORE) & valid,
                       jnp.exp(jnp.minimum(score, 0.0)),
                       0.0).astype(jnp.float32)

    if with_mea:
        scores = mea_scores_pallas(post_t, tile_p)
        ea = scores / jnp.minimum(lxb, lyb).astype(jnp.float32)
    else:
        ea = jnp.zeros((post_t.shape[1],), jnp.float32)
    return post_t.transpose(1, 0, 2), ea
