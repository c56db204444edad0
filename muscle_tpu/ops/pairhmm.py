"""Batched pair-HMM Forward/Backward/posterior on TPU.

This is the numeric heart of the framework — the equivalent of the
reference's flat DP kernels (reference: src/fwdflat3.cpp:12-153,
src/bwdflat3.cpp:10-190, src/calcposteriorflat.cpp:4-27,
src/totalprobflat.cpp:3-16) re-designed for TPU execution:

* The reference walks the (LX+1)x(LY+1) lattice cell-by-cell. We
  restructure the recurrence as a `lax.scan` over rows: the M/IX/JX
  updates of a whole row are data-parallel given the previous row, and
  the within-row IY/JY dependence is an *affine recurrence in the log
  semiring*, solved with `lax.associative_scan` (O(log L) depth):
      T_j(u) = LOG_ADD(u + a_j, c_j)
      T2∘T1  = (a1+a2, LOG_ADD(c1+a2, c2))
  This keeps every step a wide VPU vector op — no scalar wavefront.

* Backward is computed as a *forward-style* scan over the reversed
  sequences (RB[s](u,v) = Bwd[s](LX-u, LY-v)), so batches of pairs with
  different lengths can be right-padded without padding cells ever
  feeding valid cells.

* Many pairs are processed per launch (vmap over the pair axis); the
  O(N^2) pair grid is the data-parallel axis that `parallel/` shards
  across chips.

States are ordered [M, IX, IY, JX, JY] as in src/pairhmm.h:11-19.
Log-space arithmetic uses the reference's LOGEXP1 polynomial
(ops/logspace.py) so results track the reference binary closely.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .logspace import LOG_ZERO, log_add, log_add5

MIN_SPARSE_PROB = 0.01                   # reference: src/mysparsemx.h:3
MIN_SPARSE_SCORE = float(np.log(0.01))   # reference: src/mysparsemx.h:4

# Bit-parity mode: replay the reference's sequential within-row LOG_ADD
# association instead of the O(log L) tree scan (see _row_affine_scan).
# Read once at import — the jit cache is keyed by traced code, so a
# mid-process flip would silently serve stale executables.
import os as _os
EXACT_ASSOC = _os.environ.get("MUSCLE_TPU_EXACT_ASSOC") == "1"


def _trans_vec(pack):
    """Scalar transition scores as a flat f32 vector for closure capture."""
    return jnp.array(
        [pack.tMM, pack.tMI, pack.tMJ, pack.tII, pack.tIM, pack.tJJ, pack.tJM],
        dtype=jnp.float32)


def _row_affine_scan(a, c):
    """Solve u_j = LOG_ADD(u_{j-1} + a_j, c_j), u_0 = LOG_ZERO, j = 1..n.

    Returns u_1..u_n given a, c of shape (..., n); scan along last axis.

    Association: the O(log L)-depth tree combine evaluates LOGEXP1 at
    different arguments than the reference's strictly sequential
    left-to-right LOG_ADD chain, and the cubic's ~1e-5 per-op
    approximation error is association-dependent — the two orders drift
    apart by up to ~1e-2 in posterior probability over ~400-column rows
    (measured; docs/PARITY.md "BB11005 divergence analysis"). The
    sequential mode (MUSCLE_TPU_EXACT_ASSOC=1, read at import — see
    _row_affine_scan_exact) replays the reference's exact order: O(L)
    scan depth, so ~the row length slower in latency and only worth it
    when bit-parity with the reference binary matters more than speed.
    """
    def combine(x, y):
        a1, c1 = x
        a2, c2 = y
        return a1 + a2, log_add(c1 + a2, c2)

    _, u = jax.lax.associative_scan(combine, (a, c), axis=-1)
    return u


def _row_affine_scan_exact(t_ext, c_base, emit):
    """Reference-order within-row recurrence (EXACT_ASSOC mode):
        u_j = LOG_ADD(u_{j-1} + t_ext, c_base_j) + emit_j,  u_0 = LOG_ZERO
    i.e. the emission is added AFTER the LOG_ADD (src/fwdflat3.cpp:
    `LOG_ADD(IY_IY, M_IY) + Emit_y`), unlike the tree formulation which
    folds it into both operands. 1-D over the row axis (vmap batches);
    O(L) scan depth."""
    def step(u, xs):
        cb, em = xs
        u2 = log_add(u + t_ext, cb) + em
        return u2, u2

    u0 = jnp.full((), LOG_ZERO, jnp.float32)
    _, u = jax.lax.scan(step, u0, (c_base, emit))
    return u


def _row_affine_scan_exact_bwd(t_ext, c_full, emit):
    """Reference-order backward within-row recurrence (EXACT_ASSOC):
        u_v = LOG_ADD(t_ext + (u_{v-1} + emit_v), c_full_v),  u_0 = LOG_ZERO
    (src/bwdflat3.cpp: `IY_IY = tII + NextIY` with
    `NextIY = IY(i,j+1) + Emit_y` — the transition is added OUTSIDE the
    emission-extended predecessor)."""
    def step(u, xs):
        cf, em = xs
        u2 = log_add(t_ext + (u + em), cf)
        return u2, u2

    u0 = jnp.full((), LOG_ZERO, jnp.float32)
    _, u = jax.lax.scan(step, u0, (c_full, emit))
    return u


def _seq_chain_bwd(first, t_ext, emits):
    """Reference-order backward boundary chain: u_1 = first;
    u_{k+1} = t_ext + (u_k + emits_k) (src/bwdflat3.cpp i==LX row)."""
    def step(u, em):
        u2 = t_ext + (u + em)
        return u2, u2

    _, rest = jax.lax.scan(step, first, emits)
    return jnp.concatenate([first[None], rest])


def _seq_chain(first, t_ext, emits):
    """Reference-order boundary chain: u_1 = first;
    u_{k+1} = (u_k + t_ext) + emits_k. Returns (u_1..u_{n+1}) for n
    emits. (jnp.cumsum is a tree reduction whose f32 grouping drifts
    ~6e-3 from the sequential chain over ~400 terms at log-prob
    magnitudes ~1e3 — measured, docs/PARITY.md BB11005 analysis.)"""
    def step(u, em):
        u2 = u + t_ext + em
        return u2, u2

    _, rest = jax.lax.scan(step, first, emits)
    return jnp.concatenate([first[None], rest])


def _forward_scan(e, ins_x, ins_y, start, tv):
    """Forward lattice for one pair from an emission matrix.

    e: (Bx, By) match scores (e[i-1, j-1] scores aligning x_i to y_j);
    ins_x/ins_y: per-position insert scores. Emission-matrix form serves
    both the letter pair-HMM (ops builds e from the match table) and the
    Muscle-3D feature-profile HMM (e from weighted feature tables,
    reference: src/fwdflat_mega.cpp).

    Returns a 5-tuple of (Bx+1, By+1) float32 lattices in state order
    [M, IX, IY, JX, JY]. Per-state arrays keep the minor dims as the
    large (i, j) axes — a (B, L, 5, L) stack would tile-pad the 5-axis
    on TPU (observed 24x HBM blowup).
    reference: src/fwdflat3.cpp:12-153.
    """
    row0 = fwd_boundary_row(e.shape[1], ins_y, start, tv)
    step = make_fwd_step(ins_y, start, tv)
    (_, _), rows = jax.lax.scan(step, (row0, jnp.int32(1)), (e, ins_x))
    return tuple(jnp.concatenate([r0[None], rs])
                 for r0, rs in zip(row0, rows))       # 5 x (Bx+1, By+1)


def fwd_boundary_row(By, ins_y, start, tv):
    """Forward row 0 (i = 0) boundary: src/fwdflat3.cpp:35-93."""
    tII, tJJ = tv[3], tv[5]
    tSI, tSJ = start[1], start[3]
    lz = jnp.full((By + 1,), LOG_ZERO, dtype=jnp.float32)
    # IY(0,1) = tSI + ins(y0); IY(0,j) = IY(0,j-1) + tII + ins(y_{j-1})
    if EXACT_ASSOC:
        iy0 = jnp.concatenate([lz[:1], _seq_chain(tSI + ins_y[0],
                                                  tII, ins_y[1:])])
        jy0 = jnp.concatenate([lz[:1], _seq_chain(tSJ + ins_y[0],
                                                  tJJ, ins_y[1:])])
        return (lz, lz, iy0, lz, jy0)
    ext_i = jnp.concatenate([jnp.reshape(tSI, (1,)) + ins_y[:1],
                             tII + ins_y[1:]])
    ext_j = jnp.concatenate([jnp.reshape(tSJ, (1,)) + ins_y[:1],
                             tJJ + ins_y[1:]])
    iy0 = jnp.concatenate([lz[:1], jnp.cumsum(ext_i)])
    jy0 = jnp.concatenate([lz[:1], jnp.cumsum(ext_j)])
    return (lz, lz, iy0, lz, jy0)                    # (M, IX, IY, JX, JY)


def make_fwd_step(ins_y, start, tv):
    """Forward row-step fn for lax.scan; carry = (5-row tuple, absolute
    1-based row index). Factored out so the long-sequence blocked path
    (ops/pairhmm_long.py) can resume from a checkpointed carry."""
    tMM, tMI, tMJ, tII, tIM, tJJ, tJM = (tv[k] for k in range(7))
    tSM, tSI, tSJ = start[0], start[1], start[3]
    jpos = jnp.arange(1, ins_y.shape[0] + 1)

    def step(carry, xi):
        prev, i = carry                      # prev: 5-tuple of (By+1,); i = row (1-based)
        emit_row, insx = xi                  # emission row for DP row i
        m_p, ix_p, iy_p, jx_p, jy_p = prev

        # M row: all five predecessors at (i-1, j-1)
        m_new = log_add5(m_p[:-1] + tMM,
                         ix_p[:-1] + tIM,
                         jx_p[:-1] + tJM,
                         iy_p[:-1] + tIM,
                         jy_p[:-1] + tJM) + emit_row
        # start transition: M(1,1) = tSM + emit (src/fwdflat3.cpp:110-111)
        m_new = jnp.where((i == 1) & (jpos == 1), tSM + emit_row, m_new)

        # IX/JX rows: predecessors at (i-1, j)
        ix_new = log_add(ix_p[1:] + tII, m_p[1:] + tMI) + insx
        jx_new = log_add(jx_p[1:] + tJJ, m_p[1:] + tMJ) + insx

        # column 0: M/IY/JY = LOG_ZERO; IX/JX extend down the first column
        ix0 = jnp.where(i == 1, tSI + insx, ix_p[0] + tII + insx)
        jx0 = jnp.where(i == 1, tSJ + insx, jx_p[0] + tJJ + insx)

        m_row = jnp.concatenate([jnp.full((1,), LOG_ZERO, jnp.float32), m_new])
        ix_row = jnp.concatenate([ix0[None], ix_new])
        jx_row = jnp.concatenate([jx0[None], jx_new])

        # IY/JY rows: within-row affine recurrence over j
        ins_y_ = ins_y
        if EXACT_ASSOC:
            iy_new = _row_affine_scan_exact(tII, m_row[:-1] + tMI, ins_y_)
            jy_new = _row_affine_scan_exact(tJJ, m_row[:-1] + tMJ, ins_y_)
        else:
            a_i = tII + ins_y_
            c_i = m_row[:-1] + tMI + ins_y_
            iy_new = _row_affine_scan(a_i, c_i)
            a_j = tJJ + ins_y_
            c_j = m_row[:-1] + tMJ + ins_y_
            jy_new = _row_affine_scan(a_j, c_j)
        iy_row = jnp.concatenate([jnp.full((1,), LOG_ZERO, jnp.float32), iy_new])
        jy_row = jnp.concatenate([jnp.full((1,), LOG_ZERO, jnp.float32), jy_new])

        new = (m_row, ix_row, iy_row, jx_row, jy_row)
        return (new, i + 1), new

    return step


def _backward_scan(e_rev, ins_xr, ins_yr, start, tv):
    """Backward lattice as a forward-style scan over reversed sequences.

    e_rev[u-1, v-1] scores aligning xr_u to yr_v (reversed sequences).
    Returns a 5-tuple of (Bx+1, By+1) lattices with RB[s][u, v] =
    Bwd[s](LX-u, LY-v) for u <= LX, v <= LY (padded regions are garbage
    but never read). reference: src/bwdflat3.cpp:10-190.
    """
    row0 = bwd_boundary_row(e_rev.shape[1], ins_yr, start, tv)
    step = make_bwd_step(ins_yr, start, tv)
    (_, _), rows = jax.lax.scan(step, (row0, jnp.int32(1)),
                                (e_rev, ins_xr))
    return tuple(jnp.concatenate([r0[None], rs])
                 for r0, rs in zip(row0, rows))


def bwd_boundary_row(By, ins_y, start, tv):
    """Backward (reversed-scan) row u = 0 (i = LX) boundary."""
    tII, tJJ = tv[3], tv[5]
    tSM, tSI, tSJ = start[0], start[1], start[3]
    tMI, tMJ = tv[1], tv[2]
    lz = jnp.full((By + 1,), LOG_ZERO, dtype=jnp.float32)
    # IY(0,0)=tSI; IY(0,v) = IY(0,v-1) + ins(yr_{v-1}) + tII
    if EXACT_ASSOC:
        # reference order: IY(LX,j) = tII + (IY(LX,j+1) + Emit_y)
        iy0 = _seq_chain_bwd(jnp.asarray(tSI, jnp.float32), tII, ins_y)
        jy0 = _seq_chain_bwd(jnp.asarray(tSJ, jnp.float32), tJJ, ins_y)
        # M(LX,j) = LOG_ADD(tMI + (IY+ins), tMJ + (JY+ins))
        m0_tail = log_add(tMI + (iy0[:-1] + ins_y),
                          tMJ + (jy0[:-1] + ins_y))
    else:
        iy0 = tSI + jnp.concatenate([jnp.zeros(1, jnp.float32),
                                     jnp.cumsum(ins_y + tII)])
        jy0 = tSJ + jnp.concatenate([jnp.zeros(1, jnp.float32),
                                     jnp.cumsum(ins_y + tJJ)])
        # M(0,v) = LOG_ADD(tMI + IY(0,v-1)+ins, tMJ + JY(0,v-1)+ins); M(0,0)=tSM
        m0_tail = log_add(tMI + iy0[:-1] + ins_y, tMJ + jy0[:-1] + ins_y)
    m0 = jnp.concatenate([jnp.reshape(tSM, (1,)), m0_tail])
    ix0 = lz.at[0].set(tSI)
    jx0 = lz.at[0].set(tSJ)
    return (m0, ix0, iy0, jx0, jy0)


def make_bwd_step(ins_yr, start, tv):
    """Backward (reversed-scan) row-step fn; see make_fwd_step."""
    tMM, tMI, tMJ, tII, tIM, tJJ, tJM = (tv[k] for k in range(7))
    ins_y = ins_yr

    def step(carry, xi):
        prev, u = carry
        emit_row, insx = xi                    # match(xr_{u-1}, yr_{v-1}), v=1..By
        m_p, ix_p, iy_p, jx_p, jy_p = prev

        # "next" values, all from previous row (u-1)
        next_m = m_p[:-1] + emit_row           # at (u-1, v-1)
        next_ix = ix_p[1:] + insx              # at (u-1, v)
        next_jx = jx_p[1:] + insx

        # IX/JX rows (v >= 1): LOG_ADD(tII+nextIX, tIM+nextM)
        ix_new = log_add(tII + next_ix, tIM + next_m)
        jx_new = log_add(tJJ + next_jx, tJM + next_m)
        # column v = 0 (j = LY): IX extends via previous row col 0
        if EXACT_ASSOC:
            # reference order: tII + (IX_prev + Emit_x)
            ix_c0 = tII + (ix_p[0] + insx)
            jx_c0 = tJJ + (jx_p[0] + insx)
        else:
            ix_c0 = tII + ix_p[0] + insx
            jx_c0 = tJJ + jx_p[0] + insx
        ix_row = jnp.concatenate([ix_c0[None], ix_new])
        jx_row = jnp.concatenate([jx_c0[None], jx_new])

        # IY/JY rows: within-row affine recurrence
        # IY(u,v) = LOG_ADD(IY(u,v-1)+ins_y+tII, tIM + nextM_v)
        c_i = tIM + next_m
        c_j = tJM + next_m
        if EXACT_ASSOC:
            iy_new = _row_affine_scan_exact_bwd(tII, c_i, ins_y)
            jy_new = _row_affine_scan_exact_bwd(tJJ, c_j, ins_y)
        else:
            a_i = tII + ins_y
            # u_0 = IY(u, 0) = LOG_ZERO -> plain scan solution
            iy_new = _row_affine_scan(a_i, c_i)
            a_j = tJJ + ins_y
            jy_new = _row_affine_scan(a_j, c_j)
        iy_row = jnp.concatenate([jnp.full((1,), LOG_ZERO, jnp.float32), iy_new])
        jy_row = jnp.concatenate([jnp.full((1,), LOG_ZERO, jnp.float32), jy_new])

        # M row: needs IY/JY at (u, v-1) — the rows just computed, shifted
        next_iy = iy_row[:-1] + ins_y
        next_jy = jy_row[:-1] + ins_y
        m_new = log_add5(tMM + next_m,
                         tMI + next_ix,
                         tMJ + next_jx,
                         tMI + next_iy,
                         tMJ + next_jy)
        # column v = 0: M = LOG_ADD(tMI+nextIX, tMJ+nextJX) at (u-1, 0)
        if EXACT_ASSOC:
            m_c0 = log_add(tMI + (ix_p[0] + insx),
                           tMJ + (jx_p[0] + insx))
        else:
            m_c0 = log_add(tMI + ix_p[0] + insx, tMJ + jx_p[0] + insx)
        m_row = jnp.concatenate([m_c0[None], m_new])

        new = (m_row, ix_row, iy_row, jx_row, jy_row)
        return (new, u + 1), new

    return step


def _pair_posterior_e(e, e_rev, ins_x, ins_y, ins_xr, ins_yr,
                      lx, ly, start, tv):
    """Posterior matrix + total log-prob for a single (padded) pair,
    from precomputed (reversed) emission matrices and insert vectors.

    Returns (post (Bx, By) f32 zero outside valid region, total f32 scalar).
    """
    Bx = e.shape[0]
    By = e.shape[1]
    ii = jnp.arange(Bx)
    jj = jnp.arange(By)

    F = _forward_scan(e, ins_x, ins_y, start, tv)
    RB = _backward_scan(e_rev, ins_xr, ins_yr, start, tv)

    # total prob: LOG_ADD fold over states of F[s](lx,ly) + B[s](lx,ly)
    # where B(lx,ly) = RB(0,0) = start scores (src/totalprobflat.cpp:3-16)
    total = jnp.full((), LOG_ZERO, jnp.float32)
    for s in range(5):                       # state order M,IX,IY,JX,JY
        total = log_add(total, F[s][lx, ly] + RB[s][0, 0])

    # posterior: P[i-1,j-1] = exp(F_M(i,j) + B_M(i,j) - total), thresholded
    f_m = F[0][1:, 1:]                       # (Bx, By) at (i,j), i,j >= 1
    # B_M(i,j) = RB_M(lx-i, ly-j): flip + roll (cheap slices, no gather);
    # RB rows 0..Bx represent u; we need u = lx-i for i = 1..Bx
    rbm = RB[0][:Bx, :By]                    # u = 0..Bx-1, v = 0..By-1
    b_m = jnp.roll(rbm[::-1, ::-1], shift=(lx - Bx, ly - By), axis=(0, 1))
    score = f_m + b_m - total
    valid = (ii[:, None] < lx) & (jj[None, :] < ly)
    post = jnp.where((score >= MIN_SPARSE_SCORE) & valid,
                     jnp.exp(jnp.minimum(score, 0.0)), 0.0)
    return post.astype(jnp.float32), total


def _mea_score(post, lx, ly):
    """Max-expected-accuracy DP score over a posterior matrix.

    NewRow[j] = max(Old[j-1] + P[i,j], Old[j], NewRow[j-1]) with zero
    boundaries; the within-row dependence is a running max (cummax).
    Valid because post is zero outside the (lx, ly) region, so the final
    corner equals the score at (lx, ly).
    reference: src/calcalnscoreflat.cpp:4-32.
    """
    By = post.shape[1]

    def step(old, prow):
        cand = jnp.maximum(old[:-1] + prow, old[1:])
        new_tail = jax.lax.associative_scan(jnp.maximum, cand)
        new = jnp.concatenate([jnp.zeros(1, jnp.float32), new_tail])
        return new, None

    row_init = jnp.zeros(By + 1, jnp.float32)
    final, _ = jax.lax.scan(step, row_init, post)
    return final[By]


def total_prob_fwd(x, y, pack):
    """Total log-prob from the Forward lattice's far corner (reference:
    src/totalprobflat.cpp:3-16). x, y: UNPADDED int code arrays."""
    match, insert, start, tv = score_args(pack)
    lx, ly = x.shape[0], y.shape[0]
    e = match[x][:, y]
    F = _forward_scan(e, insert[x], insert[y], start, tv)
    bstart = (start[0], start[1], start[1], start[3], start[3])
    tot = jnp.full((), LOG_ZERO, jnp.float32)
    for s in range(5):
        tot = log_add(tot, F[s][lx, ly] + bstart[s])
    return tot


def total_prob_bwd(x, y, pack):
    """Total log-prob from the Backward lattice (forward-style scan
    over the reversed sequences, folded at ITS far corner) — an
    independent path that must agree with total_prob_fwd (reference
    dev command: -testfb, src/testfb.cpp)."""
    match, insert, start, tv = score_args(pack)
    lx, ly = x.shape[0], y.shape[0]
    xr, yr = x[::-1], y[::-1]
    e_rev = match[xr][:, yr]
    RB = _backward_scan(e_rev, insert[xr], insert[yr], start, tv)
    bstart = (start[0], start[1], start[1], start[3], start[3])
    tot = jnp.full((), LOG_ZERO, jnp.float32)
    for s in range(5):
        tot = log_add(tot, RB[s][lx, ly] + bstart[s])
    return tot


def reverse_padded(arr, lens, axis_len):
    """Per-row reverse of right-padded data: out[k] = arr[len-1-k]."""
    return jax.vmap(lambda a, l: jnp.roll(jnp.flip(a, 0), l - axis_len,
                                          axis=0))(arr, lens)


@partial(jax.jit, static_argnames=("with_mea",))
def batch_posteriors_emissions(e, e_rev, ins_x, ins_y, ins_xr, ins_yr,
                               lxb, lyb, start, tv, with_mea: bool = True):
    """Posteriors (+ EA) from precomputed emission matrices — shared by
    the letter pair-HMM and the Muscle-3D feature-profile HMM."""
    post, _total = jax.vmap(
        lambda *a: _pair_posterior_e(*a, start, tv)
    )(e, e_rev, ins_x, ins_y, ins_xr, ins_yr, lxb, lyb)
    if with_mea:
        scores = jax.vmap(_mea_score)(post, lxb, lyb)
        ea = scores / jnp.minimum(lxb, lyb).astype(jnp.float32)
    else:
        ea = jnp.zeros(e.shape[0], jnp.float32)
    return post, ea


@partial(jax.jit, static_argnames=("with_mea",))
def batch_posteriors_emissions_multi(e, e_rev, ins_x, ins_y, ins_xr,
                                     ins_yr, lxb, lyb, start_b, tv_b,
                                     with_mea: bool = True):
    """Per-pair-parameter variant of batch_posteriors_emissions: start_b
    (B, 5) / tv_b (B, 7) give each pair its own transition scores. Used
    by the ensemble replicate batching, where pairs from differently
    perturbed HMMs share one device stream (SURVEY §7: replicates are
    embarrassingly parallel — run them as the outer batch axis)."""
    post, _total = jax.vmap(_pair_posterior_e)(
        e, e_rev, ins_x, ins_y, ins_xr, ins_yr, lxb, lyb, start_b, tv_b)
    if with_mea:
        scores = jax.vmap(_mea_score)(post, lxb, lyb)
        ea = scores / jnp.minimum(lxb, lyb).astype(jnp.float32)
    else:
        ea = jnp.zeros(e.shape[0], jnp.float32)
    return post, ea


@partial(jax.jit, static_argnames=("with_mea",))
def batch_posteriors_multi(xb, yb, lxb, lyb, match_b, insert_b, start_b,
                           tv_b, with_mea: bool = True):
    """batch_posteriors with per-pair score tables: match_b (B, K+1, K+1),
    insert_b (B, K+1), start_b (B, 5), tv_b (B, 7)."""
    b, bx = xb.shape
    by = yb.shape[1]
    xr = reverse_padded(xb, lxb, bx)
    yr = reverse_padded(yb, lyb, by)
    e = jax.vmap(lambda m, x, y: m[x][:, y])(match_b, xb, yb)
    e_rev = jax.vmap(lambda m, x, y: m[x][:, y])(match_b, xr, yr)
    gi = jax.vmap(lambda t, i: t[i])
    return batch_posteriors_emissions_multi(
        e, e_rev, gi(insert_b, xb), gi(insert_b, yb), gi(insert_b, xr),
        gi(insert_b, yr), lxb, lyb, start_b, tv_b, with_mea=with_mea)


def score_args_multi(packs, rep_idx):
    """Stacked per-pair score tables for batch_posteriors_multi:
    packs[rep_idx[i]] supplies pair i's tables. Returns device arrays
    (match_b, insert_b, start_b, tv_b) indexed by the (B,) rep_idx."""
    ri = jnp.asarray(np.asarray(rep_idx, dtype=np.int32))
    match = jnp.asarray(np.stack([p.match for p in packs]))
    insert = jnp.asarray(np.stack([p.insert for p in packs]))
    start = jnp.asarray(np.stack([p.start for p in packs]))
    tv = jnp.stack([_trans_vec(p) for p in packs])
    return match[ri], insert[ri], start[ri], tv[ri]


@partial(jax.jit, static_argnames=("with_mea",))
def batch_posteriors(xb, yb, lxb, lyb, match, insert, start, tv,
                     with_mea: bool = True):
    """Posteriors (+ MEA/EA scores) for a batch of sequence pairs.

    Args:
      xb: (B, Bx) int32 codes, right-padded.
      yb: (B, By) int32 codes, right-padded.
      lxb, lyb: (B,) int32 true lengths.
      match, insert, start, tv: score tables from hmm.params.ScorePack
        (see `score_args`).

    Returns:
      post: (B, Bx, By) f32 posterior matrices (zero outside valid region)
      ea:   (B,) f32 expected accuracy = MEA score / min(lx, ly)
            (reference: src/calcposteriorflat.cpp:89-91) — zeros if
            with_mea=False.
    """
    b, bx = xb.shape
    by = yb.shape[1]
    xr = reverse_padded(xb, lxb, bx)
    yr = reverse_padded(yb, lyb, by)
    e = jax.vmap(lambda x, y: match[x][:, y])(xb, yb)
    e_rev = jax.vmap(lambda x, y: match[x][:, y])(xr, yr)
    return batch_posteriors_emissions(
        e, e_rev, insert[xb], insert[yb], insert[xr], insert[yr],
        lxb, lyb, start, tv, with_mea=with_mea)


def score_args(pack):
    """ScorePack -> device arrays accepted by batch_posteriors."""
    return (jnp.asarray(pack.match), jnp.asarray(pack.insert),
            jnp.asarray(pack.start), _trans_vec(pack))
