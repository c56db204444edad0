"""Long-sequence pair-HMM: row-block checkpointing + recompute.

The reference hard-caps pairwise alignment at LX*LY*5+100 <= INT_MAX
(~21k x 21k, reference: src/calcpost.cpp:8-9, src/fwdflat3.cpp:17-18)
because it materializes full forward+backward lattices. This module
removes the cap (SURVEY §5 "long-context" axis): the Forward and
Backward scans run once storing only O(Lx/R) checkpointed carry rows
(5 states x (Ly+1) floats each), then each R-row block of the
posterior is reconstructed by re-running the scans from the nearest
checkpoints, combined with the streamed total probability, thresholded
at 0.01 and immediately sparsified to the fixed-K row layout
(ops/sparse.py). Peak memory is O(Ly * (Lx/R + R + K)) instead of
O(Lx * Ly) — a 25k x 25k pair needs ~100 MB of lattice blocks instead
of ~12 GB — at the cost of ~1.5x extra Backward compute.

All math reuses the exact scan steps of ops/pairhmm.py (same LOGEXP1
log-space, same boundary handling), so the blocked output equals the
monolithic scan wherever both fit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import pairhmm as ph
from .logspace import LOG_ZERO, log_add
from .sparse import sparsify


def _ceil_div(a, b):
    return -(-a // b)


@partial(jax.jit, static_argnames=("nrows", "bwd"))
def _run_block(xrows, y, row_state, i_start, match, insert, start, tv,
               nrows: int, bwd: bool):
    """Run `nrows` scan rows from carry (row_state, i_start) building
    emissions on device. Returns (M rows (nrows, Ly+1), final state)."""
    e = match[xrows][:, y]
    insx = insert[xrows]
    ins_y = insert[y]
    step = (ph.make_bwd_step if bwd else ph.make_fwd_step)(
        ins_y, start, tv)
    (state, _), rows = jax.lax.scan(step, (row_state, i_start),
                                    (e, insx))
    return rows[0], state


@partial(jax.jit, static_argnames=("kk", "ly"))
def _combine_block(fm_rows, rb_all, i0, u_base, lx, total, mea_row,
                   kk: int, ly: int):
    """Posterior rows for forward block rows i = i0+1 .. i0+R from
    F_M rows and recomputed RB_M rows (rb_all[t] = RB_M(u_base + t)).
    Returns (vals, cols, updated MEA running row)."""
    r = fm_rows.shape[0]
    # B_M(i, j) = RB_M(lx - i, ly - j); block row t has i = i0 + 1 + t
    loc = (lx - i0 - 1 - jnp.arange(r)) - u_base
    rb_sel = rb_all[loc]                     # (R, Ly+1), row t = RB(lx-i, :)
    b_m = jnp.flip(rb_sel, axis=1)[:, 1:]    # col j-1 = RB[.., ly-j]
    f_m = fm_rows[:, 1:]                     # j = 1..ly
    score = f_m + b_m - total
    post = jnp.where(score >= jnp.float32(ph.MIN_SPARSE_SCORE),
                     jnp.exp(jnp.minimum(score, 0.0)), 0.0)

    # MEA running row (reference: src/calcalnscoreflat.cpp)
    def mstep(old, prow):
        cand = jnp.maximum(old[:-1] + prow, old[1:])
        tail = jax.lax.associative_scan(jnp.maximum, cand)
        return jnp.concatenate([jnp.zeros(1, jnp.float32), tail]), None

    mea_row, _ = jax.lax.scan(mstep, mea_row, post)
    v, c, _ = sparsify(post[None], kk)
    return v[0], c[0], mea_row


def long_pair_posterior_sparse(x_codes: np.ndarray, y_codes: np.ndarray,
                               pack, k: int = 32, row_block: int = 512):
    """Posterior of one (possibly very long) pair in sparse form.

    x_codes/y_codes: int codes (unpadded). Returns
    (vals (Lx, k) f32, cols (Lx, k) int32, ea float, total float).
    """
    match, insert, start, tv = ph.score_args(pack)
    lx, ly = len(x_codes), len(y_codes)
    x = jnp.asarray(np.asarray(x_codes, np.int32))
    y = jnp.asarray(np.asarray(y_codes, np.int32))
    xr, yr = x[::-1], y[::-1]
    nb = _ceil_div(lx, row_block)

    def run_ckpt(codes_rows, codes_cols, boundary, bwd):
        state = boundary
        cks = [state]
        for b in range(nb):
            rows = codes_rows[b * row_block:
                              min((b + 1) * row_block, lx)]
            _, state = _run_block(rows, codes_cols, state,
                                  jnp.int32(b * row_block + 1),
                                  match, insert, start, tv,
                                  nrows=rows.shape[0], bwd=bwd)
            cks.append(state)
        return cks

    ins_y = insert[y]
    ins_yr = insert[yr]
    fwd_bound = ph.fwd_boundary_row(ly, ins_y, start, tv)
    bwd_bound = ph.bwd_boundary_row(ly, ins_yr, start, tv)
    fwd_cks = run_ckpt(x, y, fwd_bound, False)
    bwd_cks = run_ckpt(xr, yr, bwd_bound, True)

    # total prob: fold F[s](lx, ly) + start over states
    # (src/totalprobflat.cpp:3-16)
    fstate = fwd_cks[-1]
    bstart = jnp.stack([start[0], start[1], start[1], start[3], start[3]])
    total = jnp.full((), LOG_ZERO, jnp.float32)
    for s in range(5):
        total = log_add(total, fstate[s][ly] + bstart[s])

    vals_out = np.zeros((lx, k), np.float32)
    cols_out = np.full((lx, k), -1, np.int32)
    mea_row = jnp.zeros((ly + 1,), jnp.float32)

    for b in range(nb):
        i0 = b * row_block
        r = min(row_block, lx - i0)
        fm_rows, _ = _run_block(x[i0:i0 + r], y, fwd_cks[b],
                                jnp.int32(i0 + 1), match, insert,
                                start, tv, nrows=r, bwd=False)
        # backward rows u in [lx-i0-r, lx-i0-1]; resume from the
        # checkpoint at or below u_lo (spans <= 2 backward blocks)
        u_lo = lx - i0 - r
        u_hi = lx - i0 - 1
        cb_lo = u_lo // row_block
        u_ck = cb_lo * row_block
        need = u_hi - u_ck
        if need > 0:
            rb_rows, _ = _run_block(xr[u_ck:u_ck + need], yr,
                                    bwd_cks[cb_lo],
                                    jnp.int32(u_ck + 1), match, insert,
                                    start, tv, nrows=need, bwd=True)
        else:
            rb_rows = jnp.zeros((0, ly + 1), jnp.float32)
        if u_ck == 0:
            # include the u = 0 boundary row
            rb_all = jnp.concatenate([bwd_bound[0][None], rb_rows])
            u_base = 0
        else:
            rb_all = rb_rows
            u_base = u_ck + 1
        v, c, mea_row = _combine_block(
            fm_rows, rb_all, jnp.int32(i0), jnp.int32(u_base),
            jnp.int32(lx), total, mea_row, kk=k, ly=ly)
        vals_out[i0:i0 + r] = np.asarray(v)
        cols_out[i0:i0 + r] = np.asarray(c)

    mea = float(np.asarray(mea_row)[ly])
    ea = mea / min(lx, ly)
    return vals_out, cols_out, ea, float(np.asarray(total))
