"""Y-striped fused pair-HMM kernels: Pallas speed with NO lane cap.

The fused kernels in ops/pairhmm_pallas.py keep five (P, Ly) state
rows resident in VMEM, which caps the lane (Ly) axis at ~9.9k
(FUSED_MAX_LY).  Pairs whose SHORTER side exceeds that cap previously
fell back to the per-pair checkpoint/recompute scan path
(ops/pairhmm_long.py) — correct and unbounded, but ~2-3 orders of
magnitude slower than the compiled kernels.  The reference serves
pairs up to ~21k x 21k from its single flat kernel
(reference: src/fwdflat3.cpp:17-18, src/calcpost.cpp:8-9); this module
covers that band (and beyond) at near-fused-kernel throughput.

Design — stripe the LANE axis, carry boundaries through HBM:

  * The padded Y axis is cut into stripes of width W (a 128-multiple
    <= the VMEM cap).  Each stripe is one `pallas_call` whose state
    rows are only (P, W); the DP recurrences that cross the stripe
    boundary (the one-lane shift into M, the in-row affine IY/JY
    scans, the MEA running max-scan) consume per-row boundary columns
    saved by the previous stripe:  stripe s's call reads the
    (n_rows, B, 128) boundary array written by stripe s-1 and writes
    its own.  Lane-0 carry injection into the affine scan is exact:
    u_0 = LOG_ADD(carry + a_0, c_0) composes the previous stripe's
    inclusive scan with this stripe's (the LOG_ADD association
    differs from the single-scan order by one fold, the same
    tolerance class as the segmented scan itself).

  * Forward runs twice (checkpoint/recompute): pass A sweeps stripes
    left-to-right saving ONLY boundaries + final states (the (Lx, B,
    Ly) M lattice for a 16k pair would be ~17 GB); pass B revisits
    each stripe right-to-left, recomputes its M stripe (~1 GB
    transient at W=2048), and immediately consumes it in the striped
    fused backward.

  * The backward+posterior+MEA kernel mirrors _bwd_post_kernel
    (plain-flipped end-aligned layout, so per-pair lengths stay
    static in (u, q)): backward stripe s' in reversed coordinates is
    exactly forward stripe S-1-s' under the in-kernel lane flip
    (W | By), so each backward stripe streams one recomputed forward
    M stripe and writes one posterior stripe in forward coordinates.
    Posterior stripes are top-K sparsified on device as they are
    produced and merged exactly (top-K of concatenated per-stripe
    top-Ks == global top-K).

Cost: 2x forward + 1x backward kernel work = ~1.5x the in-cap fused
path, vs ~100x for the checkpoint scan.  reference for all recurrence
semantics: src/fwdflat3.cpp, src/bwdflat3.cpp,
src/calcposteriorflat.cpp (0.01 threshold), src/calcalnscoreflat.cpp
(MEA running row).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .logspace import LOG_ZERO
from .pairhmm import MIN_SPARSE_SCORE
from . import pairhmm_pallas as pp
from .pairhmm_pallas import (
    NEG_BIG, P_TSM, P_TSI, P_TSJ, P_TMM, P_TMI, P_TMJ, P_TII, P_TIM,
    P_TJJ, P_TJM, P_TOT, _cumsum_lanes, _emission_row, _flip_lanes,
    _impl_fns, _max_scan_lanes, _params_rows, _round_up, _shift_fill,
    _total_prob,
)

# boundary-column slot layout (lanes of the (P, 128) per-row blocks)
_SM, _SIX, _SIY, _SJX, _SJY, _SMEA = 0, 1, 2, 3, 4, 5


def _bnd_row(*cols):
    """Pack per-state (P, 1) boundary columns into a (P, 128) block."""
    p = cols[0].shape[0]
    return jnp.concatenate(
        list(cols) + [jnp.zeros((p, 128 - len(cols)), jnp.float32)],
        axis=1)


def _inject_carry(a, c, carry, log_add):
    """Compose an incoming scan carry into lane 0 of the c operand:
    u_0 = LOG_ADD(carry + a_0, c_0)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    c0 = log_add(carry + a[:, 0:1], c[:, 0:1])
    return jnp.where(lane == 0, c0, c)


# ---------------------------------------------------------------------------
# Striped forward kernel (one stripe per pallas_call)
# ---------------------------------------------------------------------------

def _fwd_stripe_kernel(n_rows, kk, impl, first, store_m, params, *refs):
    """_fwd_kernel restricted to one lane stripe.  `first` (static)
    marks stripe 0 (column-0 chain active, no incoming boundary);
    later stripes read the previous stripe's per-row boundary columns
    (bnd_a = DP row i, bnd_b = DP row i+1) and the JAX-precomputed
    DP-row-0 slices."""
    (xm_ref, oy_ref, insx_ref, insy_ref, lymask_ref, lxf_ref,
     iy0_ref, jy0_ref, bnd0_ref, bnd_a_ref, bnd_b_ref,
     *outs_scratch) = refs
    if store_m:
        (bnd_out_ref, sly_ref, m_out_ref,
         m_s, ix_s, iy_s, jx_s, jy_s, c0_s,
         am_s, aix_s, aiy_s, ajx_s, ajy_s) = outs_scratch
    else:
        (bnd_out_ref, sly_ref,
         m_s, ix_s, iy_s, jx_s, jy_s, c0_s,
         am_s, aix_s, aiy_s, ajx_s, ajy_s) = outs_scratch

    e_row = _emission_row(xm_ref, oy_ref, kk)
    i = pl.program_id(1)
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

    @pl.when(i == 0)
    def _():
        lz = jnp.full(insy.shape, LOG_ZERO, jnp.float32)
        m_s[:, :] = lz
        ix_s[:, :] = lz
        jx_s[:, :] = lz
        # DP row 0 IY/JY: global cumsum slices precomputed in JAX
        iy_s[:, :] = iy0_ref[:, :]
        jy_s[:, :] = jy0_ref[:, :]
        c0_s[:, :] = jnp.full(c0_s.shape, LOG_ZERO, jnp.float32)

    m_p = m_s[:, :]
    ix_p = ix_s[:, :]
    iy_p = iy_s[:, :]
    jx_p = jx_s[:, :]
    jy_p = jy_s[:, :]

    insx = insx_ref[0, :, :]   # (P, 1)

    # previous-stripe boundary of the PREVIOUS DP row (row i): saved
    # by stripe s-1 at its step i-1; at i == 0 the DP row 0 boundary
    # comes from the JAX-computed bnd0 block
    if not first:
        prev = jnp.where(i == 0, bnd0_ref[:, :], bnd_a_ref[0, :, :])
        carr = bnd_b_ref[0, :, :]    # DP row i+1 at prev stripe last lane

    # M row: fold the five predecessor terms, shift by one lane.  In
    # stripe 0 the shifted-in value is the column-0 chain fold; in
    # later stripes it is the full five-state fold of the previous
    # stripe's last column (a real DP column).
    comb = log_add5(m_p + tMM, ix_p + tIM, jx_p + tJM,
                    iy_p + tIM, jy_p + tJM)
    if first:
        ix0_p = c0_s[:, 0:1]
        jx0_p = c0_s[:, 1:2]
        fill = log_add(ix0_p + tIM, jx0_p + tJM)
    else:
        fill = log_add5(prev[:, _SM:_SM + 1] + tMM,
                        prev[:, _SIX:_SIX + 1] + tIM,
                        prev[:, _SJX:_SJX + 1] + tJM,
                        prev[:, _SIY:_SIY + 1] + tIM,
                        prev[:, _SJY:_SJY + 1] + tJM)
    m_new = _shift_fill(comb, fill) + e_row
    if first:
        lane = jax.lax.broadcasted_iota(jnp.int32, e_row.shape, 1)
        m_new = jnp.where((i == 0) & (lane == 0), tSM + e_row, m_new)

    # IX/JX rows (vertical predecessors only — no stripe coupling)
    ix_new = log_add(ix_p + tII, m_p + tMI) + insx
    jx_new = log_add(jx_p + tJJ, m_p + tMJ) + insx

    if first:
        ix0_new = jnp.where(i == 0, tSI + insx, c0_s[:, 0:1] + tII + insx)
        jx0_new = jnp.where(i == 0, tSJ + insx, c0_s[:, 1:2] + tJJ + insx)

    # IY/JY: affine scans along lanes; later stripes inject the new
    # row's carry (saved by the previous stripe at this same step) and
    # fill the M shift from the same boundary block
    if first:
        m_sh = _shift_fill(m_new, LOG_ZERO)
        c1 = m_sh + tMI + insy
        c2 = m_sh + tMJ + insy
    else:
        m_sh = _shift_fill(m_new, carr[:, _SM:_SM + 1])
        c1 = _inject_carry(insy + tII, m_sh + tMI + insy,
                           carr[:, _SIY:_SIY + 1], log_add)
        c2 = _inject_carry(insy + tJJ, m_sh + tMJ + insy,
                           carr[:, _SJY:_SJY + 1], log_add)
    iy_new, jy_new = scan2(insy + tII, c1, insy + tJJ, c2, L)

    m_s[:, :] = m_new
    ix_s[:, :] = ix_new
    iy_s[:, :] = iy_new
    jx_s[:, :] = jx_new
    jy_s[:, :] = jy_new
    if first:
        c0_s[:, 0:1] = ix0_new
        c0_s[:, 1:2] = jx0_new

    bnd_out_ref[0, :, :] = _bnd_row(
        m_new[:, L - 1:L], ix_new[:, L - 1:L], iy_new[:, L - 1:L],
        jx_new[:, L - 1:L], jy_new[:, L - 1:L])
    if store_m:
        m_out_ref[0, :, :] = m_new

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
        vals = jnp.max(jnp.where(sel5, stacked, NEG_BIG), axis=1)
        pcount = insy.shape[0]
        sly_ref[:, :] = jnp.concatenate(
            [vals.reshape(5, pcount).T,
             jnp.full((pcount, 128 - 5), NEG_BIG, jnp.float32)], axis=1)


def _fwd_stripe_call(xm_t, oy_s, insx_t, insy_s, lymask_s, lxf,
                     iy0_s, jy0_s, bnd0, bnd_in, params, tile_p, kk,
                     impl, first, store_m, interpret):
    """One forward stripe.  Returns (bnd_out (Lx, B, 128),
    sly (B, 128)[, m_stripe (Lx, B, W)])."""
    lx, b, _ = xm_t.shape
    w = oy_s.shape[2]
    kp = oy_s.shape[1]
    grid = (b // tile_p, lx)
    in_specs = [
        pl.BlockSpec((tile_p, 16), lambda t, i: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_p, 128), lambda t, i: (i, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_p, kp, w), lambda t, i: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_p, 1), lambda t, i: (i, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_p, w), lambda t, i: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_p, w), lambda t, i: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_p, 128), lambda t, i: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_p, w), lambda t, i: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_p, w), lambda t, i: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_p, 128), lambda t, i: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_p, 128),
                     lambda t, i: (jnp.maximum(i - 1, 0), t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_p, 128), lambda t, i: (i, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, tile_p, 128), lambda t, i: (i, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_p, 128), lambda t, i: (t, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((lx, b, 128), jnp.float32),
        jax.ShapeDtypeStruct((b, 128), jnp.float32),
    ]
    if store_m:
        out_specs.append(pl.BlockSpec((1, tile_p, w),
                                      lambda t, i: (i, t, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((lx, b, w), jnp.float32))
    return pl.pallas_call(
        partial(_fwd_stripe_kernel, lx, kk, impl, first, store_m,),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((tile_p, w), jnp.float32)] * 5
        + [pltpu.VMEM((tile_p, 128), jnp.float32)]
        + [pltpu.VMEM((tile_p, w), jnp.float32)] * 5,
        interpret=interpret,
    )(params, xm_t, oy_s, insx_t, insy_s, lymask_s, lxf,
      iy0_s, jy0_s, bnd0, bnd_in, bnd_in)


# ---------------------------------------------------------------------------
# Striped fused backward + posterior + MEA kernel
# ---------------------------------------------------------------------------

def _bwd_stripe_kernel(n_rows, kk, impl, first, params, *refs):
    """_bwd_post_kernel restricted to one reversed-coordinate lane
    stripe (plain-flipped end-aligned inputs; `first` = reversed
    stripe 0 = the forward-rightmost stripe).  lane_off (via iy0/jy0
    and padmask inputs) keeps the per-pair padding-lane chain
    semantics of the unstriped kernel."""
    (xm_ref, oy_ref, insx_ref, insy_ref, lens_ref, fm_ref,
     iy0_ref, jy0_ref, pad_ref, bnd0_ref, bnd_a_ref, bnd_b_ref,
     post_ref, bndo_ref, mea_ref,
     m_s, ix_s, iy_s, jx_s, jy_s, c0_s, mea_s) = refs
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

    lxv = lens_ref[:, 0:1]
    u0 = jnp.float32(n_rows) - lxv
    padmask = pad_ref[:, :] > 0.5       # global lane < q0, sliced

    insy_raw = insy_ref[:, :]
    insy = jnp.where(padmask, LOG_ZERO, insy_raw)

    @pl.when(u == 0)
    def _():
        # boundary row B(lx, .): iy0/jy0 slices carry the global
        # masked cumsums (JAX-precomputed); m0r needs the one-lane
        # shift whose lane-0 fill crosses the stripe boundary
        iy0 = iy0_ref[:, :]
        jy0 = jy0_ref[:, :]
        if first:
            f_iy, f_jy = tSI, tSJ
        else:
            f_iy = bnd0_ref[:, _SIY:_SIY + 1]
            f_jy = bnd0_ref[:, _SJY:_SJY + 1]
        m0r = log_add(tMI + _shift_fill(iy0, f_iy) + insy,
                      tMJ + _shift_fill(jy0, f_jy) + insy)
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
        mea_s[:, :] = jnp.zeros(mea_s.shape, jnp.float32)

    @pl.when(u > 0)
    def _():
        m_p = m_s[:, :]
        ix_p = ix_s[:, :]
        jx_p = jx_s[:, :]

        e_row = _emission_row(xm_ref, oy_ref, kk)
        e_row = jnp.where(padmask, LOG_ZERO, e_row)
        insx = insx_ref[0, :, :]

        if first:
            f_m = c0_s[:, 2:3]
        else:
            prev = jnp.where(u == 1, bnd0_ref[:, :], bnd_a_ref[0, :, :])
            f_m = prev[:, _SM:_SM + 1]
            carr = bnd_b_ref[0, :, :]
        next_m = _shift_fill(m_p, f_m) + e_row
        next_ix = ix_p + insx
        next_jx = jx_p + insx

        ix_new = log_add(tII + next_ix, tIM + next_m)
        jx_new = log_add(tJJ + next_jx, tJM + next_m)
        if first:
            ix0_p = c0_s[:, 0:1]
            jx0_p = c0_s[:, 1:2]
            m0_p = c0_s[:, 2:3]
            ix0_new = tII + ix0_p + insx
            jx0_new = tJJ + jx0_p + insx
            m0_new = log_add(tMI + ix0_p + insx, tMJ + jx0_p + insx)

        c1 = insy + tII
        d1 = tIM + next_m
        c2 = insy + tJJ
        d2 = tJM + next_m
        if not first:
            d1 = _inject_carry(c1, d1, carr[:, _SIY:_SIY + 1], log_add)
            d2 = _inject_carry(c2, d2, carr[:, _SJY:_SJY + 1], log_add)
        iy_new, jy_new = scan2(c1, d1, c2, d2, L)

        if first:
            next_iy = _shift_fill(iy_new, LOG_ZERO) + insy
            next_jy = _shift_fill(jy_new, LOG_ZERO) + insy
        else:
            next_iy = _shift_fill(iy_new, carr[:, _SIY:_SIY + 1]) + insy
            next_jy = _shift_fill(jy_new, carr[:, _SJY:_SJY + 1]) + insy
        m_new = log_add5(tMM + next_m,
                         tMI + next_ix,
                         tMJ + next_jx,
                         tMI + next_iy,
                         tMJ + next_jy)

        pin = jnp.float32(u) <= u0
        m_s[:, :] = jnp.where(pin, m_p, m_new)
        ix_s[:, :] = jnp.where(pin, ix_p, ix_new)
        iy_s[:, :] = jnp.where(pin, iy_s[:, :], iy_new)
        jx_s[:, :] = jnp.where(pin, jx_p, jx_new)
        jy_s[:, :] = jnp.where(pin, jy_s[:, :], jy_new)
        if first:
            c0_s[:, 0:1] = jnp.where(pin, c0_s[:, 0:1], ix0_new)
            c0_s[:, 1:2] = jnp.where(pin, c0_s[:, 1:2], jx0_new)
            c0_s[:, 2:3] = jnp.where(pin, c0_s[:, 2:3], m0_new)

    # combine + posterior (forward coordinates via the in-stripe lane
    # flip; W | By makes backward stripe s' exactly forward stripe
    # S-1-s')
    if first:
        b_fill = c0_s[:, 2:3]
    else:
        # m state at the previous stripe's last lane, SAME step u
        b_fill = jnp.where(u == 0, bnd0_ref[:, _SM:_SM + 1],
                           bnd_b_ref[0, :, _SM:_SM + 1])
    b_nat = _shift_fill(m_s[:, :], b_fill)
    fm_nat = _flip_lanes(fm_ref[0, :, :])
    score = fm_nat + b_nat - tot
    pf = jnp.float32(n_rows) - 1.0 - jnp.float32(u)
    row_ok = pf < lxv
    valid = row_ok & jnp.logical_not(padmask)
    post_nat = jnp.where((score >= MIN_SPARSE_SCORE) & valid,
                         jnp.exp(jnp.minimum(score, 0.0)), 0.0)
    post_ref[0, :, :] = _flip_lanes(post_nat)

    # MEA running row with cross-stripe carries
    old_row = mea_s[:, :]
    if first:
        f_old = jnp.float32(0.0)
        carry_new = jnp.float32(0.0)
    else:
        f_old = jnp.where(u == 0, bnd0_ref[:, _SMEA:_SMEA + 1],
                          bnd_a_ref[0, :, _SMEA:_SMEA + 1])
        f_old = jnp.where(u == 0, 0.0, f_old)
        carry_new = bnd_b_ref[0, :, _SMEA:_SMEA + 1]
    e = jnp.maximum(_shift_fill(old_row, f_old) + post_nat, old_row)
    new_row = _max_scan_lanes(jnp.maximum(e, 0.0), L)
    if not first:
        new_row = jnp.maximum(new_row, carry_new)
    mea_s[:, :] = new_row

    bndo_ref[0, :, :] = _bnd_row(
        m_s[:, L - 1:L], ix_s[:, L - 1:L], iy_s[:, L - 1:L],
        jx_s[:, L - 1:L], jy_s[:, L - 1:L], new_row[:, L - 1:L])

    @pl.when(u == n_rows - 1)
    def _():
        pcount = new_row.shape[0]
        mea_ref[:, :] = jnp.concatenate(
            [new_row[:, L - 1:L],
             jnp.zeros((pcount, 127), jnp.float32)], axis=1)


def _bwd_stripe_call(xm_flip_t, oy_flip_s, insx_flip_t, insy_flip_s,
                     lens2, fm_stripe, iy0_s, jy0_s, pad_s, bnd0,
                     bnd_in, params_tot, tile_p, kk, impl, first,
                     interpret):
    """One backward stripe.  Returns (post_stripe (Lx, B, W) in
    forward coordinates, bnd_out (Lx, B, 128), mea (B, 128))."""
    lx, b, _ = xm_flip_t.shape
    w = oy_flip_s.shape[2]
    kp = oy_flip_s.shape[1]
    grid = (b // tile_p, lx)
    return pl.pallas_call(
        partial(_bwd_stripe_kernel, lx, kk, impl, first),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_p, 16), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, 128),
                         lambda t, i: (jnp.maximum(i - 1, 0), t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, kp, w), lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, 1),
                         lambda t, i: (jnp.maximum(i - 1, 0), t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, w), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, 128), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, w),
                         lambda t, i: (lx - 1 - i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, w), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, w), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, w), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, 128), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, 128),
                         lambda t, i: (jnp.maximum(i - 1, 0), t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, 128), lambda t, i: (i, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_p, w),
                         lambda t, i: (lx - 1 - i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, 128), lambda t, i: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, 128), lambda t, i: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lx, b, w), jnp.float32),
            jax.ShapeDtypeStruct((lx, b, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_p, w), jnp.float32)] * 5
        + [pltpu.VMEM((tile_p, 128), jnp.float32)]
        + [pltpu.VMEM((tile_p, w), jnp.float32)],
        interpret=interpret,
    )(params_tot, xm_flip_t, oy_flip_s, insx_flip_t, insy_flip_s,
      lens2, fm_stripe, iy0_s, jy0_s, pad_s, bnd0, bnd_in, bnd_in)


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=("k", "stripe_w", "tile_p", "scan_impl",
                          "interpret"))
def striped_posteriors_sparse(xb, yb, lxb, lyb, match, insert, start,
                              tv, k: int = 32, stripe_w: int = 2048,
                              tile_p: int = 8,
                              scan_impl: str | None = None,
                              interpret: bool = False):
    """Sparse posteriors + EA for long pairs via Y-striped kernels.

    xb/yb: (B, Bx)/(B, By) wildcard-padded codes, By a multiple of
    stripe_w, B a multiple of tile_p.  Returns (vals (B, Bx, K),
    cols (B, Bx, K), ea (B,), max_nnz) — the same contract as
    sparsify(batch_posteriors(...)[0]).
    """
    b, bx = xb.shape
    by = yb.shape[1]
    kk = match.shape[0]
    kp = _round_up(kk, 8)
    assert by % stripe_w == 0, (by, stripe_w)
    s_count = by // stripe_w
    impl = scan_impl or pp.SCAN_IMPL

    def xmt(codes):
        oxT = jax.nn.one_hot(codes.T, kk, dtype=jnp.float32)
        xm = jax.lax.dot_general(oxT, match, (((2,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST)
        return jnp.pad(xm, ((0, 0), (0, 0), (0, 128 - kk)))

    def oyt(codes):
        oy = jax.nn.one_hot(codes, kk, dtype=jnp.float32, axis=1)
        return jnp.pad(oy, ((0, 0), (0, kp - kk), (0, 0)))

    params = _params_rows(start, tv, b)
    bstart_b = jnp.broadcast_to(
        jnp.stack([start[0], start[1], start[1], start[3], start[3]]),
        (b, 5))

    ins_y = insert[yb]                         # (B, By)
    tSI = params[:, P_TSI:P_TSI + 1]
    tSJ = params[:, P_TSJ:P_TSJ + 1]
    tII = params[:, P_TII:P_TII + 1]
    tJJ = params[:, P_TJJ:P_TJJ + 1]

    # forward DP row 0 (global closed form, sliced per stripe)
    iy0_full = tSI - tII + jnp.cumsum(ins_y + tII, axis=1)
    jy0_full = tSJ - tJJ + jnp.cumsum(ins_y + tJJ, axis=1)

    xm_t = xmt(xb)
    oy = oyt(yb)
    insx_t = insert[xb].T[:, :, None]
    jj = jnp.arange(by)
    lymask = (jj[None, :] == (lyb[:, None] - 1)).astype(jnp.float32)
    lxf = jnp.broadcast_to(lxb.astype(jnp.float32)[:, None], (b, 128))

    zeros128 = jnp.zeros((b, 128), jnp.float32)
    dummy_bnd = jnp.zeros((bx, b, 128), jnp.float32)

    def sl(a, s):
        return a[:, s * stripe_w:(s + 1) * stripe_w]

    def fwd_bnd0(s):
        if s == 0:
            return zeros128
        j = s * stripe_w - 1
        return _bnd_row(
            jnp.full((b, 1), LOG_ZERO, jnp.float32),
            jnp.full((b, 1), LOG_ZERO, jnp.float32),
            iy0_full[:, j:j + 1],
            jnp.full((b, 1), LOG_ZERO, jnp.float32),
            jy0_full[:, j:j + 1])

    def fwd_stripe(s, bnd_in, store_m):
        return _fwd_stripe_call(
            xm_t, oy[:, :, s * stripe_w:(s + 1) * stripe_w], insx_t,
            sl(ins_y, s), sl(lymask, s), lxf, sl(iy0_full, s),
            sl(jy0_full, s), fwd_bnd0(s),
            dummy_bnd if s == 0 else bnd_in, params, tile_p, kk, impl,
            first=(s == 0), store_m=store_m, interpret=interpret)

    # pass A: boundaries + final states
    bnds = []
    sly_acc = None
    bnd_prev = dummy_bnd
    for s in range(s_count):
        bnd_prev, sly = fwd_stripe(s, bnd_prev, store_m=False)
        bnds.append(bnd_prev)
        sly_acc = sly if sly_acc is None else jnp.maximum(sly_acc, sly)

    tot = _total_prob(sly_acc[:, :5], bstart_b)
    params_tot = params.at[:, P_TOT].set(tot)

    # backward prep (plain-flipped, end-aligned)
    xfl = xb[:, ::-1]
    yfl = yb[:, ::-1]
    xmf_t = xmt(xfl)
    oyf = oyt(yfl)
    insxf_t = insert[xfl].T[:, :, None]
    insyf_raw = insert[yfl]
    lane = jnp.arange(by)[None, :].astype(jnp.float32)
    q0 = jnp.float32(by) - lyb.astype(jnp.float32)[:, None]
    padmask_full = (lane < q0).astype(jnp.float32)
    pm = padmask_full > 0.5
    cum_i = jnp.cumsum(jnp.where(pm, 0.0, insyf_raw + tII), axis=1)
    cum_j = jnp.cumsum(jnp.where(pm, 0.0, insyf_raw + tJJ), axis=1)
    iy0b_full = jnp.where(pm, tSI, tSI + cum_i)
    jy0b_full = jnp.where(pm, tSJ, tSJ + cum_j)
    lane128 = jnp.arange(128)[None, :]
    lens2 = jnp.where(
        lane128 == 0, lxb.astype(jnp.float32)[:, None],
        jnp.where(lane128 == 1, lyb.astype(jnp.float32)[:, None], 0.0))

    def bwd_bnd0(s):
        if s == 0:
            return zeros128
        j = s * stripe_w - 1
        # the init row's own states at the previous stripe's last
        # lane: m0r is recomputed from iy0/jy0 exactly as in-kernel
        iyj = iy0b_full[:, j:j + 1]
        jyj = jy0b_full[:, j:j + 1]
        if j == 0:
            iyjm1, jyjm1 = tSI, tSJ
        else:
            iyjm1 = iy0b_full[:, j - 1:j]
            jyjm1 = jy0b_full[:, j - 1:j]
        insy_j = jnp.where(pm[:, j:j + 1], LOG_ZERO,
                           insyf_raw[:, j:j + 1])
        from .pairhmm_pallas import _log_add as la
        tMI = params[:, P_TMI:P_TMI + 1]
        tMJ = params[:, P_TMJ:P_TMJ + 1]
        tSM = params[:, P_TSM:P_TSM + 1]
        m0j = la(tMI + iyjm1 + insy_j, tMJ + jyjm1 + insy_j)
        m0j = jnp.where(pm[:, j:j + 1], tSM, m0j)
        return _bnd_row(
            m0j,
            jnp.where(pm[:, j:j + 1], tSI,
                      jnp.full((b, 1), LOG_ZERO, jnp.float32)),
            iyj,
            jnp.where(pm[:, j:j + 1], tSJ,
                      jnp.full((b, 1), LOG_ZERO, jnp.float32)),
            jyj,
            jnp.zeros((b, 1), jnp.float32))

    # pass B: recompute each forward stripe, consume it in the striped
    # backward; sparsify posterior stripes as they are produced
    vals_parts, cols_parts, nnz_parts = [], [], []
    bwd_bnd = dummy_bnd
    mea128 = None
    for sp in range(s_count):
        sigma = s_count - 1 - sp
        fwd_in = dummy_bnd if sigma == 0 else bnds[sigma - 1]
        _, _, fm_stripe = fwd_stripe(sigma, fwd_in, store_m=True)
        post_stripe, bwd_bnd, mea128 = _bwd_stripe_call(
            xmf_t, oyf[:, :, sp * stripe_w:(sp + 1) * stripe_w],
            insxf_t, sl(insyf_raw, sp), lens2, fm_stripe,
            sl(iy0b_full, sp), sl(jy0b_full, sp),
            sl(padmask_full, sp), bwd_bnd0(sp),
            dummy_bnd if sp == 0 else bwd_bnd,
            params_tot, tile_p, kk, impl, first=(sp == 0),
            interpret=interpret)
        v, c = jax.lax.top_k(post_stripe, k)      # (Lx, B, K)
        vals_parts.append(v)
        cols_parts.append(jnp.where(v > 0, c + sigma * stripe_w, -1))
        nnz_parts.append(
            jnp.sum((post_stripe > 0).astype(jnp.int32), axis=-1))

    # exact merge: global top-K == top-K of concatenated stripe top-Ks
    vcat = jnp.concatenate(vals_parts, axis=-1)
    ccat = jnp.concatenate(cols_parts, axis=-1)
    v, idx = jax.lax.top_k(vcat, k)
    c = jnp.take_along_axis(ccat, idx, axis=-1)
    valid = v > 0.0
    vals = jnp.where(valid, v, 0.0).transpose(1, 0, 2)
    cols = jnp.where(valid, c, -1).transpose(1, 0, 2)
    nnz = sum(nnz_parts)
    max_nnz = jnp.max(nnz)
    ea = mea128[:, 0] / jnp.minimum(lxb, lyb).astype(jnp.float32)
    return vals, cols, ea, max_nnz
