"""Batched global affine-gap Needleman-Wunsch (Viterbi) on device.

reference: src/viterbifastmem.cpp (ViterbiFastMem: global alignment,
BLOSUM62 nats scores, gap open -3 / ext -0.5, gap of length k costs
open + (k-1)*ext, terminal gaps penalized), src/tracebackbitmem.cpp
(M/D/I path states; D consumes A, I consumes B).

TPU formulation: one lax.scan over rows of A; M and D rows have no
within-row dependence, and the I row is a max-plus affine scan over the
freshly computed M row (I[i][j] = max_{k<j} M[i][k] + open + (j-1-k)*ext)
— the same Hillis-Steele scan as ops/sw.py. The scan emits one uint8
trace-bit row per cell row; the per-pair final DP row is captured by
index (so padded batches share one compiled shape) and the O(L) path
walk runs on host.

Tie-breaking matches the reference exactly: match-state predecessor
prefers M, then D (strict >), then I (strict >); gap-open vs gap-extend
prefers open (>=) everywhere except the last row's I chain which uses
strict > (src/viterbifastmem.cpp:147 vs :100).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .sw import BLOSUM62_21, _maxplus_scan

VITERBI_GAP_OPEN = -3.0   # reference: src/viterbifastmem.cpp:10
VITERBI_GAP_EXT = -0.5    # reference: src/viterbifastmem.cpp:11

NEG = np.float32(-1e30)

# trace bits (reference: src/tracebit.h:6-9)
TRACEBITS_DM = 0x01
TRACEBITS_IM = 0x02
TRACEBITS_MD = 0x04
TRACEBITS_MI = 0x08


def _row_bits(m, d, i_, strict_mi=False):
    """Trace bits for one DP row from its (M, D, I) values."""
    open_, ext = VITERBI_GAP_OPEN, VITERBI_GAP_EXT
    match_bits = jnp.where(i_ > jnp.maximum(m, d), TRACEBITS_IM,
                           jnp.where(d > m, TRACEBITS_DM, 0))
    md = jnp.where(m + open_ >= d + ext, TRACEBITS_MD, 0)
    if strict_mi:
        mi = jnp.where(m + open_ > i_ + ext, TRACEBITS_MI, 0)
    else:
        mi = jnp.where(m + open_ >= i_ + ext, TRACEBITS_MI, 0)
    return (match_bits | md | mi).astype(jnp.uint8)


def _nw_one(e, lx, ly):
    """Trace bits + captured final row for one pair.

    e: (BX, BY) substitution lattice for A x B.
    Returns (bits (BX, BY+1) uint8 for rows 0..BX-1,
             final (3, BY+1) = M/D/I values of row lx,
             score at (lx, ly))."""
    bx, by = e.shape
    open_ = jnp.float32(VITERBI_GAP_OPEN)
    ext = jnp.float32(VITERBI_GAP_EXT)

    # row 0
    m0 = jnp.full(by + 1, NEG).at[0].set(0.0)
    d0 = jnp.full(by + 1, NEG)
    u = _maxplus_scan(m0 + open_, ext)
    i0 = jnp.concatenate([jnp.full(1, NEG), u[:-1]])

    def step(carry, xi):
        m, d, i_, cap = carry
        e_row, row_i = xi
        # capture row lx values before advancing past it
        cap = jnp.where(row_i == lx, jnp.stack([m, d, i_]), cap)
        bits = _row_bits(m, d, i_)
        best = jnp.maximum(jnp.maximum(m, d), i_)
        m_next = jnp.concatenate(
            [jnp.full(1, NEG), best[:-1] + e_row])
        d_next = jnp.maximum(m + open_, d + ext)
        un = _maxplus_scan(m_next + open_, ext)
        i_next = jnp.concatenate([jnp.full(1, NEG), un[:-1]])
        return (m_next, d_next, i_next, cap), bits

    cap0 = jnp.zeros((3, by + 1), jnp.float32)
    (m, d, i_, cap), bits = jax.lax.scan(
        step, (m0, d0, i0, cap0), (e, jnp.arange(bx)))
    cap = jnp.where(lx == bx, jnp.stack([m, d, i_]), cap)
    fm, fd, fi = cap[0, ly], cap[1, ly], cap[2, ly]
    score = jnp.maximum(jnp.maximum(fm, fd), fi)
    return bits, cap, score


@jax.jit
def nw_viterbi_batch(xb, yb, lxb, lyb, subst):
    """Batched global NW: codes (B, BX), (B, BY) + lengths.
    Returns (bits (B, BX, BY+1), final rows (B, 3, BY+1), scores (B,))."""
    e = jax.vmap(lambda x, y: subst[x][:, y])(xb, yb)
    return jax.vmap(_nw_one)(e, lxb, lyb)


def _traceback(bits: np.ndarray, last_row_bits: np.ndarray,
               final: np.ndarray, lx: int, ly: int) -> str:
    """Host path walk (reference: src/tracebackbitmem.cpp:8-73)."""
    fm, fd, fi = final[0, ly], final[1, ly], final[2, ly]
    state = "M"
    if fd > fm:
        state = "D"
        best = fd
    else:
        best = fm
    if fi > best:
        state = "I"
    i, j = lx, ly
    out = []
    while i > 0 or j > 0:
        out.append(state)
        if state == "M":
            t = int(bits[i - 1, j - 1]) if i - 1 < lx \
                else int(last_row_bits[j - 1])
            if t & TRACEBITS_DM:
                state = "D"
            elif t & TRACEBITS_IM:
                state = "I"
            else:
                state = "M"
            i -= 1
            j -= 1
        elif state == "D":
            t = int(bits[i - 1, j]) if i - 1 < lx \
                else int(last_row_bits[j])
            state = "M" if (t & TRACEBITS_MD) else "D"
            i -= 1
        else:
            t = int(bits[i, j - 1]) if i < lx else int(last_row_bits[j - 1])
            state = "M" if (t & TRACEBITS_MI) else "I"
            j -= 1
    return "".join(reversed(out))


def _last_row_bits_np(final: np.ndarray) -> np.ndarray:
    """Row-lx trace bits with the reference's strict-> MI rule
    (src/viterbifastmem.cpp:147)."""
    m, d, i_ = final[0], final[1], final[2]
    open_, ext = VITERBI_GAP_OPEN, VITERBI_GAP_EXT
    match_bits = np.where(i_ > np.maximum(m, d), TRACEBITS_IM,
                          np.where(d > m, TRACEBITS_DM, 0))
    md = np.where(m + open_ >= d + ext, TRACEBITS_MD, 0)
    mi = np.where(m + open_ > i_ + ext, TRACEBITS_MI, 0)
    return (match_bits | md | mi).astype(np.uint8)


def nw_align_batch(codes: np.ndarray, lens: np.ndarray,
                   pairs: list[tuple[int, int]],
                   batch_size: int = 64,
                   subst: np.ndarray | None = None
                   ) -> list[tuple[float, str]]:
    """(score, M/D/I path) per (i, j) pair of encoded sequences."""
    if not pairs:
        return []
    subst = jnp.asarray(BLOSUM62_21 if subst is None else subst)
    out: list[tuple[float, str]] = []
    b = min(batch_size, len(pairs))
    for lo in range(0, len(pairs), b):
        chunk = pairs[lo:lo + b]
        full = list(chunk) + [chunk[0]] * (b - len(chunk))
        xi = np.array([p[0] for p in full])
        yi = np.array([p[1] for p in full])
        bits, final, scores = nw_viterbi_batch(
            jnp.asarray(codes[xi]), jnp.asarray(codes[yi]),
            jnp.asarray(lens[xi]), jnp.asarray(lens[yi]), subst)
        bits = np.asarray(bits)
        final = np.asarray(final)
        scores = np.asarray(scores)
        for k, (i, j) in enumerate(chunk):
            lrb = _last_row_bits_np(final[k])
            path = _traceback(bits[k], lrb, final[k],
                              int(lens[i]), int(lens[j]))
            out.append((float(scores[k]), path))
    return out


def path_match_pairs(path: str) -> list[tuple[int, int]]:
    """(posA, posB) for every M column of an M/D/I path."""
    i = j = 0
    out = []
    for c in path:
        if c == "M":
            out.append((i, j))
            i += 1
            j += 1
        elif c == "D":
            i += 1
        else:
            j += 1
    return out
