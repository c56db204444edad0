"""Batched Smith-Waterman local-alignment scores on device.

reference: src/sw.cpp (SWFast_Seqs_BLOSUM62), src/swdistmx.cpp
(SW-BLOSUM62 guide-tree distances, Open=-11 Ext=-1, NormScore =
score / mean length, UPGMA avg after similarity rescale).

TPU formulation: classic affine-gap SW restructured as a row scan.
With Z[i,j] = max(0, H[i-1,j-1] + s[i,j], F[i,j]) (no within-row term)
the row-gap state satisfies E[i,j] = max_{k<j}(Z[i,k] + open +
(j-k)*ext) exactly (a gap continuing from a cell whose H came from E is
never optimal when open < 0), which is a max-plus affine scan along the
row; H = max(Z, E). The batch runs under vmap; the running maximum is
the SW score.

BLOSUM62 in 0.5-bit units scaled to nats/2-ish floats exactly as the
reference's Blosum62_sij table (model data, src/blosum.cpp:8-31).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# reference: src/blosum.cpp:8-31 (row/col order ACDEFGHIKLMNPQRSTVWY);
# symmetric, upper-triangle-by-row values
_B62_ROWS = """
1.9646 -0.2043 -0.8767 -0.4319 -1.1050 0.0798 -0.8126 -0.6609 -0.3670 -0.7323 -0.4676 -0.7654 -0.4071 -0.4020 -0.7068 0.5579 -0.0227 -0.0947 -1.2634 -0.8820
-0.2043 4.2911 -1.7300 -1.8062 -1.1877 -1.2502 -1.4939 -0.6138 -1.5182 -0.6387 -0.7099 -1.3299 -1.3976 -1.4509 -1.6946 -0.4375 -0.4333 -0.4038 -1.1521 -1.2036
-0.8767 -1.7300 2.8871 0.7552 -1.7419 -0.6568 -0.5595 -1.5606 -0.3509 -1.8028 -1.5293 0.6358 -0.7401 -0.1567 -0.8029 -0.1305 -0.5254 -1.5713 -2.1072 -1.5325
-0.4319 -1.8062 0.7552 2.4514 -1.5962 -1.0551 -0.0588 -1.5972 0.3877 -1.4232 -0.9990 -0.1340 -0.5581 0.9273 -0.0577 -0.0735 -0.4316 -1.2211 -1.4177 -1.0102
-1.1050 -1.1877 -1.7419 -1.5962 3.0230 -1.5537 -0.6171 -0.0804 -1.5393 0.2074 0.0063 -1.4970 -1.7986 -1.5822 -1.3932 -1.1845 -1.0538 -0.4245 0.4588 1.4696
0.0798 -1.2502 -0.6568 -1.0551 -1.5537 2.7816 -1.0204 -1.8624 -0.7640 -1.8135 -1.3383 -0.2114 -1.0668 -0.8926 -1.1521 -0.1462 -0.7877 -1.5694 -1.2457 -1.5199
-0.8126 -1.4939 -0.5595 -0.0588 -0.6171 -1.0204 3.7555 -1.6158 -0.3605 -1.3934 -0.7756 0.2892 -1.0805 0.2240 -0.1249 -0.4408 -0.8429 -1.5587 -1.1711 0.8463
-0.6609 -0.6138 -1.5606 -1.5972 -0.0804 -1.8624 -1.6158 1.9993 -1.3351 0.7608 0.5634 -1.6085 -1.3783 -1.3848 -1.4951 -1.1741 -0.3588 1.2735 -1.2903 -0.6657
-0.3670 -1.5182 -0.3509 0.3877 -1.5393 -0.7640 -0.3605 -1.3351 2.2523 -1.2234 -0.6774 -0.0895 -0.5068 0.6363 1.0544 -0.1017 -0.3348 -1.1312 -1.4782 -0.9100
-0.7323 -0.6387 -1.8028 -1.4232 0.2074 -1.8135 -1.3934 0.7608 -1.2234 1.9247 0.9959 -1.6895 -1.4300 -1.0670 -1.0773 -1.2213 -0.5987 0.3942 -0.8159 -0.5310
-0.4676 -0.7099 -1.5293 -0.9990 0.0063 -1.3383 -0.7756 0.5634 -0.6774 0.9959 2.6963 -1.0754 -1.2382 -0.2105 -0.6836 -0.7404 -0.3331 0.3436 -0.7124 -0.4974
-0.7654 -1.3299 0.6358 -0.1340 -1.4970 -0.2114 0.2892 -1.6085 -0.0895 -1.6895 -1.0754 2.8266 -1.0002 0.0008 -0.2199 0.3005 -0.0230 -1.4382 -1.8480 -1.0409
-0.4071 -1.3976 -0.7401 -0.5581 -1.7986 -1.0668 -1.0805 -1.3783 -0.5068 -1.4300 -1.2382 -1.0002 3.6823 -0.6410 -1.0543 -0.4045 -0.5376 -1.1744 -1.8271 -1.4599
-0.4020 -1.4509 -0.1567 0.9273 -1.5822 -0.8926 0.2240 -1.3848 0.6363 -1.0670 -0.2105 0.0008 -0.6410 2.6426 0.4914 -0.0506 -0.3377 -1.0992 -0.9732 -0.7105
-0.7068 -1.6946 -0.8029 -0.0577 -1.3932 -1.1521 -0.1249 -1.4951 1.0544 -1.0773 -0.6836 -0.2199 -1.0543 0.4914 2.7367 -0.3824 -0.5612 -1.2513 -1.3397 -0.8469
0.5579 -0.4375 -0.1305 -0.0735 -1.1845 -0.1462 -0.4408 -1.1741 -0.1017 -1.2213 -0.7404 0.3005 -0.4045 -0.0506 -0.3824 1.9422 0.6906 -0.8231 -1.3759 -0.8429
-0.0227 -0.4333 -0.5254 -0.4316 -1.0538 -0.7877 -0.8429 -0.3588 -0.3348 -0.5987 -0.3331 -0.0230 -0.5376 -0.3377 -0.5612 0.6906 2.2727 -0.0278 -1.2145 -0.8030
-0.0947 -0.4038 -1.5713 -1.2211 -0.4245 -1.5694 -1.5587 1.2735 -1.1312 0.3942 0.3436 -1.4382 -1.1744 -1.0992 -1.2513 -0.8231 -0.0278 1.8845 -1.4171 -0.6038
-1.2634 -1.1521 -2.1072 -1.4177 0.4588 -1.2457 -1.1711 -1.2903 -1.4782 -0.8159 -0.7124 -1.8480 -1.8271 -0.9732 -1.3397 -1.3759 -1.2145 -1.4171 5.2520 1.0771
-0.8820 -1.2036 -1.5325 -1.0102 1.4696 -1.5199 0.8463 -0.6657 -0.9100 -0.5310 -0.4974 -1.0409 -1.4599 -0.7105 -0.8469 -0.8429 -0.8030 -0.6038 1.0771 3.2975
"""

BLOSUM62 = np.array([[float(v) for v in row.split()]
                     for row in _B62_ROWS.strip().splitlines()],
                    dtype=np.float32)
assert BLOSUM62.shape == (20, 20)
assert np.allclose(BLOSUM62, BLOSUM62.T)

# wildcard row/col score 0 (reference: MakeBlosum62SMx src/blosumsmx.cpp:30-52)
BLOSUM62_21 = np.zeros((21, 21), dtype=np.float32)
BLOSUM62_21[:20, :20] = BLOSUM62

DEFAULT_SW_OPEN = -11.0   # reference: src/swdistmx.cpp:106
DEFAULT_SW_EXT = -1.0


def _maxplus_scan(z, decay):
    """u_j = max_{k<=j} (z_k + (j-k)*decay) via Hillis-Steele
    (compose: u_j = max(u_j, u_{j-k} + k*decay))."""
    width = z.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, z.ndim - 1)
    u = z
    k = 1
    while k < width:
        s = jnp.roll(u, k, axis=-1) + k * decay
        u = jnp.maximum(u, jnp.where(lane >= k, s, -jnp.inf))
        k *= 2
    return u


def _sw_score_one(e, lx, ly, open_, ext):
    """Local alignment score for one pair from the substitution lattice
    e (Bx, By) (zero outside the valid region is NOT required — rows and
    cols beyond lx/ly are masked)."""
    bx, by = e.shape
    jj = jnp.arange(by)
    col_ok = jj < ly

    def step(carry, xi):
        h_prev, f_prev, best = carry
        e_row, row_ok = xi
        # F: column gap continues from previous row
        f = jnp.maximum(f_prev + ext, h_prev + open_ + ext)
        # Z: no within-row dependence
        diag = jnp.concatenate([jnp.zeros(1, jnp.float32), h_prev[:-1]])
        z = jnp.maximum(jnp.maximum(diag + e_row, f), 0.0)
        z = jnp.where(col_ok & row_ok, z, 0.0)
        # E via max-plus scan of Z + open, decay ext
        eg = _maxplus_scan(
            jnp.concatenate([jnp.full((1,), -jnp.inf, jnp.float32),
                             (z + open_ + ext)[:-1]]), ext)
        h = jnp.maximum(z, jnp.where(col_ok & row_ok, eg, 0.0))
        h = jnp.maximum(h, 0.0)
        best = jnp.maximum(best, jnp.max(h))
        return (h, f, best), None

    ii = jnp.arange(bx)
    h0 = jnp.zeros(by, jnp.float32)
    f0 = jnp.full(by, -jnp.inf, jnp.float32)
    (h, f, best), _ = jax.lax.scan(
        step, (h0, f0, jnp.float32(0.0)), (e, ii < lx))
    return best


@jax.jit
def sw_scores_batch(xb, yb, lxb, lyb, subst):
    """(B,) SW scores for padded code batches with substitution matrix
    `subst` ((K+1, K+1), wildcard row/col = 0)."""
    e = jax.vmap(lambda x, y: subst[x][:, y])(xb, yb)
    return jax.vmap(lambda ee, lx, ly: _sw_score_one(
        ee, lx, ly, jnp.float32(DEFAULT_SW_OPEN),
        jnp.float32(DEFAULT_SW_EXT)))(e, lxb, lyb)


def sw_dist_matrix(seqs, alpha: str, batch_size: int = 64) -> np.ndarray:
    """Normalized SW similarity matrix: score / mean length
    (reference: src/swdistmx.cpp ThreadBody)."""
    from ..alphabet import encode
    from ..pipeline.posteriors import encode_batch, round_up

    codes, lens = encode_batch(list(seqs), alpha,
                               pad_to=round_up(max(len(s) for s in seqs), 8))
    n = len(seqs)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    subst = jnp.asarray(BLOSUM62_21)
    out = np.zeros((n, n), dtype=np.float32)
    b = min(batch_size, max(len(pairs), 1))
    for lo in range(0, len(pairs), b):
        chunk = pairs[lo:lo + b]
        full = list(chunk) + [chunk[0]] * (b - len(chunk))
        xi = np.array([p[0] for p in full])
        yi = np.array([p[1] for p in full])
        scores = np.asarray(sw_scores_batch(
            jnp.asarray(codes[xi]), jnp.asarray(codes[yi]),
            jnp.asarray(lens[xi]), jnp.asarray(lens[yi]), subst))
        for k, (i, j) in enumerate(chunk):
            norm = scores[k] / ((lens[i] + lens[j]) / 2.0)
            out[i, j] = out[j, i] = norm
    return out
