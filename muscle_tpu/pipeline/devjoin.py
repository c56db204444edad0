"""Device-side profile-pair alignment for refinement iterations.

The reference's RefineIter (src/refineflat.cpp:4-31) re-aligns two
random halves of the MSA 100 times; each iteration's BuildPost
(src/buildpostflat.cpp:18-106) walks every (row in half 1, row in
half 2) sparse pair posterior — O(n^2/4 * nnz) scattered adds that the
reference parallelizes with OpenMP and we previously ran on the host.
On a tunneled TPU the host path is doubly wrong: the whole sparse
store must cross the ~21 MB/s link first, and the accumulation is
memory-latency-bound scalar work.

TPU-native formulation: keep the (post-consistency) sparse store on
device and compute, per iteration, in ONE jitted dispatch:

  1. column posterior via a dual pair-index grid — for each row s of
     half 1, densify the K-sparse rows of every pair (s, t) with
     columns pre-mapped through t's pos->col map, reduce over t
     (VPU compare-accumulate), then contract the per-row lattice with
     the one-hot of s's pos->col map on the MXU:
         out = sum_s onehot(rmap_s)^T @ (sum_t densify(P_st, cmap_t))
     transposed-orientation pairs run the same primitive with the
     grid/role swapped and are added as out2^T. Pairs of the wrong
     orientation point at the store's all-zero dump row, so one static
     grid shape covers every random split.
  2. the MEA direction DP (CalcAlnFlat semantics, Best3 tie order
     B >= X >= Y) over the summed posterior, emitting 2-bit direction
     codes packed 16-per-int32 plus per-row end scores.

Only the packed directions (+ scores) cross the host link
(~cc1*cc2/16 int32s, ~256 KB for a 200-seq family vs ~4 MB for the
dense column posterior); the O(cc1+cc2) traceback walk stays on host.

Numerics note: f32 summation order differs from the host CSR walk
(per-slot compare-accumulate + tree reductions vs sequential adds), so
low bits of the column posterior can differ; tests assert the resulting
MSAs (not the intermediate floats) match the host path.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ..sequence import MultiSequence


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pow2_rung(x: int, lo: int = 16) -> int:
    """Power-of-two padding rung: the grid sides of a random ~n/2
    bipartition land on ONE rung for the whole family (e.g. any
    binomial(200, 1/2) split pads to 128x128), so the joiner compiles
    once instead of once per split size."""
    r = lo
    while r < x:
        r *= 2
    return r


def _cc_rung(x: int) -> int:
    """Column-count padding on the bucket ladder (<= 33% waste; the
    densify cost is linear in the padded width, so pow2 would be too
    coarse)."""
    from .posteriors import BUCKET_LADDER
    for b in BUCKET_LADDER:
        if b >= x:
            return b
    return _round_up(x, 1024)


_JITS = None


def _build_jit():
    """Module-level jit singletons (a per-instance jit would re-trace
    for every family/join even at identical shapes)."""
    global _JITS
    if _JITS is not None:
        return _JITS
    import jax
    import jax.numpy as jnp

    from jax.experimental import pallas as pl

    def _dr_kernel(k2, tc, per_pair_imap, v_ref, c_ref, i_ref, o_ref):
        """Densify-reduce block: o[s, :, c0:c0+tc] += one pair's
        compare-accumulate. Grid (n_r, cc_tiles, n_c) with t innermost,
        so the (L, tc) output block stays resident in VMEM across the
        whole t reduction.

        The column mapping uses the INVERSE map: pos_to_col is strictly
        increasing, so `pos_to_col[col] == c  <=>  col == col_to_pos[c]`
        — the compare runs against the tiny (tc,) inverse-map block
        instead of a pre-gathered (.., L, k2) mapped tensor (the XLA
        table gather measured 2.4 s/call; empty slots carry vals == 0,
        so -1 == -1 false matches contribute exact zeros)."""
        t = pl.program_id(2)
        # inverse-map row for this pair's col-owner: the bank is small
        # and fully VMEM-resident; dynamic sublane index + the block's
        # lane window select the (1, tc) slice
        row = pl.program_id(0) if per_pair_imap else t
        c0 = pl.program_id(1) * tc
        inv = i_ref[row, pl.dslice(c0, tc)].reshape(1, tc)
        acc = v_ref[0, 0, :, 0:1] * (c_ref[0, 0, :, 0:1] == inv)
        for k in range(1, k2):
            acc = acc + v_ref[0, 0, :, k:k + 1] * \
                (c_ref[0, 0, :, k:k + 1] == inv)

        @pl.when(t == 0)
        def _():
            o_ref[0] = acc

        @pl.when(t > 0)
        def _():
            o_ref[0] = o_ref[0] + acc

    def _densify_reduce(vals, cols, imap, cc_c, k2,
                        per_pair_imap=False):
        """(W, n_c, L, k2) sparse slots -> (W, L, cc_c) dense panels
        summed over n_c, columns mapped through the inverse maps.

        imap: (n_c, cc_c) col->pos per col-owner row (per_pair_imap
        False), or (W, cc_c) one inverse map per W entry (True — the
        sampled-pair list variant where n_c == 1)."""
        w, n_c, l, _ = vals.shape
        tc = min(512, cc_c)
        i_spec = pl.BlockSpec(imap.shape, lambda s, c, t: (0, 0))
        return pl.pallas_call(
            partial(_dr_kernel, k2, tc, per_pair_imap),
            grid=(w, cc_c // tc, n_c),
            in_specs=[
                pl.BlockSpec((1, 1, l, k2), lambda s, c, t: (s, t, 0, 0)),
                pl.BlockSpec((1, 1, l, k2), lambda s, c, t: (s, t, 0, 0)),
                i_spec,
            ],
            out_specs=pl.BlockSpec((1, l, tc), lambda s, c, t: (s, 0, c)),
            out_shape=jax.ShapeDtypeStruct((w, l, cc_c), jnp.float32),
            interpret=jax.default_backend() == "cpu",
        )(vals, cols, imap)

    # s-wave width: bounds the gathered (w, n_c, L, k2) slot panels in
    # HBM (~50 MB per s-row at n_c=512/L=512/k2=24)
    _WAVE = 16

    @partial(jax.jit,
             static_argnames=("k2", "cc_r", "cc_c"))
    def _half(sv, sc, pid, rmap, imap_c, k2, cc_r, cc_c):
        """sum_{(r_row, c_col) in grid} onehot(rmap)^T @ densify(...).

        sv/sc: (P+1, L, K) store (last row = all-zero dump slot);
        pid: (n_r, n_c) int32 pair indices (dump for absent pairs);
        rmap: (n_r, L) int32 pos->col of the row-owner rows;
        imap_c: (n_c, cc_c) int32 col->pos of the col-owner rows.
        Returns (cc_r, cc_c) f32.
        """
        n_r, n_c = pid.shape
        l = sv.shape[1]
        w = min(_WAVE, n_r)

        def body(i, out_acc):
            pid_w = jax.lax.dynamic_slice_in_dim(pid, i * w, w)
            vals = sv[pid_w, :, :k2]           # (w, n_c, L, k2)
            cols = sc[pid_w, :, :k2]
            f_w = _densify_reduce(vals, cols, imap_c, cc_c, k2)
            # contract this wave's rows immediately — the full
            # (n_r, L, cc) F tensor would be GBs at 1k-seq refine
            rmap_w = jax.lax.dynamic_slice_in_dim(rmap, i * w, w)
            a_w = jax.nn.one_hot(rmap_w, cc_r, dtype=jnp.float32)
            return out_acc + jax.lax.dot_general(
                a_w.reshape(w * l, cc_r), f_w.reshape(w * l, cc_c),
                (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)

        return jax.lax.fori_loop(
            0, n_r // w, body, jnp.zeros((cc_r, cc_c), jnp.float32))

    @jax.jit
    def _mea_dirs(post, cc2_idx):
        """MEA DP over (cc1p, cc2p) posterior -> (packed 2-bit dirs
        (cc1p, cc2p//16) int32, per-row end scores (cc1p,))."""
        cc1p, cc2p = post.shape
        z = jnp.zeros((1,), jnp.float32)

        def row(old, prow):
            b = old[:-1] + prow
            x = old[1:]
            e = jnp.maximum(b, x)
            new = jax.lax.cummax(jnp.concatenate([z, e]))
            y = new[:-1]
            d = jnp.where((b >= x) & (b >= y), 0,
                          jnp.where(x >= y, 1, 2)).astype(jnp.int32)
            return new, (d, new[cc2_idx])

        _, (dirs, scores) = jax.lax.scan(
            row, jnp.zeros((cc2p + 1,), jnp.float32), post)
        shifts = (1 << (2 * jnp.arange(16, dtype=jnp.int32)))
        packed = (dirs.reshape(cc1p, cc2p // 16, 16) * shifts).sum(
            axis=-1).astype(jnp.int32)
        return packed, scores

    @partial(jax.jit, static_argnames=("k2", "cc_r", "cc_c"))
    def build_and_mea(sv, sc, pid_n, rmap1, cmap2, pid_t, rmap2, cmap1,
                      cc2_idx, k2, cc_r, cc_c):
        out = _half(sv, sc, pid_n, rmap1, cmap2, k2, cc_r, cc_c)
        out2 = _half(sv, sc, pid_t, rmap2, cmap1, k2, cc_c, cc_r)
        post = out + out2.T
        return _mea_dirs(post, cc2_idx)

    @partial(jax.jit, static_argnames=("k2", "cc_r", "cc_c", "chunk"))
    def list_build_and_mea(sv, sc, pid, ro, co, rmap, imap_c, cc2_idx,
                           k2, cc_r, cc_c, chunk):
        """Sampled-pair variant (PProg): pairs come as an explicit list
        (pid[p] store row, ro[p] row-owner, co[p] col-owner), all in
        the (msa1-row, msa2-row) orientation — a dense grid would be
        ~n1*n2/|sampled| x wasted work at PProg's 2000-pair sampling.
        imap_c: (n2p, cc_c) col->pos inverse maps of the msa2 rows."""
        n_r, l = rmap.shape
        p2 = pid.shape[0]

        def body(i, f_acc):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * chunk,
                                                        chunk)
            pid_c = sl(pid)
            vals = sv[pid_c, :, :k2]
            cols = sc[pid_c, :, :k2]
            imap_p = imap_c[sl(co)]            # (chunk, cc_c) row gather
            e = _densify_reduce(vals[:, None], cols[:, None], imap_p,
                                cc_c, k2, per_pair_imap=True)
            return f_acc.at[sl(ro)].add(e)

        f = jax.lax.fori_loop(
            0, p2 // chunk, body, jnp.zeros((n_r, l, cc_c), jnp.float32))
        a = jax.nn.one_hot(rmap, cc_r, dtype=jnp.float32)
        post = jax.lax.dot_general(
            a.reshape(n_r * l, cc_r), f.reshape(n_r * l, cc_c),
            (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        return _mea_dirs(post, cc2_idx)

    _JITS = (build_and_mea, list_build_and_mea)
    return _JITS


class DeviceJoiner:
    """Per-family device joiner over a resident sparse store.

    pairs must be the canonical x-major (x < y) MPC pair list over n
    sequences; store row P (the last) must be the all-zero dump slot.
    """

    def __init__(self, store_v, store_c, pairs, lens, n: int,
                 max_nnz: int, label_to_index: dict[str, int]):
        self.sv = store_v
        self.sc = store_c
        self.lens = lens
        self.n = n
        self.l = store_v.shape[1]
        self.k2 = min(store_v.shape[2],
                      max(8, -(-int(max_nnz) // 8) * 8))
        self.l2i = label_to_index
        dump = store_v.shape[0] - 1
        self.dump = dump
        pm = np.full((n, n), dump, np.int32)
        for i, (x, y) in enumerate(pairs):
            pm[x, y] = i
        self.pair_mx = pm
        self._fn = _build_jit()[0]

    def _maps(self, msa: MultiSequence, n_pad: int, ccp: int):
        """(store indices (n_pad,), pos->col bank (n_pad, L) int32,
        col->pos inverse bank (n_pad, ccp) int32, -1 at gap columns)."""
        idx = np.zeros(n_pad, np.int32)
        bank = np.zeros((n_pad, self.l), np.int32)
        inv = np.full((n_pad, ccp), -1, np.int32)
        for i, s in enumerate(msa):
            g = self.l2i[s.label]
            idx[i] = g
            p = s.pos_to_col()
            bank[i, :len(p)] = p
            cp = s.col_to_pos()
            inv[i, :len(cp)] = cp
        return idx, bank, inv

    def align(self, msa1: MultiSequence, msa2: MultiSequence
              ) -> tuple[float, str]:
        """(score, path) for aligning msa1 against msa2 — the device
        equivalent of align_alns' build_post + mea_align."""
        import jax.numpy as jnp
        n1, n2 = len(msa1), len(msa2)
        cc1 = msa1.col_count()
        cc2 = msa2.col_count()
        n1p = _pow2_rung(n1)
        n2p = _pow2_rung(n2)
        ccp = _cc_rung(max(cc1, cc2, 16))

        idx1, bank1, inv1 = self._maps(msa1, n1p, ccp)
        idx2, bank2, inv2 = self._maps(msa2, n2p, ccp)
        # padding rows point at themselves -> pair_mx diag = dump
        g1 = idx1
        g2 = idx2
        pid_n = self.pair_mx[np.ix_(g1, g2)]      # s < t orientation
        pid_t = self.pair_mx[np.ix_(g2, g1)]      # t < s orientation
        # padded grid rows/cols must hit the dump slot even when the
        # padding index (0) collides with a real sequence
        pid_n[n1:, :] = self.dump
        pid_n[:, n2:] = self.dump
        pid_t[n2:, :] = self.dump
        pid_t[:, n1:] = self.dump

        packed, scores = self._fn(
            self.sv, self.sc,
            jnp.asarray(pid_n), jnp.asarray(bank1), jnp.asarray(inv2),
            jnp.asarray(pid_t), jnp.asarray(bank2), jnp.asarray(inv1),
            jnp.asarray(np.int32(cc2)),
            self.k2, ccp, ccp)
        packed = np.asarray(packed[:cc1, :])
        score = float(np.asarray(scores[cc1 - 1])) if cc1 else 0.0
        return score, _walk(packed, cc1, cc2)


def _walk(packed: np.ndarray, cc1: int, cc2: int) -> str:
    """Unpack 2-bit direction codes and trace the path (host;
    O(cc1+cc2); same traversal as ops/mea.py traceback)."""
    shifts = 2 * np.arange(16, dtype=np.int32)
    dirs = ((packed[:, :, None] >> shifts[None, None, :]) & 3
            ).reshape(cc1, -1)[:, :cc2]
    path = []
    i, j = cc1, cc2
    while i > 0 or j > 0:
        if i == 0:
            path.append("Y")
            j -= 1
        elif j == 0:
            path.append("X")
            i -= 1
        else:
            d = dirs[i - 1, j - 1]
            if d == 0:
                path.append("B")
                i -= 1
                j -= 1
            elif d == 1:
                path.append("X")
                i -= 1
            else:
                path.append("Y")
                j -= 1
    path.reverse()
    return "".join(path)


# devjoin list-variant memory guard: the F accumulator is
# (n_rows, L, ccp) f32 — beyond this the host CSR path wins anyway
_LIST_F_BUDGET = 2 << 30


def align_sampled_device(store_v, store_c, sampled, msa1, msa2,
                         max_nnz: int, row_offset: int = 0):
    """(score, path) for a PProg profile-profile join from a device
    store of SAMPLED row pairs: store row row_offset+k holds the
    posterior of (msa1 row sampled[k][0], msa2 row sampled[k][1]) in
    that orientation (row_offset lets a GROUPED store serve several
    joins without slicing away its trailing dump row — pprog.py).
    Only packed 2-bit directions cross the host link. Returns None
    when the padded accumulator would blow the HBM budget (caller
    falls back to the host path).

    Compile-shape discipline: rows are COMPACTED to those actually
    sampled and padded on coarse pow2 rungs (min 128) — PProg joins
    come in every size, and each fresh (rows, cols, cc) combination is
    a fresh multi-second XLA compile on the chip."""
    import jax.numpy as jnp
    _, list_fn = _build_jit()
    cc1 = msa1.col_count()
    cc2 = msa2.col_count()
    l = store_v.shape[1]
    k2 = min(store_v.shape[2], max(8, -(-int(max_nnz) // 8) * 8))
    ccp = _cc_rung(max(cc1, cc2, 16))

    # compact row/col banks to sampled rows only (a 2000-pair sample of
    # a 2000x2000-row join touches <= 2000 rows per side, not 2000^2)
    rows1 = sorted({i for i, _ in sampled})
    rows2 = sorted({j for _, j in sampled})
    r1_of = {r: i for i, r in enumerate(rows1)}
    r2_of = {r: i for i, r in enumerate(rows2)}
    n1p = _pow2_rung(len(rows1), 128)
    n2p = _pow2_rung(len(rows2), 128)
    if n1p * l * ccp * 4 > _LIST_F_BUDGET:
        return None
    chunk = 64
    p2 = _pow2_rung(len(sampled), 256)
    dump = store_v.shape[0] - 1

    pid = np.full(p2, dump, np.int32)
    ro = np.zeros(p2, np.int32)
    co = np.zeros(p2, np.int32)
    pid[:len(sampled)] = row_offset + np.arange(len(sampled))
    ro[:len(sampled)] = [r1_of[i] for i, _ in sampled]
    co[:len(sampled)] = [r2_of[j] for _, j in sampled]

    rbank = np.zeros((n1p, l), np.int32)
    for i, r in enumerate(rows1):
        p = msa1[r].pos_to_col()
        rbank[i, :len(p)] = p
    inv2 = np.full((n2p, ccp), -1, np.int32)
    for i, r in enumerate(rows2):
        cp = msa2[r].col_to_pos()
        inv2[i, :len(cp)] = cp

    packed, scores = list_fn(
        store_v, store_c, jnp.asarray(pid), jnp.asarray(ro),
        jnp.asarray(co), jnp.asarray(rbank),
        jnp.asarray(inv2), jnp.asarray(np.int32(cc2)),
        k2, ccp, ccp, chunk)
    packed = np.asarray(packed[:cc1, :])
    score = float(np.asarray(scores[cc1 - 1])) if cc1 else 0.0
    return score, _walk(packed, cc1, cc2)
