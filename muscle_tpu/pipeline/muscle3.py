"""Classic profile-profile aligner ("muscle3", the v3-style path).

reference: src/muscle3.cpp (kmer dist -> UPGMA -> Clustal weights ->
PProg3 progressive profile alignment -> -treeiters Kimura re-estimation
loops), src/profile3.{h,cpp} / src/profpos3.{h,cpp} (profile columns:
weighted AA freqs, L/G dimer freqs, occupancy, position-specific gap
open/close scores), src/nwsmall3.cpp (profile-profile NW, gap extension
0, terminal gaps discounted through the boundary columns' gap scores),
src/m3alnparams.cpp (BLOSUM62 + center 0.8, gap open -6 defaults).

This is a host/numpy subsystem — profile-profile NW matrices are small
(column counts), and the match-score lattice is a single
freqs_A @ (B62 + center) @ freqs_B^T matmul.
"""

from __future__ import annotations

import numpy as np

from ..alphabet import ALPHA_AMINO
from ..ops.sw import BLOSUM62
from ..sequence import MultiSequence, Sequence
from ..tree.clustalweights import clustal_weights
from ..tree.joinorder import guide_tree_join_order
from ..tree.kimura import kimura_dist_mx
from ..tree.kmerdist import kmer_dist_33, kmer_dist_66
from ..tree.upgma import upgma5

DEFAULT_GAP_OPEN = -6.0   # reference: src/blosum.cpp:69 (blosum62, set 0)
DEFAULT_CENTER = 0.8      # reference: src/blosum.cpp:69

_AA_IDX = np.full(256, 20, dtype=np.int64)
for _i, _c in enumerate("ACDEFGHIKLMNPQRSTVWY"):
    _AA_IDX[ord(_c)] = _i
    _AA_IDX[ord(_c.lower())] = _i

NEG = np.float32(-9e9)


class Profile3:
    """Per-column weighted stats of an MSA (reference: Profile3/ProfPos3)."""

    def __init__(self, msa: MultiSequence, weights: np.ndarray,
                 subst: np.ndarray, gap_open: float):
        mat = msa.to_matrix()
        n, cols = mat.shape
        w = np.asarray(weights, dtype=np.float64)
        gaps = (mat == ord("-")) | (mat == ord("."))
        letters = _AA_IDX[mat]

        # weighted AA freqs (wildcards excluded), occupancy
        self.freqs = np.zeros((cols, 20), dtype=np.float64)
        valid = (~gaps) & (letters < 20)
        for a in range(20):
            self.freqs[:, a] = ((valid & (letters == a)) * w[:, None]).sum(0)
        self.occ = ((~gaps) * w[:, None]).sum(0)

        # dimer freqs: previous col + this col (reference: SetFreqs;
        # col 0 treats "previous" as a letter)
        letter_here = ~gaps
        letter_prev = np.ones_like(letter_here)
        letter_prev[:, 1:] = letter_here[:, :-1]
        self.lg = ((~letter_here & letter_prev) * w[:, None]).sum(0)
        self.gl = ((letter_here & ~letter_prev) * w[:, None]).sum(0)

        # position-specific gap open/close (reference: src/profile3.cpp:24-50)
        self.gap_open = np.empty(cols, dtype=np.float64)
        self.gap_open[0] = self.occ[0] * gap_open / 2
        self.gap_open[1:] = gap_open * (1.0 - self.lg[1:]) / 2
        self.gap_close = np.empty(cols, dtype=np.float64)
        self.gap_close[-1] = gap_open * self.occ[-1] / 2
        self.gap_close[:-1] = gap_open * (1.0 - self.gl[1:]) / 2

        self.col_count = cols
        self.subst = subst


def _nw_profile(pa: Profile3, pb: Profile3) -> tuple[float, str]:
    """Profile-profile NW with position-specific affine gaps, ext = 0
    (reference: NWSmall3 src/nwsmall3.cpp:200-400)."""
    a, b = pa.col_count, pb.col_count
    emit = pa.freqs @ pa.subst @ pb.freqs.T     # (a, b)
    oa, ca = pa.gap_open, pa.gap_close
    ob, cb = pb.gap_open, pb.gap_close

    M = np.full((a + 1, b + 1), NEG, dtype=np.float64)
    D = np.full((a + 1, b + 1), NEG, dtype=np.float64)
    I = np.full((a + 1, b + 1), NEG, dtype=np.float64)
    M[0, 0] = 0.0
    # traceback bits: 0..1 M-source (0=M,1=D,2=I), bit 4: D from D,
    # bit 5: I from I
    tb = np.zeros((a + 1, b + 1), dtype=np.uint8)

    # boundary: I along row 0, D along column 0
    I[0, 1] = ob[0]
    for j in range(2, b + 1):
        I[0, j] = I[0, j - 1]
        tb[0, j] |= 32
    D[1, 0] = oa[0]
    for i in range(2, a + 1):
        D[i, 0] = D[i - 1, 0]
        tb[i, 0] |= 16

    ca_pad = np.concatenate(([0.0], ca))        # closeA for last consumed col
    cb_pad = np.concatenate(([0.0], cb))

    for i in range(1, a + 1):
        # M row from previous row (vectorized over j)
        mm = M[i - 1, :-1]
        dm = D[i - 1, :-1] + (ca[i - 2] if i >= 2 else NEG)
        im = I[i - 1, :-1] + cb_pad[:-1]
        best = np.maximum(np.maximum(mm, dm), im)
        src = np.where((mm >= dm) & (mm >= im), 0,
                       np.where(dm >= im, 1, 2)).astype(np.uint8)
        M[i, 1:] = emit[i - 1] + best
        tb[i, 1:] = (tb[i, 1:] & ~np.uint8(3)) | src

        # D: vertical gap, from previous row (vectorized)
        dd = D[i - 1, :]
        md = M[i - 1, :] + oa[i - 1]
        D[i, :] = np.maximum(dd, md)
        tb[i, :] |= np.where(dd > md, 16, 0).astype(np.uint8)

        # I: horizontal gap, within-row running max (ext = 0)
        cand = M[i, :-1] + ob
        run = np.maximum.accumulate(cand)
        I[i, 1:] = run
        # I from I when the running max did not refresh at this j
        from_i = np.empty(b, dtype=bool)
        from_i[0] = False
        from_i[1:] = run[1:] > cand[1:]
        tb[i, 1:] |= np.where(from_i, 32, 0).astype(np.uint8)

    ends = (float(M[a, b]),
            float(D[a, b] + ca[a - 1]),
            float(I[a, b] + cb[b - 1]))
    state = int(np.argmax(ends))
    score = ends[state]

    # traceback
    path = []
    i, j = a, b
    st = "MDI"[state]
    while i > 0 or j > 0:
        if st == "M":
            path.append("B")
            src = tb[i, j] & 3
            i -= 1
            j -= 1
            st = "MDI"[src]
        elif st == "D":
            path.append("X")
            keep = tb[i, j] & 16
            i -= 1
            st = "D" if keep else "M"
        else:
            path.append("Y")
            keep = tb[i, j] & 32
            j -= 1
            st = "I" if keep else "M"
        if i == 0 and j > 0 and st != "I":
            st = "I"
        if j == 0 and i > 0 and st != "D":
            st = "D"
    path.reverse()
    return score, "".join(path)


class Muscle3:
    """reference: Muscle3::Run (src/muscle3.cpp:8-73)."""

    def __init__(self, gap_open: float = DEFAULT_GAP_OPEN,
                 center: float = DEFAULT_CENTER,
                 kmer_dist: str = "66", linkage: str = "min",
                 tree_iters: int = 1):
        self.subst = (BLOSUM62 + np.float32(center)).astype(np.float64)
        self.gap_open = gap_open
        self.kmer_dist = kmer_dist
        self.linkage = linkage
        self.tree_iters = tree_iters

    def _progressive(self, seqs: MultiSequence, tree) -> MultiSequence:
        labels = seqs.labels()
        weights = clustal_weights(tree, labels)
        l2i = {lb: i for i, lb in enumerate(labels)}
        idx1, idx2 = guide_tree_join_order(tree, l2i)

        nodes: list[MultiSequence | None] = [
            MultiSequence([s]) for s in seqs]
        node_w: list[np.ndarray | None] = [
            np.array([1.0]) for _ in seqs]
        raw_w: list[np.ndarray | None] = [
            np.array([weights[i]]) for i in range(len(seqs))]

        for k in range(len(idx1)):
            m1, m2 = nodes[idx1[k]], nodes[idx2[k]]
            rw1, rw2 = raw_w[idx1[k]], raw_w[idx2[k]]
            p1 = Profile3(m1, rw1 / rw1.sum(), self.subst, self.gap_open)
            p2 = Profile3(m2, rw2 / rw2.sum(), self.subst, self.gap_open)
            _, path = _nw_profile(p1, p2)
            joined = MultiSequence(
                [s.add_gaps_path(path, "X") for s in m1]
                + [s.add_gaps_path(path, "Y") for s in m2])
            nodes.append(joined)
            raw_w.append(np.concatenate([rw1, rw2]))
            nodes[idx1[k]] = nodes[idx2[k]] = None
        return nodes[-1]

    def run(self, seqs: MultiSequence) -> MultiSequence:
        labels = seqs.labels()
        d = (kmer_dist_66(seqs) if self.kmer_dist == "66"
             else kmer_dist_33(seqs))
        tree = upgma5(labels, d, self.linkage)
        msa = self._progressive(seqs, tree)

        for _ in range(self.tree_iters):
            # re-estimate the tree from Kimura distances of the current
            # MSA, in input order (reference: src/muscle3.cpp:43-72)
            by_label = {s.label: s for s in msa}
            ordered = MultiSequence([by_label[lb] for lb in labels])
            d = kimura_dist_mx(ordered)
            tree = upgma5(labels, d, self.linkage)
            msa = self._progressive(seqs, tree)
        return msa


def muscle3_align(seqs: MultiSequence, **kw) -> MultiSequence:
    return Muscle3(**kw).run(seqs)
