"""PProg — progressive alignment where leaves are MSAs.

reference: src/pprog.cpp (best-pair greedy joins), src/pprog_tree.cpp
(guide-tree-driven variant), src/alnmsasflat.cpp (profile-profile MEA
via sampled pair posteriors), src/getpairs.cpp (<= 2000-pair sampling).

The expensive part — pair-HMM posteriors for the sampled cross-MSA
sequence pairs — batches on device through PairAligner over the global
ungapped sequence set; the column-space accumulation and MEA traceback
are host numpy.
"""

from __future__ import annotations

import numpy as np

from ..ops.mea import mea_align
from ..sequence import MultiSequence
from ..utils.rng import MwcRng
from .pairwise import PairAligner

DEFAULT_TARGET_PAIR_COUNT = 2000   # reference: src/pprog.h:5


def get_pairs(count1: int, count2: int, target: int,
              rng: MwcRng) -> list[tuple[int, int]]:
    """reference: GetPairs (src/getpairs.cpp:33-69)."""
    all_pairs = count1 * count2
    if target == 0 or all_pairs < target * 3 // 2:
        return [(i, j) for i in range(count1) for j in range(count2)]
    pair_set: set[tuple[int, int]] = set()
    max_counter = target * 10
    counter = 0
    while counter < max_counter and len(pair_set) < target:
        counter += 1
        i = rng.randu32() % count1
        j = rng.randu32() % count2
        if i == j:
            continue
        pair_set.add((i, j))
    return sorted(pair_set)


def invert_path(path: str) -> str:
    tr = {"B": "B", "X": "Y", "Y": "X"}
    return "".join(tr[c] for c in path)


def align_msas_by_path(msa1: MultiSequence, msa2: MultiSequence,
                       path: str) -> MultiSequence:
    out = MultiSequence()
    for s in msa1:
        out.add(s.add_gaps_path(path, "X"))
    for s in msa2:
        out.add(s.add_gaps_path(path, "Y"))
    return out


class PProg:
    def __init__(self, aligner: PairAligner,
                 label_to_global_index: dict[str, int],
                 target_pair_count: int = DEFAULT_TARGET_PAIR_COUNT,
                 rng: MwcRng | None = None):
        """`aligner` is over the global ungapped sequence set;
        label_to_global_index maps row labels into it."""
        self.aligner = aligner
        self.l2g = label_to_global_index
        self.target = target_pair_count
        self.rng = rng or MwcRng(1)

    # -- profile-profile alignment (reference: AlignMSAsFlat) -----------
    def align_msas(self, msa1: MultiSequence, msa2: MultiSequence
                   ) -> tuple[float, str]:
        n1, n2 = len(msa1), len(msa2)
        cc1, cc2 = msa1.col_count(), msa2.col_count()
        sampled = get_pairs(n1, n2, self.target, self.rng)

        gpairs = []
        flip = []
        for (i, j) in sampled:
            gi = self.l2g[msa1[i].label]
            gj = self.l2g[msa2[j].label]
            # aligner pairs are unordered device batches; orient so the
            # stored posterior maps (row-of-msa1, row-of-msa2)
            gpairs.append((gi, gj))
        posts, eas = self.aligner.posteriors(gpairs)
        avg_ea = float(np.mean(eas)) if len(eas) else 0.0

        col_post = np.zeros((cc1, cc2), dtype=np.float32)
        for k, (i, j) in enumerate(sampled):
            gi, gj = gpairs[k]
            P = posts[k, :self.aligner.lens[gi], :self.aligner.lens[gj]]
            p1 = msa1[i].pos_to_col()
            p2 = msa2[j].pos_to_col()
            col_post[np.ix_(p1, p2)] += P
        _, path = mea_align(col_post)
        return avg_ea, path

    # -- greedy best-pair joins (reference: PProg::Run) ------------------
    def run(self, msas: list[MultiSequence]) -> MultiSequence:
        n = len(msas)
        if n == 1:
            return msas[0]
        node_msas: list[MultiSequence | None] = list(msas)
        node_count = 2 * n - 1
        score = np.full((node_count, node_count), -np.inf, dtype=np.float32)
        paths: dict[tuple[int, int], str] = {}
        pending = list(range(n))

        for i in range(n):
            for j in range(i + 1, n):
                s, p = self.align_msas(node_msas[i], node_msas[j])
                score[i, j] = score[j, i] = s
                paths[(i, j)] = p
                paths[(j, i)] = invert_path(p)

        for join in range(n - 1):
            # best pending pair, first-found on ties with strict >
            best = None
            best_s = -np.inf
            for a in range(len(pending)):
                for b in range(a + 1, len(pending)):
                    s = score[pending[a], pending[b]]
                    if s > best_s:
                        best_s = s
                        best = (pending[a], pending[b])
            i1, i2 = best
            new_index = n + join
            joined = align_msas_by_path(node_msas[i1], node_msas[i2],
                                        paths[(i1, i2)])
            node_msas.append(joined)
            pending = [p for p in pending if p not in (i1, i2)]
            # align the new node to remaining pending nodes
            for p in pending:
                s, pth = self.align_msas(joined, node_msas[p])
                score[new_index, p] = score[p, new_index] = s
                paths[(new_index, p)] = pth
                paths[(p, new_index)] = invert_path(pth)
            pending.append(new_index)

        assert len(pending) == 1
        return node_msas[pending[0]]

    # -- guide-tree-driven joins (reference: src/pprog_tree.cpp) ---------
    def run_guide_tree(self, msas: list[MultiSequence],
                       idx1: list[int], idx2: list[int]) -> MultiSequence:
        n = len(msas)
        node_msas: list[MultiSequence | None] = list(msas)
        for k in range(len(idx1)):
            m1 = node_msas[idx1[k]]
            m2 = node_msas[idx2[k]]
            _, path = self.align_msas(m1, m2)
            node_msas.append(align_msas_by_path(m1, m2, path))
            node_msas[idx1[k]] = None
            node_msas[idx2[k]] = None
        return node_msas[-1]
