"""Greedy length-sorted centroid clustering (UCLUST) with a k-mer
candidate index.

reference: src/usorter.{h,cpp} (3-mer amino / 8-mer nucleo index,
top-candidate search with the TopCount/2-1 threshold),
src/uclust.cpp:26-122 (greedy pass, MAX_REJECTS=8, descending length
order), src/eacluster.cpp (the EA-threshold variant used by Super4).

TPU mapping: the index proposes a handful of candidate centroids per
query; the expensive accept test (full pair-HMM EA) is batched on
device through PairAligner — candidates for one query are verified in a
single batch instead of the reference's early-exit loop (identical
accept decision: first candidate in index order with EA >= minEA).
"""

from __future__ import annotations

import numpy as np

from ..alphabet import alphabet_size, encode
from ..sequence import MultiSequence
from .pairwise import PairAligner

MAX_REJECTS = 8      # reference: src/uclust.h:7


class KmerIndex:
    """reference: USorter. Words over the strict alphabet; any wildcard
    in the window kills the word."""

    def __init__(self, alpha: str):
        self.alpha = alpha
        k = alphabet_size(alpha)
        self.word_len = 3 if k == 20 else 8
        self.base = k
        self.dict_size = k ** self.word_len
        self.rows: dict[int, list[int]] = {}
        self.index_seq_indexes: list[int] = []

    def _words(self, codes: np.ndarray) -> np.ndarray:
        L = len(codes)
        w = self.word_len
        if L < w:
            return np.zeros(0, dtype=np.int64)
        windows = np.lib.stride_tricks.sliding_window_view(codes, w)
        valid = (windows < self.base).all(axis=1)
        powers = self.base ** np.arange(w - 1, -1, -1, dtype=np.int64)
        words = windows.astype(np.int64) @ powers
        return words[valid]

    def add(self, codes: np.ndarray, seq_index: int) -> None:
        if len(codes) < self.word_len:
            return
        idx = len(self.index_seq_indexes)
        for word in self._words(codes):
            self.rows.setdefault(int(word), []).append(idx)
        self.index_seq_indexes.append(seq_index)

    def search(self, codes: np.ndarray) -> list[tuple[int, int]]:
        """Top candidate (seq_index, shared_word_count) list, sorted by
        count descending, cut at TopCount/2 - 1 as in USorter::SearchSeq."""
        n = len(self.index_seq_indexes)
        if n == 0 or len(codes) < self.word_len:
            return []
        counts = np.zeros(n, dtype=np.int64)
        for word in self._words(codes):
            row = self.rows.get(int(word))
            if row:
                counts[row] += 1
        order = np.argsort(-counts, kind="stable")
        top = int(counts[order[0]])
        if top <= 1:
            # reference quirk: MinU = Top/2 - 1 in unsigned arithmetic
            # underflows for Top < 2, so nothing qualifies
            return []
        min_u = max(top // 2 - 1, 1)
        out = []
        for i in order:
            c = int(counts[i])
            if c < min_u:
                break
            out.append((self.index_seq_indexes[i], c))
        return out


class UClust:
    """Greedy clustering storing member->centroid paths
    (reference: src/uclust.cpp)."""

    def __init__(self, aligner: PairAligner, alpha: str):
        self.aligner = aligner
        self.alpha = alpha

    def run(self, seqs: MultiSequence, min_ea: float):
        n = len(seqs)
        index = KmerIndex(self.alpha)
        codes = [encode(s.bytes_view(), self.alpha) for s in seqs]
        lengths = np.array([len(s) for s in seqs])
        # descending length, ties by input order (reference:
        # GetLengthOrder yields descending; stable on ties)
        order = np.argsort(-lengths, kind="stable")

        centroid_indexes: list[int] = []
        seq_to_centroid = np.full(n, -1, dtype=np.int64)
        seq_to_path: list[str] = [""] * n

        for si in order:
            si = int(si)
            cands = [c for c, _ in index.search(codes[si])][:MAX_REJECTS]
            rep = -1
            if cands:
                eas = self.aligner.ea([(si, c) for c in cands])
                for c, ea in zip(cands, eas):
                    if ea >= min_ea:
                        rep = c
                        break
            if rep < 0:
                centroid_indexes.append(si)
                index.add(codes[si], si)
                seq_to_centroid[si] = si
            else:
                _, path = self.aligner.align_pair(si, rep)
                seq_to_centroid[si] = rep
                seq_to_path[si] = path
        self.centroid_indexes = centroid_indexes
        self.seq_to_centroid = seq_to_centroid
        self.seq_to_path = seq_to_path
        return centroid_indexes, seq_to_centroid, seq_to_path


class EACluster:
    """Best-centroid EA clustering (reference: src/eacluster.cpp).

    Unlike UClust this keeps *clusters of sequences* (no member paths)
    and picks the best-scoring centroid above the threshold; candidates
    are verified as one device batch.
    """

    def __init__(self, aligner: PairAligner, alpha: str):
        self.aligner = aligner
        self.alpha = alpha

    def run(self, seq_indexes: list[int], all_seqs: MultiSequence,
            min_ea: float) -> list[list[int]]:
        index = KmerIndex(self.alpha)
        codes = {i: encode(all_seqs[i].bytes_view(), self.alpha)
                 for i in seq_indexes}
        clusters: list[list[int]] = []
        centroid_of: dict[int, int] = {}   # seq index -> cluster index

        for si in seq_indexes:
            cands = [c for c, _ in index.search(codes[si])]
            best_ci = -1
            if cands:
                eas = self.aligner.ea([(si, c) for c in cands])
                best_ea = min_ea
                for c, ea in zip(cands, eas):
                    if ea > best_ea:
                        best_ea = float(ea)
                        best_ci = centroid_of[c]
            if best_ci < 0:
                centroid_of[si] = len(clusters)
                clusters.append([si])
                index.add(codes[si], si)
            else:
                clusters[best_ci].append(si)
        return clusters
