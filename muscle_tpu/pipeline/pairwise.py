"""Batched pairwise alignment service over a fixed sequence set.

Everything in the scalability pipelines (UCLUST candidate verification,
EA distance matrices, PProg pair sampling) reduces to "align these
(i, j) pairs of raw sequences" — exactly the batched device kernel.
This wraps encoding/padding once and exposes list-of-pairs APIs
(reference equivalents: AlignPairFlat src/alignpairflat.cpp:23,
CalcEADistMx src/eadistmx.cpp:7).
"""

from __future__ import annotations

import numpy as np

from ..alphabet import alphabet_size
from ..ops.mea import mea_align
from ..sequence import MultiSequence
from . import posteriors as post_mod


class PairAligner:
    def __init__(self, seqs, pack, alpha: str, batch_size: int = 256,
                 backend: str = "auto"):
        self.pack = pack
        self.alpha = alpha
        self.batch_size = batch_size
        self.backend = backend
        if isinstance(seqs, MultiSequence):
            seqs = list(seqs)
        self.seqs = seqs
        lmax = max((len(s) for s in seqs), default=1)
        self.codes, self.lens = post_mod.encode_batch(
            seqs, alpha, pad_to=post_mod.round_up(lmax, 128))

    def posteriors(self, pairs: list[tuple[int, int]], with_mea: bool = True):
        """Returns (posts padded (P, L, L), ea (P,))."""
        return post_mod.all_pairs_posteriors(
            self.codes, self.lens, self.pack, pairs,
            batch_size=self.batch_size, with_mea=with_mea,
            backend=self.backend)

    def sparse_store(self, pairs: list[tuple[int, int]]):
        """Device-resident sparse store for the given pairs:
        (vals, cols, ea_np, max_nnz). Row k of the store is pair k in
        the given orientation (x rows, y cols); the trailing rows are
        zero padding + the dump slot. Feed to devjoin for on-device
        profile joins — nothing but EA scores crosses the host link."""
        return post_mod.all_pairs_posteriors_sparse(
            self.codes, self.lens, self.pack, pairs,
            batch_size=self.batch_size, backend=self.backend)

    def sparse_store_async(self, pairs: list[tuple[int, int]]):
        """sparse_store WITHOUT the final host sync: ea and max_nnz
        come back as device arrays and the call returns as soon as the
        work is enqueued. PProg's prefetch pipeline dispatches join
        k+1's pair grid behind join k's host-side traceback/row merge
        (on a tunneled chip each sync also pays a ~29 ms round trip)."""
        return post_mod.all_pairs_posteriors_sparse(
            self.codes, self.lens, self.pack, pairs,
            batch_size=self.batch_size, backend=self.backend,
            sync=False)

    def csr_posteriors(self, pairs: list[tuple[int, int]]):
        """Packed CSR posteriors: ([(vals, cols, rowptr)] per pair,
        ea (P,)). Only the true nnz crosses the device->host link (the
        tunneled link runs ~21 MB/s and PProg joins fetch per-join —
        the packed stream is ~5x smaller than even the K-prefix
        fixed-K fetch)."""
        sv, sc, ea, _max_nnz = post_mod.all_pairs_posteriors_sparse(
            self.codes, self.lens, self.pack, pairs,
            batch_size=self.batch_size, backend=self.backend)
        flat_v, flat_c, nnz = post_mod.fetch_store_csr(
            sv, sc, self.codes.shape[1])
        views = post_mod.csr_views(
            flat_v, flat_c, nnz, len(pairs),
            lambda i: int(self.lens[pairs[i][0]]))
        return views, ea

    def ea(self, pairs: list[tuple[int, int]]) -> np.ndarray:
        """EA scores only — no posterior leaves the device."""
        _, ea = post_mod.all_pairs_posteriors(
            self.codes, self.lens, self.pack, pairs,
            batch_size=self.batch_size, with_mea=True,
            backend=self.backend, return_post=False)
        return ea

    def ea_dist_matrix(self, n: int | None = None) -> np.ndarray:
        n = n if n is not None else len(self.seqs)
        pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
        return post_mod.ea_dist_matrix(n, pairs, self.ea(pairs))

    def align_pairs(self, pairs: list[tuple[int, int]]
                    ) -> list[tuple[float, str]]:
        """(EA, path) per pair — pair-HMM posterior + MEA DP + traceback
        (reference: AlignPairFlat). Posteriors cross to host in the
        packed CSR layout; the MEA DP runs on the host densified
        matrix."""
        views, ea = self.csr_posteriors(pairs)
        out = []
        for k, (i, j) in enumerate(pairs):
            vals, cols, rowptr = views[k]
            lx = int(self.lens[i])
            ly = int(self.lens[j])
            p = np.zeros((lx, ly), np.float32)
            rows = np.repeat(np.arange(lx), np.diff(rowptr))
            p[rows, cols] = vals
            _, path = mea_align(p)
            out.append((float(ea[k]), path))
        return out

    def align_pair(self, i: int, j: int) -> tuple[float, str]:
        return self.align_pairs([(i, j)])[0]
