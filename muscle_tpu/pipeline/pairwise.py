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
    def __init__(self, seqs, pack, alpha: str, batch_size: int = 32,
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

    def sparse_posteriors(self, pairs: list[tuple[int, int]]):
        """Host-side fixed-K sparse posteriors: (vals (P, L, K'),
        cols (P, L, K'), ea (P,)). The device->host transfer is ~L/(2K)x
        smaller than the dense path; the fetch is further trimmed to
        the occupied K-prefix (sparsify packs valid slots first) with
        int16 cols — the tunneled host link runs ~21 MB/s, and PProg
        joins fetch up to ~200 MB of store per join otherwise."""
        import jax.numpy as jnp
        sv, sc, ea, max_nnz = post_mod.all_pairs_posteriors_sparse(
            self.codes, self.lens, self.pack, pairs,
            batch_size=self.batch_size, backend=self.backend)
        p = len(pairs)
        k = sv.shape[2]
        k2 = min(k, max(8, -(-int(min(max_nnz, k)) // 8) * 8))
        vals = np.asarray(sv[:p, :, :k2])
        # guard the int16 wire format against column indices >= 2^15
        # (pairs longer than 32767 go through the no-cap long path)
        ctype = jnp.int16 if self.codes.shape[1] < (1 << 15) else jnp.int32
        cols = np.asarray(sc[:p, :, :k2].astype(ctype)).astype(
            np.int32)
        return vals, cols, ea

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
        sparse layout; the MEA DP runs on the host densified matrix."""
        from ..ops.sparse import densify_np
        vals, cols, ea = self.sparse_posteriors(pairs)
        out = []
        for k, (i, j) in enumerate(pairs):
            p = densify_np(vals[k, :self.lens[i]], cols[k, :self.lens[i]],
                           int(self.lens[j]))
            _, path = mea_align(p)
            out.append((float(ea[k]), path))
        return out

    def align_pair(self, i: int, j: int) -> tuple[float, str]:
        return self.align_pairs([(i, j)])[0]
