"""MPC — the core MSA pipeline (Multithreaded ProbCons, TPU-native).

Equivalent of the reference's MPCFlat::Run (reference:
src/mpcflat.cpp:285-337). Stage order matches the reference:

  derep -> all-pairs posteriors + EA distances (device, batched)
        -> UPGMA5 guide tree (+ permutation)
        -> consistency transform (device, block matmul)
        -> join order -> progressive align -> refine
        -> sort by tree -> re-insert dupes

Device work: the O(N^2 L^2) pair-HMM grid and the O((NL)^3-ish)
consistency matmuls. Host work: trees, join bookkeeping, traceback.
"""

from __future__ import annotations

import numpy as np

from ..alphabet import ALPHA_AMINO, ALPHA_NUCLEO, guess_is_nucleo
from ..hmm.params import HMMParams
from ..sequence import MultiSequence, Sequence
from ..utils.rng import GlibcRand, MwcRng
from ..tree.joinorder import guide_tree_join_order
from ..tree.tree import Tree
from ..tree.upgma import LINKAGE_BIASED, fix_ea_distmx, upgma5
from . import posteriors as post_mod
from .derep import Derep
from .progressive import PairPosteriors, progressive_align, refine

DEFAULT_CONSISTENCY_ITERS = 2   # reference: src/pairhmm.h:8
DEFAULT_REFINE_ITERS = 100      # reference: src/pairhmm.h:9


def consistency_precision_for(n: int, requested: str = "auto") -> str:
    """MXU precision of the consistency matmuls.

    'auto' keeps full-f32 (HIGHEST, 6-pass bf16 emulation) on small
    families — the regime where column-identity with the reference
    binary is pinned by the golden tier (largest golden family n=14;
    the gate sits at the dense-path boundary, n < 32) — and drops to
    single-pass bf16 on scale configs, measured 4x faster per
    iteration (88.5 -> 22.3 s at N=200/L=512 on chip) with posterior
    products perturbed ~0.4% before the O(N) z-averaging; the
    consistency transform is itself a heuristic averaging step, and
    the scale tiers claim Q-quality, not bit-parity. Override:
    MUSCLE_TPU_CONS_PRECISION=highest|default|high."""
    import os
    env = os.environ.get("MUSCLE_TPU_CONS_PRECISION")
    if env:
        return env
    if requested != "auto":
        return requested
    return "highest" if n < 32 else "default"


def device_refine(n: int) -> bool:
    """Whether refinement joins run on device (pipeline/devjoin.py).

    The device path wins when the O(n^2/4 * nnz) per-iteration
    accumulation dwarfs its fixed dispatch cost; small families keep
    the host path (also the path the BAliBASE golden tier pins).
    MUSCLE_TPU_DEVICE_REFINE=1/0 forces it either way.
    """
    import os
    v = os.environ.get("MUSCLE_TPU_DEVICE_REFINE")
    if v in ("0", "1"):
        return v == "1"
    return n >= 64


class MPC:
    def __init__(self,
                 consistency_iters: int = DEFAULT_CONSISTENCY_ITERS,
                 refine_iters: int = DEFAULT_REFINE_ITERS,
                 tree_perm: str | None = None,
                 batch_size: int = 256,
                 guide_tree_in: Tree | None = None,
                 input_order: bool = False,
                 mega=None,
                 random_chain_tree: bool = False,
                 sparse_k: int = 32,
                 consistency_precision: str = "auto"):
        self.consistency_iters = consistency_iters
        self.refine_iters = refine_iters
        self.tree_perm = tree_perm
        self.batch_size = batch_size
        self.guide_tree_in = guide_tree_in
        self.input_order = input_order
        self.mega = mega          # MegaProfileSet for Muscle-3D emissions
        self.random_chain_tree = random_chain_tree
        self.sparse_k = sparse_k
        self.consistency_precision = consistency_precision
        self.guide_tree: Tree | None = None
        self.dist_mx: np.ndarray | None = None

    # ------------------------------------------------------------------
    def _prepare(self, input_seqs: MultiSequence):
        """Derep + pair-grid setup shared by run() and the ensemble
        replicate batching (pipeline/ensemble_batch.py)."""
        derep = Derep()
        derep.run(input_seqs)
        unique = derep.unique_seqs(input_seqs)
        n = len(unique)
        labels = unique.labels()
        if n > 1 and len(set(labels)) != n:
            raise ValueError("duplicate labels in input")
        label_to_index = {lb: i for i, lb in enumerate(labels)}
        # pad to the bucket ladder (not just the next 128-multiple):
        # Super4/Super7 run MPC once per cluster/shrub, and distinct pad
        # lengths would each pay the full kernel + consistency compile —
        # the ladder collapses them to a handful of shapes
        lmax = max(len(s) for s in unique)
        if lmax > post_mod.BUCKET_LADDER[-1]:
            # beyond the ladder: exact 128-multiple padding (the long-pair
            # checkpoint path handles these; never truncate)
            pad_to = post_mod.round_up(lmax, 128)
        else:
            pad_to = max(128, post_mod._bucket_of(
                lmax, post_mod.BUCKET_LADDER[-1]))
        pairs = [(x, y) for x in range(n) for y in range(x + 1, n)]
        return derep, unique, n, labels, label_to_index, pad_to, pairs

    def _tree_from_dist(self, labels, dist_mx):
        """Guide tree from EA distances (+ optional permutation)."""
        if self.random_chain_tree:
            # ablation tree (reference: -randomchaintree,
            # src/randomchaintree.cpp)
            from ..tree.randomchain import random_chain_tree
            return random_chain_tree(labels)
        if self.guide_tree_in is not None:
            return self.guide_tree_in
        d = fix_ea_distmx(dist_mx)
        tree = upgma5(labels, d, LINKAGE_BIASED)
        if self.tree_perm and self.tree_perm != "none":
            from ..tree.permute import perm_tree
            tree = perm_tree(tree, self.tree_perm)
        return tree

    def _finish(self, input_seqs, derep, unique, tree, label_to_index,
                posts, refine_rng, joiner=None):
        """Join order -> progressive -> refine -> sort -> dupes."""
        from ..utils import logging as mlog
        idx1, idx2 = guide_tree_join_order(tree, label_to_index)
        with mlog.stage("progressive"):
            msa = progressive_align(unique, idx1, idx2, label_to_index,
                                    posts)
        with mlog.stage("refine"):
            msa = refine(msa, self.refine_iters, label_to_index, posts,
                         rng=refine_rng, joiner=joiner)
        msa = self._sort(msa, unique, tree, label_to_index)
        dupes = derep.rep_label_to_dupe_labels(input_seqs)
        if dupes:
            msa = self._insert_dupes(msa, dupes)
        return msa

    def run(self, input_seqs: MultiSequence, hp: HMMParams, alpha: str,
            refine_rng: GlibcRand | None = None) -> MultiSequence:
        derep, unique, n, labels, label_to_index, pad_to, pairs = \
            self._prepare(input_seqs)

        if n == 1:
            # all sequences identical: output a copy of the input
            return MultiSequence([Sequence(s.label, s.bytes_view())
                                  for s in input_seqs])

        pack = hp.to_scores()

        # posteriors are computed AND kept on device in the fixed-K
        # sparse layout (ops/sparse.py): the dense (P, L, L) readback
        # is both the round-1 OOM (N=64 on 16 GB) and, on a tunneled
        # TPU, a ~L/(2K)x larger host transfer than needed
        from ..utils import logging as mlog
        mlog.log("MPC: %d unique seqs, %d pairs, pad %d", n, len(pairs),
                 pad_to)
        precision = consistency_precision_for(
            n, self.consistency_precision)
        # single-chip capacity wall: the device-resident sparse store is
        # (P+1, L, K) vals f32 + cols int32 = 8 B/slot, and consistency
        # double-buffers it. At N=1000/L=512/K=32 that is ~65 GB against
        # 16 GB of HBM — no single chip can run MPC there (the reference
        # itself recommends -super5 beyond a few hundred sequences, and
        # its own -align extrapolates to ~24 h at N=1000; see
        # docs/PARITY.md "mpc-1000"). Fail with the remedy rather than
        # letting the allocator OOM half an hour in. The multi-chip
        # path shards the store over a jax mesh (2.2.x GB/chip at 8
        # chips) — override the budget when one is attached.
        if not self.mega:
            import os
            p_total = len(pairs)
            store_gb = (p_total + 1) * pad_to * self.sparse_k * 8 / 1e9
            budget_gb = float(os.environ.get(
                "MUSCLE_TPU_HBM_BUDGET_GB", 12.0))
            if store_gb > budget_gb and n * pad_to > post_mod.SMALL_DENSE_NL:
                raise MemoryError(
                    f"MPC sparse store for {n} seqs ({p_total} pairs, "
                    f"L={pad_to}, K={self.sparse_k}) needs ~{store_gb:.0f} GB "
                    f"device HBM (> {budget_gb:.0f} GB budget). Use "
                    f"-super5 (the production path at this scale), or run "
                    f"on a multi-chip mesh / raise "
                    f"MUSCLE_TPU_HBM_BUDGET_GB.")
        # small families (Super4/Super7 clusters and shrubs, BB-scale
        # inputs): ONE-DISPATCH dense pair stage + consistency —
        # per-wave dispatch/compile overhead of the blocked-sparse
        # machinery dominates at this size (see small_family_store)
        use_dense = (n >= 3 and self.consistency_iters > 0
                     and n * pad_to <= post_mod.SMALL_DENSE_NL)
        if self.mega is not None:
            # Muscle-3D: emissions from feature profiles, matched by label
            # (reference: MPCFlat_mega, src/mpcflat_mega.cpp)
            from ..ops.emissions import pad_profiles
            prof_by_label = {lb: p for lb, p in
                             zip(self.mega.labels, self.mega.profiles)}
            profs = [prof_by_label[s.label] for s in unique]
            lens = np.array([p.shape[0] for p in profs], dtype=np.int32)
            profiles = pad_profiles(profs, pad_to)
            with mlog.stage("posteriors+consistency" if use_dense
                            else "posteriors"):
                if use_dense:
                    store_v, store_c, ea, max_nnz = \
                        post_mod.small_family_store(
                            profiles, lens, pack, pairs, n,
                            self.sparse_k, self.consistency_iters,
                            precision, mega=self.mega)
                else:
                    store_v, store_c, ea, max_nnz = \
                        post_mod.all_pairs_posteriors_mega_sparse(
                            profiles, lens, self.mega, pack, pairs,
                            batch_size=self.batch_size, k=self.sparse_k)
        else:
            codes, lens = post_mod.encode_batch(unique, alpha, pad_to=pad_to)
            with mlog.stage("posteriors+consistency" if use_dense
                            else "posteriors"):
                if use_dense:
                    store_v, store_c, ea, max_nnz = \
                        post_mod.small_family_store(
                            codes, lens, pack, pairs, n, self.sparse_k,
                            self.consistency_iters, precision)
                else:
                    store_v, store_c, ea, max_nnz = \
                        post_mod.all_pairs_posteriors_sparse(
                            codes, lens, pack, pairs,
                            batch_size=self.batch_size, k=self.sparse_k)
        if max_nnz > self.sparse_k:
            from ..utils.logging import log
            log(f"sparse posterior truncation: max row nnz {max_nnz} > "
                f"K={self.sparse_k}")
        # trim the store to the occupied K-prefix (sparsify packs valid
        # slots first): at rdrp-cluster scale the full-K store is
        # ~5.5 GB and consistency double-buffers it — the 258-seq
        # cluster OOMed a 16 GB chip before this trim
        k2s = min(self.sparse_k, max(8, -(-int(max_nnz) // 8) * 8))
        if k2s < store_v.shape[2]:
            store_v = store_v[:, :, :k2s]
            store_c = store_c[:, :, :k2s]
        self.dist_mx = post_mod.ea_dist_matrix(n, pairs, ea)

        # guide tree BEFORE consistency (reference: src/mpcflat.cpp:306-310;
        # the tree uses pre-consistency EA distances in both layouts)
        tree = self._tree_from_dist(labels, self.dist_mx)
        self.guide_tree = tree

        # consistency transform (device, blocked over the sparse store;
        # the dense small-family path already applied it)
        if not use_dense and n >= 3 and self.consistency_iters > 0:
            from ..ops.consistency import consistency_sparse
            l = store_v.shape[1]
            # panels are (blk*l)^2 f32 with ~7 live per wave — blk*l <= 8192
            # bounds that at ~1.9 GB (blk=16 at L=1024 OOMed the chip
            # on rdrp cluster 63)
            seq_block = max(1, min(16, 8192 // l))
            with mlog.stage("consistency"):
                store_v = consistency_sparse(
                    store_v, store_c, n, self.consistency_iters,
                    seq_block=seq_block,
                    precision=precision,
                    max_nnz=min(int(max_nnz), self.sparse_k))
                # drain the async dispatch queue so the stage wall is
                # attributed here, not to the next sync (the fetch)
                np.asarray(store_v.ravel()[-1:])
        # single bulk device->host fetch of the sparse store in PACKED
        # CSR form: only the true nnz crosses the link (measured ~5-6
        # mean entries/row vs K=32 slots => ~5x fewer bytes; the
        # tunneled host link runs ~21 MB/s, making this the difference
        # between a ~90 s and a ~20 s fetch on a 200-seq family)
        with mlog.stage("store-fetch"):
            posts = post_mod.posts_from_store(store_v, store_c, pairs,
                                              lens, pad_to)
        joiner = None
        if device_refine(n):
            # keep the store device-resident: refine's per-iteration
            # column-posterior build + MEA run on device (devjoin.py)
            from .devjoin import DeviceJoiner
            joiner = DeviceJoiner(store_v, store_c, pairs, lens, n,
                                  min(int(max_nnz), self.sparse_k),
                                  label_to_index)
        del store_v, store_c

        return self._finish(input_seqs, derep, unique, tree,
                            label_to_index, posts, refine_rng,
                            joiner=joiner)

    # ------------------------------------------------------------------
    @staticmethod
    def _sort(msa: MultiSequence, unique: MultiSequence, tree: Tree,
              label_to_index: dict[str, int]) -> MultiSequence:
        by_label = {s.label: s for s in msa}
        ordered = []
        for node in tree.depth_first():
            if tree.is_leaf(node):
                ordered.append(by_label[tree.labels[node]])
        return MultiSequence(ordered)

    def _sort_input_order(self, msa: MultiSequence,
                          unique: MultiSequence) -> MultiSequence:
        by_label = {s.label: s for s in msa}
        return MultiSequence([by_label[s.label] for s in unique])

    @staticmethod
    def _insert_dupes(msa: MultiSequence,
                      dupes: dict[str, list[str]]) -> MultiSequence:
        out = MultiSequence()
        for s in msa:
            out.add(s)
            for dl in dupes.get(s.label, ()):
                out.add(Sequence(dl, s.bytes_view()))
        return out


def align(seqs: MultiSequence, *,
          nucleo: bool | None = None,
          perturb_seed: int = 0,
          tree_perm: str | None = None,
          consistency_iters: int = DEFAULT_CONSISTENCY_ITERS,
          refine_iters: int = DEFAULT_REFINE_ITERS,
          hmm_params: HMMParams | None = None,
          batch_size: int = 256,
          guide_tree_in: Tree | None = None,
          input_order: bool = False,
          mega=None) -> MultiSequence:
    """Align a set of unaligned sequences (reference: -align, src/align.cpp).

    Top-level convenience covering the single-replicate path; ensembles
    drive MPC directly (pipeline/ensemble.py).
    """
    if mega is not None:
        nucleo = False            # structure profiles are protein chains
    elif nucleo is None:
        nucleo = guess_is_nucleo(seqs, MwcRng(1))
    alpha = ALPHA_NUCLEO if nucleo else ALPHA_AMINO

    hp = hmm_params or HMMParams.from_defaults(nucleo=nucleo)
    if perturb_seed > 0:
        hp.perturb(perturb_seed)

    mpc = MPC(consistency_iters=consistency_iters,
              refine_iters=refine_iters,
              tree_perm=tree_perm, batch_size=batch_size,
              guide_tree_in=guide_tree_in, input_order=input_order,
              mega=mega)
    msa = mpc.run(seqs, hp, alpha)
    if input_order:
        by_label = {s.label: s for s in msa}
        msa = MultiSequence([by_label[s.label] for s in seqs
                             if s.label in by_label])
    return msa
