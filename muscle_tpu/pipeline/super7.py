"""Super7 — shrub-partitioned alignment for large structure sets.

reference: src/super7.cpp:9-179, src/shrub.cpp:6-37 — a supplied or
computed guide tree is partitioned into "shrubs" (maximal subtrees with
<= shrub_size leaves); each shrub is aligned with MPC, then the shrub
MSAs are joined by PProg following the shrub-collapsed guide tree.

Guide tree sources (reference: cmd_super7 src/super7.cpp:139-179):
-guidetreein Newick, -distmxin (reseek distance matrix -> UPGMA avg),
or an all-pairs EA distance matrix computed on device.
"""

from __future__ import annotations

import numpy as np

from ..hmm.params import HMMParams
from ..sequence import MultiSequence, Sequence
from ..tree.joinorder import guide_tree_join_order
from ..tree.tree import Tree
from ..tree.upgma import LINKAGE_AVG, LINKAGE_BIASED, fix_ea_distmx, upgma5
from .pairwise import PairAligner
from .pprog import PProg

DEFAULT_SHRUB_SIZE = 32   # reference: src/super7.cpp cmd_super7 default


def get_shrubs(tree: Tree, max_size: int) -> list[int]:
    """Non-overlapping subtree LCAs covering all leaves, each subtree
    with <= max_size leaves (reference: src/shrub.cpp:6-37)."""
    sizes = tree.subtree_leaf_counts()
    if sizes[tree.root] <= max_size:
        return [tree.root]
    lcas = []
    covered = 0
    for node in range(tree.node_count):
        if node == tree.root:
            continue
        if sizes.get(node, 0) <= max_size and \
                sizes.get(tree.parent[node], 0) > max_size:
            lcas.append(node)
            covered += sizes[node]
    assert covered == tree.leaf_count
    return lcas


def prune_to_shrub_tree(tree: Tree, lcas: list[int],
                        prefix: str = "Shrub_") -> tuple[Tree, list[str]]:
    """Collapse each shrub LCA into a leaf named prefix+i
    (reference: Tree::PruneTree src/tree4.cpp:168)."""
    lca_set = {node: i for i, node in enumerate(lcas)}
    labels = [f"{prefix}{i}" for i in range(len(lcas))]
    if len(lcas) == 1:
        raise ValueError("single shrub needs no pruned tree")

    lefts, rights, leaf_order = [], [], []

    def rec(node: int):
        if node in lca_set:
            leaf_order.append(lca_set[node])
            return ("leaf", len(leaf_order) - 1)
        l = rec(tree.left[node])
        r = rec(tree.right[node])
        lefts.append(l)
        rights.append(r)
        return ("join", len(lefts) - 1)

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 4 * tree.node_count + 100))
    try:
        rec(tree.root)
    finally:
        sys.setrecursionlimit(old)

    n = len(leaf_order)
    leaf_labels = [labels[leaf_order[k]] for k in range(n)]
    conv = lambda ref: ref[1] if ref[0] == "leaf" else n + ref[1]
    t = Tree.from_joins(leaf_labels,
                        [conv(l) for l in lefts], [conv(r) for r in rights])
    return t, labels


class Super7:
    def __init__(self, shrub_size: int = DEFAULT_SHRUB_SIZE,
                 consistency_iters: int = 2, refine_iters: int = 100,
                 mega=None):
        self.shrub_size = shrub_size
        self.consistency_iters = consistency_iters
        self.refine_iters = refine_iters
        self.mega = mega

    def run(self, seqs: MultiSequence, hp: HMMParams, alpha: str,
            guide_tree: Tree | None = None,
            dist_mx: np.ndarray | None = None) -> MultiSequence:
        from .mpc import MPC

        labels = seqs.labels()
        if guide_tree is None:
            if dist_mx is not None:
                # reseek distance matrix (reference: src/super7.cpp:156-162)
                tree = upgma5(labels, dist_mx, LINKAGE_AVG)
            else:
                # device-batched SW-BLOSUM62 all-pairs similarities,
                # rescaled + UPGMA avg (reference: src/swdistmx.cpp:88
                # CalcGuideTree_SW_BLOSUM62)
                from ..ops.sw import sw_dist_matrix
                from ..tree.upgma import scale_dist_mx
                sim = sw_dist_matrix(seqs, alpha)
                tree = upgma5(labels, scale_dist_mx(sim), LINKAGE_AVG)
        else:
            tree = guide_tree

        def make_mpc():
            return MPC(consistency_iters=self.consistency_iters,
                       refine_iters=self.refine_iters, mega=self.mega)

        lcas = get_shrubs(tree, self.shrub_size)
        by_label = {s.label: s for s in seqs}
        if len(lcas) == 1:
            return make_mpc().run(seqs, hp, alpha)

        # shrub MPCs batch into shared device dispatches (bit-identical
        # to the serial per-shrub loop; pipeline/cluster_batch.py)
        from .cluster_batch import run_clusters_batched
        shrub_msas = run_clusters_batched(
            [MultiSequence([by_label[lb] for lb in
                            tree.subtree_leaves(lca)]) for lca in lcas],
            hp, alpha, make_mpc)

        shrub_tree, shrub_labels = prune_to_shrub_tree(tree, lcas)
        idx1, idx2 = guide_tree_join_order(
            shrub_tree, {lb: i for i, lb in enumerate(shrub_labels)})

        pack = hp.to_scores()
        if self.mega is not None:
            pp = MegaPProg(self.mega, pack, seqs)
        else:
            aligner = PairAligner(seqs, pack, alpha)
            l2g = {s.label: i for i, s in enumerate(seqs)}
            pp = PProg(aligner, l2g)
        return pp.run_guide_tree(shrub_msas, idx1, idx2)


class MegaPProg(PProg):
    """PProg whose pair posteriors come from mega profile emissions."""

    def __init__(self, mega, pack, seqs: MultiSequence, **kw):
        from . import posteriors as post_mod
        from ..ops.emissions import pad_profiles
        self.mega = mega
        self.pack = pack
        prof_by_label = {lb: p for lb, p in
                         zip(mega.labels, mega.profiles)}
        profs = [prof_by_label[s.label] for s in seqs]
        self._lens = np.array([p.shape[0] for p in profs], dtype=np.int32)
        lmax = post_mod.round_up(int(self._lens.max()), 128)
        self._profiles = pad_profiles(profs, lmax)
        self._post_mod = post_mod

        class _A:  # minimal aligner facade for PProg
            lens = self._lens

            def posteriors(inner, pairs, with_mea=True):
                return post_mod.all_pairs_posteriors_mega(
                    self._profiles, self._lens, self.mega, self.pack,
                    pairs, with_mea=with_mea)

            def ea(inner, pairs):
                _, eas = post_mod.all_pairs_posteriors_mega(
                    self._profiles, self._lens, self.mega, self.pack,
                    pairs, return_post=False)
                return eas

            def sparse_store(inner, pairs):
                return post_mod.all_pairs_posteriors_mega_sparse(
                    self._profiles, self._lens, self.mega, self.pack,
                    pairs)

            def sparse_store_async(inner, pairs):
                return post_mod.all_pairs_posteriors_mega_sparse(
                    self._profiles, self._lens, self.mega, self.pack,
                    pairs, sync=False)

            def csr_posteriors(inner, pairs):
                sv, sc, eas, _ = post_mod.all_pairs_posteriors_mega_sparse(
                    self._profiles, self._lens, self.mega, self.pack,
                    pairs)
                flat_v, flat_c, nnz = post_mod.fetch_store_csr(
                    sv, sc, self._profiles.shape[1])
                views = post_mod.csr_views(
                    flat_v, flat_c, nnz, len(pairs),
                    lambda i: int(self._lens[pairs[i][0]]))
                return views, eas

        super().__init__(_A(), {s.label: i for i, s in enumerate(seqs)}, **kw)
