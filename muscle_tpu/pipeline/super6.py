"""Super6 — cluster by ML protein distance, align, coarse-join.

reference: src/super6.cpp — UClustPD(maxpd 1.5) -> split big clusters
into sequential <=500-seq chunks (SplitBigMFA_Random, src/super6.cpp:64)
-> cluster distance matrix from 8 sampled cross-pair ML distances
(GetProtDistMFAPair) -> UPGMA(biased) coarse tree -> MPC per cluster
(tree perm off) -> PProg joins along the coarse tree. No derep and no
final sort (the output keeps PProg's row order), matching the reference.

TPU mapping: all ML distances ride the batched global-NW device kernel
(ops/nw.py); per-cluster MPC runs are the embarrassingly parallel
multi-host axis; PProg batches its sampled pair posteriors on device.
"""

from __future__ import annotations

from ..hmm.params import HMMParams
from ..sequence import MultiSequence
from ..tree.joinorder import guide_tree_join_order
from ..tree.upgma import LINKAGE_BIASED, upgma5
from ..utils.rng import MwcRng
from .pairwise import PairAligner
from .pprog import PProg, DEFAULT_TARGET_PAIR_COUNT
from .uclustpd import (DEFAULT_MAX_PD_PASS1, DEFAULT_SEEDS_PER_ITER,
                       TARGET_PAIR_COUNT_CLUSTER_DIST, ProtDistCalc,
                       UClustPD)

DEFAULT_MAX_COARSE_SEQS = 500   # reference: src/pprog.h:6


class Super6:
    def __init__(self, consistency_iters: int = 2, refine_iters: int = 100,
                 max_pd1: float = DEFAULT_MAX_PD_PASS1,
                 max_cluster: int = DEFAULT_MAX_COARSE_SEQS,
                 target_cluster_pairs: int = TARGET_PAIR_COUNT_CLUSTER_DIST,
                 target_pair_count: int = DEFAULT_TARGET_PAIR_COUNT,
                 seeds_per_iter: int = DEFAULT_SEEDS_PER_ITER):
        self.consistency_iters = consistency_iters
        self.refine_iters = refine_iters
        self.max_pd1 = max_pd1
        self.max_cluster = max_cluster
        self.target_cluster_pairs = target_cluster_pairs
        self.target_pair_count = target_pair_count
        self.seeds_per_iter = seeds_per_iter

    def run(self, seqs: MultiSequence, hp: HMMParams, alpha: str
            ) -> MultiSequence:
        from .mpc import MPC

        pack = hp.to_scores()
        n = len(seqs)
        calc = ProtDistCalc(seqs, alpha)

        # 1. UClustPD pass at maxpd 1.5
        uc = UClustPD(calc, seeds_per_iter=self.seeds_per_iter)
        clusters = uc.run(list(range(n)), self.max_pd1)

        # 2. split big clusters into sequential <=max_cluster chunks;
        #    chunk 0 replaces the cluster in place, the rest append
        #    (reference: Super6::PrepareClusters src/super6.cpp:96-140)
        i = 0
        while i < len(clusters):
            cl = clusters[i]
            if len(cl) > self.max_cluster:
                chunks = [cl[k:k + self.max_cluster]
                          for k in range(0, len(cl), self.max_cluster)]
                clusters[i] = chunks[0]
                clusters.extend(chunks[1:])
            i += 1

        # 3. coarse guide tree from sampled ML cluster distances
        labels = [f"Cluster{i}" for i in range(len(clusters))]
        if len(clusters) > 1:
            import numpy as np
            dist = np.zeros((len(clusters), len(clusters)), dtype=np.float64)
            rng = MwcRng(1)
            for a in range(1, len(clusters)):
                for b in range(a):
                    d = calc.mfa_pair_dist(
                        clusters[a], clusters[b],
                        self.target_cluster_pairs, rng)
                    dist[a, b] = dist[b, a] = d
            tree = upgma5(labels, dist, LINKAGE_BIASED)

        # 4. MPC per cluster (tree perm forced off, src/super6.cpp:54)
        cluster_msas: list[MultiSequence] = []
        for cl in clusters:
            sub = MultiSequence([seqs[i] for i in cl])
            if len(cl) == 1:
                cluster_msas.append(sub)
            else:
                mpc = MPC(consistency_iters=self.consistency_iters,
                          refine_iters=self.refine_iters, tree_perm=None)
                cluster_msas.append(mpc.run(sub, hp, alpha))

        if len(cluster_msas) == 1:
            return cluster_msas[0]

        # 5. PProg along the coarse tree
        aligner = PairAligner(seqs, pack, alpha)
        l2g = {s.label: i for i, s in enumerate(seqs)}
        pp = PProg(aligner, l2g, self.target_pair_count)
        idx1, idx2 = guide_tree_join_order(
            tree, {lb: i for i, lb in enumerate(labels)})
        return pp.run_guide_tree(cluster_msas, idx1, idx2)
