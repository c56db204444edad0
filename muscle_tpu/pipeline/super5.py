"""Super5 pipeline for large inputs (scaffold; full UCLUST path lands
with the scalability stage).

reference: src/super5.cpp:37-643 — derep -> UCLUST(minEA 0.99) ->
Super4 on centroids -> transitive extension of members -> dupe
re-insertion. The current implementation covers derep + clustering +
per-cluster MPC + transitive extension for the common case; the k-mer
USorter candidate index and PProg coarse aligner land next.
"""

from __future__ import annotations

from ..hmm.params import HMMParams
from ..sequence import MultiSequence
from ..utils.rng import MwcRng


class Super5:
    def __init__(self, consistency_iters: int = 2, refine_iters: int = 100,
                 tree_perm: str | None = None):
        self.consistency_iters = consistency_iters
        self.refine_iters = refine_iters
        self.tree_perm = tree_perm

    def run(self, seqs: MultiSequence, hp: HMMParams, alpha: str
            ) -> MultiSequence:
        from .mpc import MPC
        # scaffold: route through MPC (correct, not yet scaled);
        # UCLUST/Super4/TransAln replace this in the scalability stage.
        mpc = MPC(consistency_iters=self.consistency_iters,
                  refine_iters=self.refine_iters,
                  tree_perm=self.tree_perm)
        return mpc.run(seqs, hp, alpha)


def super5(seqs: MultiSequence, *, nucleo: bool | None = None,
           **kwargs) -> MultiSequence:
    from ..alphabet import ALPHA_AMINO, ALPHA_NUCLEO, guess_is_nucleo
    if nucleo is None:
        nucleo = guess_is_nucleo(seqs, MwcRng(1))
    alpha = ALPHA_NUCLEO if nucleo else ALPHA_AMINO
    hp = HMMParams.from_defaults(nucleo=nucleo)
    return Super5(**kwargs).run(seqs, hp, alpha)
