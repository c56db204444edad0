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


def _device_joins(n_sampled: int) -> bool:
    """Whether PProg profile joins run on device (devjoin). Same knob
    as MPC refinement: MUSCLE_TPU_DEVICE_REFINE=1/0 forces it; by
    default joins with enough sampled pairs to amortize the dispatch
    go to the device."""
    import os
    v = os.environ.get("MUSCLE_TPU_DEVICE_REFINE")
    if v in ("0", "1"):
        return v == "1"
    return n_sampled >= 64


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


# -savedir: when set (by the CLI), every PProg join MSA is dumped to
# <SAVE_DIR>/join<k> (reference: src/pprog.cpp:354-363 opt(savedir)).
SAVE_DIR: str | None = None


def _save_join(msa: MultiSequence, join_index: int) -> None:
    if not SAVE_DIR:
        return
    import os
    os.makedirs(SAVE_DIR, exist_ok=True)
    msa.write_fasta(os.path.join(SAVE_DIR, f"join{join_index}"))


class PProg:
    """TPU scheduling note: MSA-MSA *scores* only need the mean EA of
    the sampled sequence pairs — a device batch whose host readback is
    a handful of floats — while the alignment *path* (column-posterior
    build + MEA traceback) is only needed for pairs that actually join.
    Scoring therefore batches whole score-rounds into single EA-only
    device passes (the reference instead computes every path up front,
    src/pprog.cpp:230-256); the path is reconstructed lazily at join
    time by replaying the pair sampling from a cloned RNG snapshot, so
    samples — and results — match the eager order exactly."""

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

    def _gpairs(self, msa1, msa2, sampled):
        return [(self.l2g[msa1[i].label], self.l2g[msa2[j].label])
                for (i, j) in sampled]

    # -- batched scoring (reference: the EA part of AlignMSAsFlat) ------
    def score_round(self, items, node_msas):
        """items: [(i1, i2)] node-index pairs, scored in order. Returns
        {(i1, i2): (avg_ea, rng_snapshot)} after ONE EA-only device
        pass over all sampled sequence pairs of the round."""
        import time as _time
        from ..utils import logging as mlog
        t0 = _time.perf_counter()
        snaps = {}
        slices = []
        all_pairs: list[tuple[int, int]] = []
        for (i1, i2) in items:
            m1, m2 = node_msas[i1], node_msas[i2]
            snap = self.rng.clone()
            sampled = get_pairs(len(m1), len(m2), self.target, self.rng)
            gp = self._gpairs(m1, m2, sampled)
            slices.append((len(all_pairs), len(gp)))
            all_pairs.extend(gp)
            snaps[(i1, i2)] = snap
        eas = self.aligner.ea(all_pairs) if all_pairs else np.zeros(0)
        out = {}
        for (i1, i2), (lo, cnt) in zip(items, slices):
            avg = float(np.mean(eas[lo:lo + cnt])) if cnt else 0.0
            out[(i1, i2)] = (avg, snaps[(i1, i2)])
        mlog.log("pprog score_round: %d items %d pairs %.2fs",
                 len(items), len(all_pairs), _time.perf_counter() - t0)
        return out

    # -- profile-profile path (reference: AlignMSAsFlat) ----------------
    def _accumulate_path(self, msa1, msa2, sampled, views) -> str:
        """Host column-posterior accumulate (CSR walk) + MEA path."""
        from ..native import build_post_accumulate_csr_native
        from .progressive import _accumulate_csr_np
        cc1, cc2 = msa1.col_count(), msa2.col_count()
        col_post = np.zeros((cc1, cc2), dtype=np.float32)
        ptc1 = {i: msa1[i].pos_to_col() for i in
                {i for i, _ in sampled}}
        ptc2 = {j: msa2[j].pos_to_col() for j in
                {j for _, j in sampled}}
        for k, (i, j) in enumerate(sampled):
            v, c, rp = views[k]
            if not build_post_accumulate_csr_native(
                    col_post, v, c, rp, ptc1[i], ptc2[j], False):
                _accumulate_csr_np(col_post, v, c, rp, ptc1[i], ptc2[j],
                                   False)
        _, path = mea_align(col_post)
        return path

    def path_msas(self, msa1: MultiSequence, msa2: MultiSequence,
                  rng: MwcRng | None = None,
                  sampled: list[tuple[int, int]] | None = None
                  ) -> tuple[float, str]:
        """Column-posterior build + MEA path for one MSA pair. `rng`
        (default: the shared stream) drives the pair sampling — pass a
        clone()d snapshot to replay a score_round sampling, or pass
        `sampled` directly (the pipelined run_guide_tree pre-samples
        the whole join sequence)."""
        import time as _time
        from ..utils import logging as mlog
        t0 = _time.perf_counter()
        if sampled is None:
            rng = rng if rng is not None else self.rng
            sampled = get_pairs(len(msa1), len(msa2), self.target, rng)
        gpairs = self._gpairs(msa1, msa2, sampled)

        store_fn = getattr(self.aligner, "sparse_store", None)
        if store_fn is not None and _device_joins(len(sampled)):
            # device path: posterior store stays on device; the column
            # posterior + MEA direction DP run there (devjoin) and only
            # packed directions + EA scores come back
            from .devjoin import align_sampled_device
            sv, sc, eas, max_nnz = store_fn(gpairs)
            avg_ea = float(np.mean(eas)) if len(eas) else 0.0
            r = align_sampled_device(sv, sc, sampled, msa1, msa2,
                                     max_nnz)
            if r is not None:
                mlog.log("pprog path_msas(dev): %d pairs %.2fs",
                         len(sampled), _time.perf_counter() - t0)
                return avg_ea, r[1]
            # over the devjoin HBM budget: fetch this store packed and
            # accumulate on host (no recompute)
            from . import posteriors as post_mod
            flat_v, flat_c, nnz = post_mod.fetch_store_csr(
                sv, sc, sv.shape[1])
            views = post_mod.csr_views(
                flat_v, flat_c, nnz, len(gpairs),
                lambda t: int(self.aligner.lens[gpairs[t][0]]))
        else:
            views, eas = self.aligner.csr_posteriors(gpairs)
            avg_ea = float(np.mean(eas)) if len(eas) else 0.0

        path = self._accumulate_path(msa1, msa2, sampled, views)
        mlog.log("pprog path_msas(host): %d pairs %.2fs",
                 len(sampled), _time.perf_counter() - t0)
        return avg_ea, path

    def align_msas(self, msa1: MultiSequence, msa2: MultiSequence
                   ) -> tuple[float, str]:
        """Eager score+path (compat surface; consumes the shared rng
        exactly once, like the reference's AlignMSAsFlat)."""
        return self.path_msas(msa1, msa2)

    # -- greedy best-pair joins (reference: PProg::Run) ------------------
    def run(self, msas: list[MultiSequence]) -> MultiSequence:
        n = len(msas)
        if n == 1:
            return msas[0]
        node_msas: list[MultiSequence | None] = list(msas)
        node_count = 2 * n - 1
        score = np.full((node_count, node_count), -np.inf, dtype=np.float32)
        snaps: dict[tuple[int, int], MwcRng] = {}
        pending = list(range(n))

        items = [(i, j) for i in range(n) for j in range(i + 1, n)]
        for (i, j), (s, snap) in self.score_round(items, node_msas).items():
            score[i, j] = score[j, i] = s
            snaps[(i, j)] = snap

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
            key = (i1, i2) if (i1, i2) in snaps else (i2, i1)
            m1, m2 = node_msas[key[0]], node_msas[key[1]]
            _, path = self.path_msas(m1, m2, snaps[key].clone())
            joined = align_msas_by_path(m1, m2, path)
            _save_join(joined, join)
            node_msas.append(joined)
            pending = [p for p in pending if p not in (i1, i2)]
            # score the new node against remaining pending nodes
            items = [(new_index, p) for p in pending]
            for (a, b), (s, snap) in self.score_round(
                    items, node_msas).items():
                score[a, b] = score[b, a] = s
                snaps[(a, b)] = snap
            pending.append(new_index)

        assert len(pending) == 1
        return node_msas[pending[0]]

    # -- guide-tree-driven joins (reference: src/pprog_tree.cpp) ---------
    def run_guide_tree(self, msas: list[MultiSequence],
                       idx1: list[int], idx2: list[int]) -> MultiSequence:
        """Joins along a precomputed join order, PIPELINED: an internal
        node's row list is (m1 rows, m2 rows), so every join's row
        counts and row->global-sequence maps are static functions of
        the tree — the pair sampling stream is consumed up front in the
        exact serial order, and join k+1's posterior pair grid is
        dispatched to the device BEFORE join k's host-side traceback +
        row merge (results are byte-identical to the serial loop; only
        the device queue is ahead). MUSCLE_TPU_PPROG_PREFETCH sets the
        lookahead depth (0 = serial; default 1 — each prefetched store
        holds a device buffer, so deeper lookahead trades HBM)."""
        import os
        from ..utils import logging as mlog
        node_msas: list[MultiSequence | None] = list(msas)
        njoin = len(idx1)

        # pre-sample every join in serial RNG order
        node_glob: list[list[int] | None] = [
            [self.l2g[s.label] for s in m] for m in msas]
        plan = []
        for k in range(njoin):
            g1, g2 = node_glob[idx1[k]], node_glob[idx2[k]]
            sampled = get_pairs(len(g1), len(g2), self.target, self.rng)
            plan.append((sampled, [(g1[i], g2[j]) for i, j in sampled]))
            node_glob.append(g1 + g2)
        del node_glob

        store_async = getattr(self.aligner, "sparse_store_async", None)
        if store_async is None:
            # aligner without a device store: fully serial host joins
            for k in range(njoin):
                m1, m2 = node_msas[idx1[k]], node_msas[idx2[k]]
                _, path = self.path_msas(m1, m2, sampled=plan[k][0])
                joined = align_msas_by_path(m1, m2, path)
                _save_join(joined, k)
                node_msas.append(joined)
                node_msas[idx1[k]] = None
                node_msas[idx2[k]] = None
            return node_msas[-1]

        # GROUPED dispatch: every join's sampled pairs are raw-sequence
        # pairs fixed by the pre-sampled plan — independent of earlier
        # join RESULTS — so consecutive joins' pair grids batch into
        # one device store per group. The round-5 profile (super5-512,
        # docs/PARITY.md) showed the join tail dominated by ~270 small
        # joins each paying its own dispatch + CSR fetch round trip
        # through the ~29 ms tunnel; a group is ONE dispatch + at most
        # ONE bulk CSR fetch (lazy — skipped when every join in the
        # group runs on-device), with the next group's store dispatched
        # before this group's host-side work (double-buffered: ~2
        # group stores live on HBM).
        try:
            group_budget = int(
                os.environ.get("MUSCLE_TPU_PPROG_GROUP", "4096"))
        except ValueError:
            mlog.log("PProg: bad MUSCLE_TPU_PPROG_GROUP, using 4096")
            group_budget = 4096
        group_budget = max(1, group_budget)
        # device-eligible joins (>= 64 sampled pairs) stay ONE PER
        # GROUP: they ran at ~2 s/join on per-join-sized stores whose
        # compile shapes are warm across runs, and folding them into a
        # 4096-row group store forced fresh multi-hundred-second XLA
        # compiles of the devjoin kernels (measured: a 3-join group hit
        # 216 s). Only the small host-path joins — the ones paying
        # per-join round trips — are batched.
        groups: list[tuple[int, int, list[int]]] = []   # (k0, k1, offs)
        k = 0
        while k < njoin:
            offs = [0]
            k0 = k
            tot = 0
            while k < njoin and (k == k0
                                 or (tot + len(plan[k][1]) <= group_budget
                                     and not _device_joins(
                                         len(plan[k][0])))):
                tot += len(plan[k][1])
                offs.append(tot)
                k += 1
                if _device_joins(len(plan[k0][0])):
                    break               # a big join is its own group
            groups.append((k0, k, offs))

        pending: dict[int, tuple | None] = {}

        def _dispatch_group(g):
            k0, k1, _ = groups[g]
            gpairs_all = [p for k in range(k0, k1) for p in plan[k][1]]
            pending[g] = store_async(gpairs_all) if gpairs_all else None

        _dispatch_group(0)
        try:
            return self._run_guide_tree_joins(
                node_msas, idx1, idx2, njoin, plan, groups, pending,
                _dispatch_group)
        finally:
            # an exception mid-tree must not strand the live group
            # stores (full (P+1, L, K) device buffers) for the process
            # lifetime
            pending.clear()

    def _run_guide_tree_joins(self, node_msas, idx1, idx2, njoin, plan,
                              groups, pending, _dispatch_group):
        import time as _time
        from ..utils import logging as mlog
        from .devjoin import align_sampled_device
        from . import posteriors as post_mod
        for g, (k0, k1, offs) in enumerate(groups):
            st = pending.pop(g)
            # double-buffer: enqueue the next group's pair grids AFTER
            # this group's device-side reads, ahead of its host-side
            # merges. Dispatching before the reads puts the next
            # store's whole pair-grid compute ahead of this group's
            # devjoin in the device queue — measured +5 s on every
            # singleton device join.
            dispatched_next = g + 1 >= len(groups)

            def _ensure_next():
                nonlocal dispatched_next
                if not dispatched_next:
                    dispatched_next = True
                    _dispatch_group(g + 1)

            group_views = None           # lazy bulk CSR fetch
            group_gpairs = None
            mx_i = None
            if st is not None:
                sv, sc, _se, mx = st
            t_grp = _time.perf_counter()
            n_dev = n_host = 0
            for k in range(k0, k1):
                m1 = node_msas[idx1[k]]
                m2 = node_msas[idx2[k]]
                sampled, gpairs = plan[k]
                lo, m = offs[k - k0], len(gpairs)
                r = None
                if st is not None and _device_joins(len(sampled)):
                    if mx_i is None:
                        mx_i = int(np.asarray(mx))
                    r = align_sampled_device(sv, sc, sampled, m1, m2,
                                             mx_i, row_offset=lo)
                    _ensure_next()
                if r is not None:
                    path = r[1]
                    n_dev += 1
                elif st is not None:
                    if group_views is None:
                        # ONE packed fetch for the whole group
                        group_gpairs = [p for kk in range(k0, k1)
                                        for p in plan[kk][1]]
                        flat_v, flat_c, nnz = post_mod.fetch_store_csr(
                            sv, sc, sv.shape[1])
                        group_views = post_mod.csr_views(
                            flat_v, flat_c, nnz, len(group_gpairs),
                            lambda t: int(self.aligner.lens[
                                group_gpairs[t][0]]))
                        _ensure_next()
                    path = self._accumulate_path(
                        m1, m2, sampled, group_views[lo:lo + m])
                    n_host += 1
                else:
                    _, path = self.path_msas(m1, m2, sampled=sampled)
                    n_host += 1
                _ensure_next()
                joined = align_msas_by_path(m1, m2, path)
                _save_join(joined, k)
                node_msas.append(joined)
                node_msas[idx1[k]] = None
                node_msas[idx2[k]] = None
            if st is not None:
                del sv, sc, _se, mx, st
            mlog.log("pprog group %d/%d: joins %d-%d (%d dev, %d host%s) "
                     "%.2fs", g + 1, len(groups), k0 + 1, k1,
                     n_dev, n_host,
                     ", bulk-fetched" if group_views is not None else "",
                     _time.perf_counter() - t_grp)
        return node_msas[-1]
