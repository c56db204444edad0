"""Super7 shrub partition and pruned-tree joins."""

import numpy as np

from muscle_tpu.alphabet import ALPHA_AMINO
from muscle_tpu.hmm.params import HMMParams
from muscle_tpu.pipeline.super7 import (Super7, get_shrubs,
                                        prune_to_shrub_tree)
from muscle_tpu.sequence import MultiSequence, Sequence
from muscle_tpu.tree.upgma import upgma5


def _tree(n, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.random((n, n)).astype(np.float32)
    d = ((m + m.T) / 2).astype(np.float32)
    np.fill_diagonal(d, 0)
    return upgma5([f"s{i}" for i in range(n)], d, "avg")


def test_get_shrubs_partition():
    t = _tree(20)
    for size in (1, 3, 7, 32):
        lcas = get_shrubs(t, size)
        leaves = []
        for lca in lcas:
            sub = t.subtree_leaves(lca)
            assert len(sub) <= size
            leaves.extend(sub)
        assert sorted(leaves) == sorted(t.leaf_labels())


def test_prune_to_shrub_tree():
    t = _tree(20)
    lcas = get_shrubs(t, 5)
    st, labels = prune_to_shrub_tree(t, lcas)
    assert st.leaf_count == len(lcas)
    assert sorted(st.leaf_labels()) == sorted(labels)


def test_super7_end_to_end_small():
    base = "MKVLITGGAGFIGSHLVDELLRRGHEVIVLDNLSTGKK"
    rng = np.random.default_rng(3)
    seqs = []
    aas = list("ACDEFGHIKLMNPQRSTVWY")
    for i in range(8):
        s = list(base)
        for _ in range(3):
            s[rng.integers(0, len(s))] = aas[rng.integers(0, 20)]
        seqs.append(Sequence(f"q{i}", "".join(s)))
    ms = MultiSequence(seqs)
    hp = HMMParams.from_defaults()
    s7 = Super7(shrub_size=3, refine_iters=2)
    msa = s7.run(ms, hp, ALPHA_AMINO)
    assert msa.is_aligned()
    assert sorted(s.label for s in msa) == sorted(s.label for s in ms)
    rows = {s.label: s.text() for s in msa}
    for s in ms:
        assert rows[s.label].replace("-", "") == s.text()
