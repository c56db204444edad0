"""MEA DP, UPGMA, join order, Newick round-trip."""

import numpy as np

from muscle_tpu.ops.mea import mea_align, mea_score_host
from muscle_tpu.tree.joinorder import guide_tree_join_order
from muscle_tpu.tree.tree import Tree
from muscle_tpu.tree.upgma import upgma5, fix_ea_distmx

from naive_oracle import mea_score as naive_mea


def test_mea_score_matches_naive():
    rng = np.random.default_rng(2)
    for _ in range(5):
        lx, ly = rng.integers(3, 30, size=2)
        p = (rng.random((lx, ly)) ** 4).astype(np.float32)
        assert abs(mea_score_host(p) - naive_mea(p)) < 1e-5
        score, path = mea_align(p)
        assert abs(score - naive_mea(p)) < 1e-5
        # path consumes exactly lx X/B and ly Y/B
        assert sum(c in "BX" for c in path) == lx
        assert sum(c in "BY" for c in path) == ly


def test_mea_path_recovers_identity():
    p = np.eye(7, dtype=np.float32) * 0.9
    score, path = mea_align(p)
    assert path == "B" * 7
    assert abs(score - 6.3) < 1e-5


def test_upgma_simple_pair_order():
    # 3 leaves: a-b closest
    d = np.array([[0, .1, .8],
                  [.1, 0, .7],
                  [.8, .7, 0]], dtype=np.float32)
    t = upgma5(["a", "b", "c"], d, "avg")
    order = [t.labels[n] for n in t.depth_first() if t.is_leaf(n)]
    assert set(order) == {"a", "b", "c"}
    # first join must be (a, b): internal node 3 children 0,1
    assert {t.left[3], t.right[3]} == {0, 1}


def test_upgma_biased_linkage_and_join_order():
    rng = np.random.default_rng(3)
    n = 12
    m = rng.random((n, n)).astype(np.float32)
    d = ((m + m.T) / 2).astype(np.float32)
    np.fill_diagonal(d, 0)
    labels = [f"s{i}" for i in range(n)]
    t = upgma5(labels, d, "biased")
    assert t.leaf_count == n
    idx1, idx2 = guide_tree_join_order(t, {lb: i for i, lb in enumerate(labels)})
    assert len(idx1) == n - 1  # validation runs inside


def test_fix_ea_distmx():
    ea = np.array([[1, .8], [.8, 1]], dtype=np.float32)
    d = fix_ea_distmx(ea)
    assert d[0, 0] == 0
    assert abs(d[0, 1] - 0.2) < 1e-6


def test_newick_round_trip():
    d = np.array([[0, .1, .8, .9],
                  [.1, 0, .7, .85],
                  [.8, .7, 0, .2],
                  [.9, .85, .2, 0]], dtype=np.float32)
    t = upgma5(["a", "b", "c", "d d"], d, "avg")
    nwk = t.to_newick()
    t2 = Tree.from_newick(nwk)
    assert sorted(t2.leaf_labels()) == sorted(t.leaf_labels())
    assert t2.leaf_count == 4
    # join structure preserved
    o1 = [t.labels[n] for n in t.depth_first() if t.is_leaf(n)]
    o2 = [t2.labels[n] for n in t2.depth_first() if t2.is_leaf(n)]
    assert o1 == o2


def test_permute_tree_small_noop():
    from muscle_tpu.tree.permute import perm_tree
    d = np.array([[0, .1, .8], [.1, 0, .7], [.8, .7, 0]], dtype=np.float32)
    t = upgma5(["a", "b", "c"], d, "avg")
    t2 = perm_tree(t, "abc")   # < 10 leaves: no-op
    assert t2 is t


def test_permute_tree_large():
    from muscle_tpu.tree.permute import perm_tree
    rng = np.random.default_rng(5)
    n = 15
    m = rng.random((n, n)).astype(np.float32)
    d = ((m + m.T) / 2).astype(np.float32)
    np.fill_diagonal(d, 0)
    labels = [f"s{i}" for i in range(n)]
    t = upgma5(labels, d, "biased")
    for perm in ("abc", "acb", "bca"):
        t2 = perm_tree(t, perm)
        assert sorted(t2.leaf_labels()) == sorted(labels)
        assert t2.leaf_count == n
        # still a valid join order source
        idx1, idx2 = guide_tree_join_order(
            t2, {lb: i for i, lb in enumerate(labels)})
        assert len(idx1) == n - 1
