"""K-mer distances and random chain tree."""

import numpy as np

from muscle_tpu.sequence import MultiSequence, Sequence
from muscle_tpu.tree.kmerdist import kmer_dist_33, kmer_dist_66
from muscle_tpu.tree.randomchain import random_chain_tree
from muscle_tpu.tree.clustalweights import clustal_weights
from muscle_tpu.tree.upgma import upgma5


def _seqs():
    a = "MKVLITGGAGFIGSHLVDELLRRGHEVIVLDNLSTGKK"
    b = a[:-2] + "QW"           # near-identical
    c = "WWWPPHHHCCCDDDEEEYYYFFFNNNQQQRRRKKKIII"
    return MultiSequence([Sequence("a", a), Sequence("b", b),
                          Sequence("c", c)])


def test_kmer_dist_orders_similarity():
    for fn in (kmer_dist_66, kmer_dist_33):
        d = fn(_seqs())
        assert d.shape == (3, 3)
        assert np.allclose(np.diag(d), 0)
        assert d[0, 1] < d[0, 2]
        assert d[0, 1] < d[1, 2]


def test_random_chain_tree():
    labels = [f"s{i}" for i in range(7)]
    t = random_chain_tree(labels)
    assert sorted(t.leaf_labels()) == sorted(labels)
    # caterpillar: every internal node has at least one leaf child
    for node in range(t.leaf_count, t.node_count):
        assert t.is_leaf(t.left[node]) or t.is_leaf(t.right[node])
    # deterministic given the fixed seed
    t2 = random_chain_tree(labels)
    assert t2.leaf_labels() == t.leaf_labels()


def test_clustal_weights_sum_to_one():
    rng = np.random.default_rng(9)
    n = 8
    m = rng.random((n, n)).astype(np.float32)
    d = ((m + m.T) / 2).astype(np.float32)
    np.fill_diagonal(d, 0)
    labels = [f"s{i}" for i in range(n)]
    t = upgma5(labels, d, "biased")
    w = clustal_weights(t, labels)
    assert abs(w.sum() - 1) < 1e-5
    assert (w > 0).all()
