"""Blocked long-sequence pair-HMM vs the monolithic scan oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from muscle_tpu.hmm.params import HMMParams
from muscle_tpu.ops import pairhmm, pairhmm_long
from muscle_tpu.ops.sparse import densify_np


@pytest.fixture(scope="module")
def pack():
    return HMMParams.from_defaults().to_scores()


@pytest.mark.parametrize("lx,ly,rb", [(300, 260, 64), (257, 300, 128),
                                      (128, 128, 128)])
def test_long_pair_matches_scan(pack, lx, ly, rb):
    rng = np.random.default_rng(5)
    base = rng.integers(0, 20, max(lx, ly))
    xc = base[:lx].copy()
    yc = base[:ly].copy()
    mut = rng.random(ly) < 0.2
    yc[mut] = rng.integers(0, 20, mut.sum())

    vals, cols, ea, total = pairhmm_long.long_pair_posterior_sparse(
        xc, yc, pack, k=32, row_block=rb)

    args = pairhmm.score_args(pack)
    post, ea_ref = pairhmm.batch_posteriors(
        jnp.asarray(xc[None].astype(np.int32)),
        jnp.asarray(yc[None].astype(np.int32)),
        jnp.asarray([lx]), jnp.asarray([ly]), *args)
    post = np.asarray(post[0])
    dense = densify_np(vals, cols, ly)
    # identical math (same scan steps, same block boundaries semantics)
    assert np.array_equal(dense, post)
    assert abs(ea - float(ea_ref[0])) < 1e-5


def test_long_pairs_sparse_pipeline_branch(pack, monkeypatch):
    """all_pairs_posteriors_sparse routes through the long path and
    produces the same store as the batched path."""
    from muscle_tpu.pipeline import posteriors as post_mod
    rng = np.random.default_rng(7)
    n, l = 3, 192
    codes = rng.integers(0, 20, size=(n, l)).astype(np.int32)
    lens = np.array([l, l - 30, l - 50], np.int32)
    for i in range(n):
        codes[i, lens[i]:] = 20
    pairs = [(x, y) for x in range(n) for y in range(x + 1, n)]

    sv0, sc0, ea0, _ = post_mod.all_pairs_posteriors_sparse(
        codes, lens, pack, pairs)
    monkeypatch.setattr(post_mod, "LONG_PAIR_THRESHOLD", 100)
    sv1, sc1, ea1, _ = post_mod.all_pairs_posteriors_sparse(
        codes, lens, pack, pairs)
    assert np.allclose(np.asarray(sv0), np.asarray(sv1), atol=1e-6)
    assert np.allclose(ea0, ea1, atol=1e-5)
    # identical sparsity pattern
    assert np.array_equal(np.asarray(sc0) >= 0, np.asarray(sc1) >= 0)
