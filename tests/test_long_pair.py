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


def test_striped_kernels_match_scan(pack):
    """Y-striped fused kernels (ops/pairhmm_striped.py) vs the scan
    oracle, interpret mode with a small stripe width so multiple
    stripes + cross-stripe carries are exercised.  Length mix covers:
    ly == By (no padding lanes), ly < one stripe, ly crossing a stripe
    boundary, lx == Bx, and short-in-long padding."""
    from muscle_tpu.ops import pairhmm
    from muscle_tpu.ops.pairhmm_striped import striped_posteriors_sparse
    from muscle_tpu.ops.sparse import densify_np

    args = pairhmm.score_args(pack)
    rng = np.random.default_rng(0)
    b, bx, by, w = 8, 256, 512, 256
    wild = args[0].shape[0] - 1
    lxs = np.array([256, 200, 90, 256, 130, 240, 70, 220], np.int32)
    lys = np.array([512, 500, 450, 255, 256, 300, 100, 400], np.int32)
    xb = np.full((b, bx), wild, np.int32)
    yb = np.full((b, by), wild, np.int32)
    for i in range(b):
        xb[i, :lxs[i]] = rng.integers(0, 20, lxs[i])
        yb[i, :lys[i]] = rng.integers(0, 20, lys[i])

    post_s, ea_s = pairhmm.batch_posteriors(
        jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(lxs),
        jnp.asarray(lys), *args)
    post_s = np.asarray(post_s)
    ea_s = np.asarray(ea_s)

    vals, cols, ea_p, mnnz = striped_posteriors_sparse(
        jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(lxs),
        jnp.asarray(lys), *args, k=32, stripe_w=w, tile_p=8,
        interpret=True)
    vals = np.asarray(vals)
    cols = np.asarray(cols)
    ea_p = np.asarray(ea_p)

    dmax = 0.0
    for i in range(b):
        d = densify_np(vals[i], cols[i], by)
        ref = post_s[i, :bx, :by]
        # clip the oracle to its own per-row top-K for comparison
        srt = np.argsort(-ref, axis=1)[:, :32]
        rd = np.zeros_like(ref)
        rows = np.arange(ref.shape[0])[:, None]
        rd[rows, srt] = ref[rows, srt]
        dmax = max(dmax, float(np.abs(d - rd).max()))
    # same tolerance class as the fused kernels (threshold-edge
    # entries at 0.01 may differ by inclusion)
    assert dmax < 2e-2, dmax
    assert float(np.abs(ea_s - ea_p).max()) < 2e-3


def test_striped_router_band(pack, monkeypatch):
    """_long_pairs_sparse routes both-sides-beyond-cap pairs to the
    striped batch (not the slow scan), and the store matches the
    in-cap batched path."""
    from muscle_tpu.pipeline import posteriors as post_mod
    rng = np.random.default_rng(3)
    n, l = 3, 256
    codes = rng.integers(0, 20, size=(n, l)).astype(np.int32)
    lens = np.array([l, l - 40, l - 60], np.int32)
    for i in range(n):
        codes[i, lens[i]:] = 20
    pairs = [(x, y) for x in range(n) for y in range(x + 1, n)]

    sv0, sc0, ea0, _ = post_mod.all_pairs_posteriors_sparse(
        codes, lens, pack, pairs)

    calls = {}
    real = post_mod._long_pairs_striped_batch

    def spy(codes_, lens_, pack_, batch, k):
        calls["n"] = calls.get("n", 0) + len(batch)
        return real(codes_, lens_, pack_, batch, k)

    monkeypatch.setattr(post_mod, "LONG_PAIR_THRESHOLD", 100)
    monkeypatch.setattr(post_mod, "_LONG_PALLAS_MAX_LY", 128)
    monkeypatch.setattr(post_mod, "_STRIPE_W", 128)
    monkeypatch.setattr(post_mod, "_long_pairs_striped_batch", spy)
    monkeypatch.setattr(post_mod, "default_backend", lambda: "pallas")
    import muscle_tpu.ops.pairhmm_striped as ps
    orig = ps.striped_posteriors_sparse

    def interp(*a, **kw):
        kw["interpret"] = True
        kw["stripe_w"] = 128
        return orig(*a, **kw)

    monkeypatch.setattr(ps, "striped_posteriors_sparse", interp)
    sv1, sc1, ea1, _ = post_mod.all_pairs_posteriors_sparse(
        codes, lens, pack, pairs)
    assert calls.get("n", 0) == len(pairs)
    ok = (np.asarray(sc0) >= 0) & (np.asarray(sc1) >= 0)
    dv = np.abs(np.where(ok, np.asarray(sv0) - np.asarray(sv1), 0.0))
    assert float(dv.max()) < 2e-2
    assert np.allclose(ea0, ea1, atol=2e-3)
