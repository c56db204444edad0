"""Consistency block-matmul vs direct sparse-style reference computation."""

import numpy as np
import jax.numpy as jnp

from muscle_tpu.ops import consistency as cons


def _naive_consistency(post, mask, n):
    """Direct transcription of the relax math: for each pair (x, y),
    new = (2*P_xy + sum_{z!=x,y} P_xz @ P_zy) / n, masked to `mask`."""
    l = post.shape[2]
    out = np.zeros_like(post)
    for x in range(n):
        for y in range(n):
            if x == y:
                continue
            acc = 2.0 * post[x, y]
            for z in range(n):
                if z == x or z == y:
                    continue
                acc = acc + post[x, z] @ post[z, y]
            out[x, y] = np.where(mask[x, y], acc / n, 0.0)
    return out


def test_consistency_matches_naive():
    rng = np.random.default_rng(7)
    n, l = 5, 12
    pairs = [(x, y) for x in range(n) for y in range(x + 1, n)]
    posts = (rng.random((len(pairs), l, l)) ** 6).astype(np.float32)
    posts[posts < 0.01] = 0.0

    t = cons.pair_tensor_from_triu(jnp.asarray(posts), pairs, n, l)
    t_np = np.asarray(t)
    # symmetry
    assert np.allclose(t_np[1, 3], t_np[3, 1].T)
    mask = np.asarray(cons.sparsity_mask(t))

    got = np.asarray(cons.consistency_iter(t, jnp.asarray(mask), n))
    want = _naive_consistency(t_np, mask, n)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    # diagonal stays zero
    for i in range(n):
        assert np.all(got[i, i] == 0)


def test_consistency_padding_safe():
    """Zero rows/cols beyond true lengths must stay zero and not leak."""
    rng = np.random.default_rng(8)
    n, l = 4, 10
    lens = [10, 7, 5, 9]
    pairs = [(x, y) for x in range(n) for y in range(x + 1, n)]
    posts = np.zeros((len(pairs), l, l), np.float32)
    for k, (x, y) in enumerate(pairs):
        p = (rng.random((lens[x], lens[y])) ** 4).astype(np.float32)
        p[p < 0.01] = 0
        posts[k, :lens[x], :lens[y]] = p
    t = cons.pair_tensor_from_triu(jnp.asarray(posts), pairs, n, l)
    mask = cons.sparsity_mask(t)
    got = np.asarray(cons.consistency_iter(t, mask, n))
    for k, (x, y) in enumerate(pairs):
        assert np.all(got[x, y][lens[x]:, :] == 0)
        assert np.all(got[x, y][:, lens[y]:] == 0)


# ---------------------------------------------------------------------------
# Blocked sparse path (ops/sparse.py + consistency_sparse)
# ---------------------------------------------------------------------------

def _random_sparse_posts(rng, n, l, max_row_nnz=5):
    pairs = [(x, y) for x in range(n) for y in range(x + 1, n)]
    post = np.zeros((len(pairs), l, l), np.float32)
    for p in range(len(pairs)):
        for i in range(l):
            idx = rng.choice(l, size=rng.integers(1, max_row_nnz + 1),
                             replace=False)
            post[p, i, idx] = rng.random(len(idx)) * 0.9 + 0.02
    post[post < 0.01] = 0.0
    return pairs, post


def test_sparsify_densify_roundtrip():
    from muscle_tpu.ops import sparse as sp
    rng = np.random.default_rng(3)
    pairs, post = _random_sparse_posts(rng, 3, 32)
    vals, cols, mx = sp.sparsify(jnp.asarray(post), 8)
    assert int(mx) <= 8
    dense = np.asarray(sp.densify(vals, cols, 32))
    assert np.array_equal(dense, post)
    # host-side roundtrip agrees
    v0, c0 = sp.sparsify_np(post[0], 8)
    assert np.array_equal(sp.densify_np(v0, c0, 32), post[0])
    # pattern entries stay position-exact under a different K
    vals16, cols16, _ = sp.sparsify(jnp.asarray(post), 16)
    assert np.array_equal(np.asarray(sp.densify(vals16, cols16, 32)), post)


def test_consistency_sparse_matches_dense():
    """Blocked sparse path == dense block-matmul path (2 iterations),
    including non-divisible N and padded stores."""
    from muscle_tpu.ops import sparse as sp
    rng = np.random.default_rng(42)
    n, l, k = 7, 64, 16
    pairs, post = _random_sparse_posts(rng, n, l)

    t = cons.pair_tensor_from_triu(jnp.asarray(post), pairs, n, l)
    mask = cons.sparsity_mask(t)
    t2 = t
    for _ in range(2):
        t2 = cons.consistency_iter(t2, mask, n)
    xi = np.array([p[0] for p in pairs])
    yi = np.array([p[1] for p in pairs])
    dense_out = np.asarray(t2[xi, yi])

    vals, cols, mx = sp.sparsify(jnp.asarray(post), k)
    assert int(mx) <= k
    # padded store (as all_pairs_posteriors_sparse builds): extra rows
    # then the all-zero dump row
    pad = 3
    store_v = jnp.concatenate(
        [vals, jnp.zeros((pad + 1, l, k), jnp.float32)])
    store_c = jnp.concatenate(
        [cols, jnp.full((pad + 1, l, k), -1, jnp.int32)])
    out_v = cons.consistency_sparse(store_v, store_c, n, 2, seq_block=4)
    got = np.stack([sp.densify_np(np.asarray(out_v[p]),
                                  np.asarray(store_c[p]), l)
                    for p in range(len(pairs))])
    assert np.abs(got - dense_out).max() < 2e-5


def test_consistency_gram_matches_blocked():
    """Gram-scheme path (default) vs the per-block densify path — same
    math in different association; must agree to f32 accumulation
    noise across non-divisible N, rectangles, and K-trimmed stores."""
    from muscle_tpu.ops import sparse as sp
    rng = np.random.default_rng(11)
    n, l, k = 11, 32, 8
    pairs, post = _random_sparse_posts(rng, n, l)
    vals, cols, mx = sp.sparsify(jnp.asarray(post), k)
    store_v = jnp.concatenate([vals, jnp.zeros((1, l, k), jnp.float32)])
    store_c = jnp.concatenate([cols, jnp.full((1, l, k), -1, jnp.int32)])
    for precision in ("highest", "default"):
        gram = np.asarray(cons.consistency_sparse(
            store_v, store_c, n, 2, seq_block=4, precision=precision,
            max_nnz=int(mx)))
        blocked = np.asarray(cons.consistency_sparse_blocked(
            store_v, store_c, n, 2, seq_block=4, precision=precision,
            max_nnz=int(mx)))
        assert np.abs(gram[:-1] - blocked[:-1]).max() < \
            (1e-5 if precision == "highest" else 5e-2), precision


def test_consistency_precision_boundary():
    """The n >= 32 precision gate (pipeline/mpc.py
    consistency_precision_for) switches the blocked path from full-f32
    panels to single-pass bf16. Pin the quality of that downgrade AT
    the boundary (a 40-seq store, the band silently moved in round 4):
    bf16 values must stay within ~1% relative of the f32 result, and
    the top-ranked column per row — what MEA alignment consumes — must
    agree for almost every row."""
    from muscle_tpu.ops import sparse as sp
    rng = np.random.default_rng(5)
    n, l, k = 40, 64, 8
    pairs, post = _random_sparse_posts(rng, n, l)
    vals, cols, mx = sp.sparsify(jnp.asarray(post), k)
    sv = jnp.concatenate([vals, jnp.zeros((1, l, k), jnp.float32)])
    sc = jnp.concatenate([cols, jnp.full((1, l, k), -1, jnp.int32)])
    hi = np.asarray(cons.consistency_sparse(
        sv, sc, n, 2, seq_block=8, precision="highest",
        max_nnz=int(mx)))[:-1]
    lo = np.asarray(cons.consistency_sparse(
        sv, sc, n, 2, seq_block=8, precision="default",
        max_nnz=int(mx)))[:-1]
    denom = np.maximum(np.abs(hi), 1e-3)
    rel = np.abs(hi - lo) / denom
    assert float(rel.max()) < 2e-2, float(rel.max())
    # argmax (the entry MEA weights hardest) stable on >= 99% of rows
    am_hi = hi.argmax(axis=-1)
    am_lo = lo.argmax(axis=-1)
    agree = (am_hi == am_lo).mean()
    assert agree >= 0.99, agree


def test_consistency_sparse_sharded_matches_single():
    """Mesh-sharded wave (8 virtual devices) == single-device result."""
    import jax
    from muscle_tpu.ops import sparse as sp
    from muscle_tpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(9)
    n, l, k = 9, 32, 8
    pairs, post = _random_sparse_posts(rng, n, l, max_row_nnz=4)
    vals, cols, _ = sp.sparsify(jnp.asarray(post), k)
    store_v = jnp.concatenate([vals, jnp.zeros((1, l, k), jnp.float32)])
    store_c = jnp.concatenate([cols, jnp.full((1, l, k), -1, jnp.int32)])
    single = np.asarray(cons.consistency_sparse(
        store_v, store_c, n, 2, seq_block=4))
    mesh = make_mesh(jax.devices()[:8])
    sharded = np.asarray(cons.consistency_sparse(
        store_v, store_c, n, 2, seq_block=4, mesh=mesh))
    assert np.abs(single[:-1] - sharded[:-1]).max() < 1e-6
