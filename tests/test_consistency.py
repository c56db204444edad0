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
