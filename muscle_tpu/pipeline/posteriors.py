"""Batched all-pairs posterior computation (device orchestration).

The O(N^2) pair grid is the dominant cost of MPC (reference:
MPCFlat::CalcPosteriors, src/mpcflat.cpp:214-252, OpenMP over pairs).
Here pairs are padded to a common length, packed into fixed-size
batches, and pushed through the vmapped scan kernel
(ops.pairhmm.batch_posteriors); fixed batch shapes mean one XLA
compilation. `parallel.shard_pairs` shards the same batches across a
device mesh.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..alphabet import encode
from ..hmm.params import ScorePack
from ..ops import pairhmm
from ..utils.jaxsetup import setup_jax

setup_jax()


def encode_batch(seqs, alpha: str, pad_to: int | None = None):
    """Encode+pad sequences to (N, Lpad) int32 codes + lengths."""
    from ..alphabet import alphabet_size
    wild = alphabet_size(alpha)
    arrs = [encode(s.bytes_view(), alpha).astype(np.int32) for s in seqs]
    lens = np.array([len(a) for a in arrs], dtype=np.int32)
    lmax = int(pad_to if pad_to is not None else max((len(a) for a in arrs), default=1))
    out = np.full((len(arrs), lmax), wild, dtype=np.int32)
    for i, a in enumerate(arrs):
        out[i, :len(a)] = a
    return out, lens


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def all_pairs_posteriors(codes: np.ndarray, lens: np.ndarray,
                         pack: ScorePack, pairs: list[tuple[int, int]],
                         batch_size: int = 32, with_mea: bool = True,
                         device_batch_fn=None):
    """Compute posteriors + EA for the given (x, y) pairs (x < y).

    Returns (post (P, L, L) float32 numpy, ea (P,) float32 numpy) where
    L is the padded length of `codes`.
    """
    n_pairs = len(pairs)
    if n_pairs == 0:
        L = codes.shape[1]
        return np.zeros((0, L, L), np.float32), np.zeros(0, np.float32)

    args = pairhmm.score_args(pack)
    fn = device_batch_fn or (
        lambda xb, yb, lxb, lyb: pairhmm.batch_posteriors(
            xb, yb, lxb, lyb, *args, with_mea=with_mea))

    posts = []
    eas = []
    b = min(batch_size, n_pairs)
    for lo in range(0, n_pairs, b):
        chunk = pairs[lo:lo + b]
        # pad the final chunk by repeating the first pair (same shapes ->
        # one XLA compilation); padded lanes are discarded below
        pad = b - len(chunk)
        full = list(chunk) + [chunk[0]] * pad
        xi = np.array([p[0] for p in full])
        yi = np.array([p[1] for p in full])
        post, ea = fn(jnp.asarray(codes[xi]), jnp.asarray(codes[yi]),
                      jnp.asarray(lens[xi]), jnp.asarray(lens[yi]))
        post = np.asarray(post)
        ea = np.asarray(ea)
        if pad:
            post, ea = post[:len(chunk)], ea[:len(chunk)]
        posts.append(post)
        eas.append(ea)
    return np.concatenate(posts), np.concatenate(eas)


def ea_dist_matrix(n: int, pairs: list[tuple[int, int]], ea: np.ndarray
                   ) -> np.ndarray:
    d = np.zeros((n, n), dtype=np.float32)
    for (x, y), v in zip(pairs, ea):
        d[x, y] = d[y, x] = v
    return d
