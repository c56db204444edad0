"""Probabilistic-consistency transform as one big MXU matmul.

The reference implements consistency as three sparse relax loops per
pair (reference: src/conspairflat.cpp:10-110, src/relaxflat.cpp:4-94):

    P'_XY = (2*P_XY + sum_{Z != X,Y} P_XZ @ P_ZY) / N

restricted to the sparsity pattern of the *original* posterior (values
are rewritten in place through the old offsets — see
MySparseMx::UpdateFromPost, src/mysparsemx.cpp:88-113 — so the pattern
never grows).

TPU-first formulation: arrange all pair posteriors as an (N*L, N*L)
block matrix M with identity diagonal blocks (P_XX = I). Then

    (M @ M)[X,Y] = 2*P_XY + sum_{Z != X,Y} P_XZ @ P_ZY

exactly (the two identity blocks supply the 2*P_XY term), so one
batched/big matmul per iteration replaces the reference's O(N^3)
sparse scalar loops and runs on the systolic array. Padding is safe:
posterior rows/cols beyond a sequence's true length are zero, and
identity-block entries in the padded range only ever multiply zeros.

`consistency_iter` is jitted; the caller loops it (default 2 iters,
reference: src/mpcflat.h:12) and re-applies the sparsity mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pairhmm import MIN_SPARSE_PROB


def build_block_matrix(post_nn: jnp.ndarray) -> jnp.ndarray:
    """(N, N, L, L) pair tensor -> (N*L, N*L) block matrix with I diagonal.

    post_nn[x, y] must already satisfy post_nn[y, x] = post_nn[x, y].T
    and post_nn[x, x] = 0; the identity diagonal is added here.
    """
    n, _, l, _ = post_nn.shape
    eye = jnp.eye(l, dtype=post_nn.dtype)
    idx = jnp.arange(n)
    post_nn = post_nn.at[idx, idx].set(eye)
    return post_nn.transpose(0, 2, 1, 3).reshape(n * l, n * l)


@partial(jax.jit, static_argnames=("block_rows", "fast"))
def consistency_iter(post_nn: jnp.ndarray, mask_nn: jnp.ndarray,
                     seq_count: int | jnp.ndarray,
                     block_rows: int = 0, fast: bool = False) -> jnp.ndarray:
    """One consistency iteration over the full pair tensor.

    Args:
      post_nn: (N, N, L, L) f32, symmetric in the block sense, zero diag.
      mask_nn: (N, N, L, L) bool — the original >= 0.01 sparsity pattern.
      seq_count: N (the reference divides by the sequence count,
        src/mysparsemx.cpp:108).

    Returns the updated (N, N, L, L) tensor (masked, renormalized).
    """
    n, _, l, _ = post_nn.shape
    m = build_block_matrix(post_nn)
    # full f32 accuracy by default: posterior values sit near the 0.01
    # sparsity threshold, and JAX's DEFAULT matmul precision (bf16
    # passes on MXU) costs ~1e-3 relative error. `fast=True` trades
    # that error for MXU-native bf16 throughput.
    precision = (jax.lax.Precision.DEFAULT if fast
                 else jax.lax.Precision.HIGHEST)
    mm = jnp.dot(m, m, preferred_element_type=jnp.float32,
                 precision=precision)
    upd = mm.reshape(n, l, n, l).transpose(0, 2, 1, 3)
    upd = upd / jnp.asarray(seq_count, jnp.float32)
    upd = jnp.where(mask_nn, upd, 0.0)
    idx = jnp.arange(n)
    upd = upd.at[idx, idx].set(0.0)
    return upd


def pair_tensor_from_triu(post_pairs, pairs, n, l):
    """Stack upper-triangle pair posteriors into the (N, N, L, L) tensor.

    post_pairs: (P, L, L) posterior for pairs[k] = (x, y), x < y.
    """
    t = jnp.zeros((n, n, l, l), dtype=jnp.float32)
    xi = jnp.asarray([p[0] for p in pairs])
    yi = jnp.asarray([p[1] for p in pairs])
    t = t.at[xi, yi].set(post_pairs)
    t = t.at[yi, xi].set(jnp.swapaxes(post_pairs, -1, -2))
    return t


def sparsity_mask(post_nn: jnp.ndarray) -> jnp.ndarray:
    return post_nn >= MIN_SPARSE_PROB
