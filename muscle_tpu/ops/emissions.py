"""Device emission builders for the pair-HMM kernels.

The kernels (ops/pairhmm.py, ops/pairhmm_pallas.py) consume a
precomputed (B, Lx, Ly) emission lattice plus per-position insert
scores. Two models:

* letters: E[i, j] = match_table[x_i, y_j] (built inside
  batch_posteriors via table lookups / one-hot matmuls)
* Muscle-3D feature profiles (reference: src/mega.cpp:273-361,
  src/fwdflat_mega.cpp): E[i, j] = sum_f w_f * logP_f[px[i,f], py[j,f]]
  — one one-hot MXU matmul pair per feature, summed. Insert scores
  ins[i] = sum_f w_f * logfreq_f[px[i,f]].

Profiles are padded along L with letter 0 (scores are garbage in the
padded region but the kernels never read them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mega_feature_arrays(mega):
    """Stack per-feature tables for device use.

    Returns (weights (F,), log_probs list, log_prob_mx list) as jnp
    arrays (per-feature alphabet sizes differ, so lists not stacks).
    """
    w = jnp.asarray(mega.weights)
    lps = [jnp.asarray(a) for a in mega.log_probs]
    lpm = [jnp.asarray(m) for m in mega.log_prob_mx]
    return w, lps, lpm


def mega_insert_scores(profs: jnp.ndarray, weights, log_probs) -> jnp.ndarray:
    """profs: (B, L, F) uint8 -> (B, L) f32 weighted insert scores."""
    total = jnp.zeros(profs.shape[:2], jnp.float32)
    for f, lp in enumerate(log_probs):
        total = total + weights[f] * lp[profs[:, :, f]]
    return total


def mega_emission_matrix(profx: jnp.ndarray, profy: jnp.ndarray,
                         weights, log_prob_mx) -> jnp.ndarray:
    """(B, Lx, F), (B, Ly, F) profiles -> (B, Lx, Ly) emission lattice.

    Per feature: one-hot(px) @ logP_f @ one-hot(py)^T on the MXU,
    accumulated with the feature weight.
    """
    b, lx, fcount = profx.shape
    ly = profy.shape[1]
    total = jnp.zeros((b, lx, ly), jnp.float32)
    for f, mx in enumerate(log_prob_mx):
        k = mx.shape[0]
        ox = jax.nn.one_hot(profx[:, :, f], k, dtype=jnp.float32)
        oy = jax.nn.one_hot(profy[:, :, f], k, dtype=jnp.float32)
        xm = jax.lax.dot_general(ox, mx, (((2,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST)
        total = total + weights[f] * jax.lax.dot_general(
            xm, oy, (((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)
    return total


def pad_profiles(profiles: list[np.ndarray], pad_to: int) -> np.ndarray:
    """list of (L_i, F) -> (N, pad_to, F) uint8 plus no separate lens
    (caller keeps lengths)."""
    n = len(profiles)
    f = profiles[0].shape[1]
    out = np.zeros((n, pad_to, f), dtype=np.uint8)
    for i, p in enumerate(profiles):
        out[i, :p.shape[0]] = p
    return out
