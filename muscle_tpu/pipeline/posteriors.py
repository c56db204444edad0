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


def default_backend() -> str:
    """'pallas' on real TPU devices, 'scan' on CPU (tests/virtual mesh)."""
    import jax
    try:
        return "scan" if jax.default_backend() == "cpu" else "pallas"
    except Exception:
        return "scan"


def all_pairs_posteriors(codes: np.ndarray, lens: np.ndarray,
                         pack: ScorePack, pairs: list[tuple[int, int]],
                         batch_size: int = 32, with_mea: bool = True,
                         device_batch_fn=None, backend: str = "auto"):
    """Compute posteriors + EA for the given (x, y) pairs (x < y).

    Returns (post (P, L, L) float32 numpy, ea (P,) float32 numpy) where
    L is the padded length of `codes`. `backend` picks the device
    kernel: 'pallas' (TPU) or 'scan' (pure-XLA reference path).
    """
    n_pairs = len(pairs)
    if n_pairs == 0:
        L = codes.shape[1]
        return np.zeros((0, L, L), np.float32), np.zeros(0, np.float32)

    if backend == "auto":
        backend = default_backend()
    args = pairhmm.score_args(pack)
    import jax
    n_dev = len(jax.devices())
    if device_batch_fn is not None:
        fn = device_batch_fn
    elif n_dev > 1:
        # shard the pair axis across the device mesh (pure data
        # parallel; chunk padding below keeps B a mesh multiple)
        from ..parallel.mesh import make_mesh, sharded_batch_posteriors
        fn = sharded_batch_posteriors(make_mesh(), pack, with_mea=with_mea,
                                      backend=backend)
    elif backend == "pallas":
        from ..ops import pairhmm_pallas
        assert codes.shape[1] % 128 == 0, "pallas path needs 128-padded L"
        scan_k = pairhmm_pallas.pack_scan_k(pack)
        fn = lambda xb, yb, lxb, lyb: pairhmm_pallas.batch_posteriors_pallas(
            xb, yb, lxb, lyb, *args, with_mea=with_mea, scan_k=scan_k)
    else:
        fn = lambda xb, yb, lxb, lyb: pairhmm.batch_posteriors(
            xb, yb, lxb, lyb, *args, with_mea=with_mea)

    posts = []
    eas = []
    b = min(batch_size, n_pairs)
    if backend == "pallas":
        b = round_up(b, 8)       # tile_p granularity
    if n_dev > 1:
        b = round_up(b, n_dev)   # even shards across the mesh
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


def all_pairs_posteriors_mega(profiles: np.ndarray, lens: np.ndarray,
                              mega, pack: ScorePack,
                              pairs: list[tuple[int, int]],
                              batch_size: int = 16, with_mea: bool = True,
                              backend: str = "auto"):
    """Muscle-3D variant: posteriors from feature-profile emissions.

    profiles: (N, L, F) uint8 padded feature letters; transitions come
    from the standard HMM params (`pack`), emissions from the mega
    tables (reference: MPCFlat_mega overriding only Fwd/Bwd emissions,
    src/mpcflat.h:63-66 + src/fwdflat_mega.cpp).
    """
    import jax
    import jax.numpy as jnp
    from ..ops import pairhmm
    from ..ops.emissions import (mega_emission_matrix, mega_feature_arrays,
                                 mega_insert_scores)

    n_pairs = len(pairs)
    L = profiles.shape[1]
    if n_pairs == 0:
        return np.zeros((0, L, L), np.float32), np.zeros(0, np.float32)

    if backend == "auto":
        backend = default_backend()
    weights, log_probs, log_prob_mx = mega_feature_arrays(mega)
    start = jnp.asarray(pack.start)
    tv = pairhmm._trans_vec(pack)

    if backend == "pallas":
        from ..ops.pairhmm_pallas import batch_posteriors_pallas_emissions \
            as emis_fn
    else:
        emis_fn = pairhmm.batch_posteriors_emissions

    @jax.jit
    def run_chunk(px, py, lx, ly):
        b, l, f = px.shape
        pxr = jax.vmap(lambda p, n: jnp.roll(jnp.flip(p, 0), n - l, axis=0)
                       )(px, lx)
        pyr = jax.vmap(lambda p, n: jnp.roll(jnp.flip(p, 0), n - l, axis=0)
                       )(py, ly)
        e = mega_emission_matrix(px, py, weights, log_prob_mx)
        e_rev = mega_emission_matrix(pxr, pyr, weights, log_prob_mx)
        ins_x = mega_insert_scores(px, weights, log_probs)
        ins_y = mega_insert_scores(py, weights, log_probs)
        ins_xr = mega_insert_scores(pxr, weights, log_probs)
        ins_yr = mega_insert_scores(pyr, weights, log_probs)
        return emis_fn(e, e_rev, ins_x, ins_y, ins_xr, ins_yr, lx, ly,
                       start, tv, with_mea=with_mea)

    posts = []
    eas = []
    b = min(batch_size, n_pairs)
    if backend == "pallas":
        b = round_up(b, 8)
    for lo in range(0, n_pairs, b):
        chunk = pairs[lo:lo + b]
        pad = b - len(chunk)
        full = list(chunk) + [chunk[0]] * pad
        xi = np.array([p[0] for p in full])
        yi = np.array([p[1] for p in full])
        post, ea = run_chunk(jnp.asarray(profiles[xi]),
                             jnp.asarray(profiles[yi]),
                             jnp.asarray(lens[xi]), jnp.asarray(lens[yi]))
        post = np.asarray(post)
        ea = np.asarray(ea)
        if pad:
            post, ea = post[:len(chunk)], ea[:len(chunk)]
        posts.append(post)
        eas.append(ea)
    return np.concatenate(posts), np.concatenate(eas)
