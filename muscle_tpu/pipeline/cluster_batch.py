"""Batched Super4/Super7 cluster MPCs: many clusters' pair grids in one
device stream.

The reference aligns Super4 clusters strictly one at a time
(reference: src/super4.cpp — one MPCFlat::Run per cluster), which is
fine on a CPU where each cluster saturates the cores. On a TPU the
small clusters are the pathological case: a 5-seq cluster has 10
pairs, so its pair-stage dispatch runs the MXU at a few percent
occupancy and the wall is pure dispatch/tunnel latency; a 4.5k-seq
rdrp Super5 run produces ~160 such clusters back to back.

Here clusters become batch content instead of batch boundaries (the
same move pipeline/ensemble_batch.py makes for replicates):

* clusters are grouped by padded length rung; each device chunk packs
  MANY clusters' pair segments (each segment padded to its own
  compile rung exactly as the serial dense path pads) into one
  posterior dispatch;
* dense consistency + sparsify run per cluster on device SLICES of
  the chunk result — identical shapes, identical numerics, no extra
  host traffic;
* the per-cluster sparse stores of a chunk are concatenated and
  fetched in ONE packed-CSR transfer (the per-cluster fetch was
  ~0.5-2 s of count/pack/RT overhead each on the tunneled link);
* trees, progressive alignment and refinement stay host work per
  cluster, unchanged.

Outputs are bit-identical to the serial per-cluster loop: every
per-pair posterior is batch-composition-independent (the kernels
vmap/grid over the pair axis), each cluster's consistency sees
exactly the rows the serial `small_family_store` call sees, and the
host finish is the same code. Covered by tests/test_cluster_batch.py.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..hmm.params import HMMParams
from ..sequence import MultiSequence
from ..utils import logging as mlog
from . import posteriors as post_mod
from .mpc import MPC, consistency_precision_for, device_refine
from .progressive import PairPosteriors

# post-chunk budget: (B, L, L) f32 held live while per-cluster
# consistency consumes slices of it. A single cluster may exceed this
# (it then gets a chunk of its own — the same memory the serial dense
# path uses for that cluster).
_CHUNK_POST_BYTES = 1 << 30


def _eligible(mpc: MPC, n: int, pad_to: int) -> bool:
    """Clusters the batched dense path covers bit-identically.

    n == 2 has no consistency (reference: MPCFlat skips the transform
    below 3 seqs) — the iters=0 scatter/gather/sparsify reproduces the
    sparse-store path exactly. n >= 3 mirrors mpc.run's use_dense
    gate; clusters outside it (big n*L, or consistency disabled where
    the serial path would length-bucket pairs) keep the serial loop.
    """
    if n == 2:
        # the iters=0 consistency wrapper still builds a (4, 4, L, L)
        # scatter tensor — bound it (~256 MB at L=2048); longer 2-seq
        # clusters keep the serial sparse path
        return pad_to <= 2048
    return (n >= 3 and mpc.consistency_iters > 0
            and n * pad_to <= post_mod.SMALL_DENSE_NL)


def run_clusters_batched(subs, hp: HMMParams, alpha: str, mpc_factory):
    """Align each MultiSequence in `subs`; returns MSAs in input order.

    Bit-identical to `[mpc_factory().run(sub, hp, alpha) for sub in
    subs]` (singletons pass through unchanged, matching Super4).
    Disable with MUSCLE_TPU_BATCH_CLUSTERS=0.
    """
    results: list[MultiSequence | None] = [None] * len(subs)
    if os.environ.get("MUSCLE_TPU_BATCH_CLUSTERS") == "0":
        for i, sub in enumerate(subs):
            if len(sub) == 1:
                results[i] = sub
            else:
                results[i] = mpc_factory().run(sub, hp, alpha)
        return results

    pack = hp.to_scores()
    backend = post_mod.default_backend()
    step = post_mod._chunk_step(backend, 1)

    # prepare every cluster; partition batched vs serial.
    # group key = (pad_to, mega identity): sequence clusters share
    # _make_batch_fn compiles, Muscle-3D shrubs share the memoized
    # mega chunk fn (posteriors._make_mega_chunk_fn)
    groups: dict[tuple, list[dict]] = {}
    serial: list[int] = []
    for i, sub in enumerate(subs):
        if len(sub) == 1:
            results[i] = sub
            continue
        mpc = mpc_factory()
        derep, unique, n, labels, l2i, pad_to, pairs = mpc._prepare(sub)
        if n == 1 or not _eligible(mpc, n, pad_to):
            serial.append(i)
            continue
        if mpc.mega is not None:
            # feature profiles matched by label (mpc.run's mega branch)
            from ..ops.emissions import pad_profiles
            prof_by_label = {lb: p for lb, p in
                             zip(mpc.mega.labels, mpc.mega.profiles)}
            profs = [prof_by_label[s.label] for s in unique]
            lens = np.array([p.shape[0] for p in profs], dtype=np.int32)
            codes = pad_profiles(profs, pad_to)
        else:
            codes, lens = post_mod.encode_batch(unique, alpha,
                                                pad_to=pad_to)
        # the mega chunk fn shards over the mesh — its segments (and
        # the serial path it must mirror) round to the mesh-aware step
        if mpc.mega is not None:
            import jax
            cstep = post_mod._chunk_step(backend, len(jax.devices()))
        else:
            cstep = step
        key = (pad_to, id(mpc.mega) if mpc.mega is not None else None)
        groups.setdefault(key, []).append(dict(
            i=i, sub=sub, mpc=mpc, derep=derep, unique=unique, n=n,
            labels=labels, l2i=l2i, pairs=pairs, codes=codes, lens=lens,
            b=post_mod._rung(len(pairs), cstep), step=cstep))

    done = 0
    total = sum(1 for r in results if r is None)
    for (pad_to, _mega_id), ctxs in sorted(
            groups.items(), key=lambda kv: (kv[0][0], str(kv[0][1]))):
        budget = max(step, _CHUNK_POST_BYTES // (4 * pad_to * pad_to))
        # greedy pack clusters into chunks by padded-segment rows
        chunks: list[list[dict]] = []
        cur: list[dict] = []
        rows = 0
        for c in ctxs:
            if cur and rows + c["b"] > budget:
                chunks.append(cur)
                cur, rows = [], 0
            cur.append(c)
            rows += c["b"]
        if cur:
            chunks.append(cur)
        mega = ctxs[0]["mpc"].mega
        if mega is not None:
            fn = post_mod._make_mega_chunk_fn(mega, pack, True, backend)
        else:
            fn = post_mod._make_batch_fn(pad_to, pack, True, backend,
                                         None, 1)
        for chunk in chunks:
            done += _run_chunk(chunk, fn, pad_to, chunk[0]["step"], alpha)
            mlog.log("cluster batch: %d/%d clusters done (L=%d)",
                     done, total, pad_to)
            for c in chunk:
                results[c["i"]] = c.pop("msa")

    for i in serial:
        mlog.log("cluster batch: serial cluster %d (%d seqs)", i,
                 len(subs[i]))
        results[i] = mpc_factory().run(subs[i], hp, alpha)
    return results


def _run_chunk(chunk, fn, pad_to: int, step: int, alpha: str) -> int:
    """One posterior dispatch for every cluster segment in `chunk`,
    then per-cluster consistency/sparsify, one packed-CSR fetch, and
    the host finish. Stores each cluster's MSA in ctx['msa']."""
    # build the combined (codes, lens) table + padded pair segments
    seq_off = [0]
    for c in chunk:
        seq_off.append(seq_off[-1] + len(c["codes"]))
    all_codes = np.concatenate([c["codes"] for c in chunk])
    all_lens = np.concatenate([c["lens"] for c in chunk])
    xi_parts, yi_parts = [], []
    for c, off in zip(chunk, seq_off):
        seg = list(c["pairs"]) + [c["pairs"][0]] * (c["b"] - len(c["pairs"]))
        xi_parts.append(np.array([p[0] for p in seg]) + off)
        yi_parts.append(np.array([p[1] for p in seg]) + off)
    xi = np.concatenate(xi_parts)
    yi = np.concatenate(yi_parts)
    total = post_mod._rung(len(xi), step)
    if total > len(xi):     # compile-rung tail: repeats of last pair0
        pad = total - len(xi)
        xi = np.concatenate([xi, np.full(pad, xi_parts[-1][0])])
        yi = np.concatenate([yi, np.full(pad, yi_parts[-1][0])])

    from ..utils.devretry import call_with_retry
    cj = jnp.asarray(all_codes)
    lj = jnp.asarray(all_lens)
    post, ea = call_with_retry(fn, cj[xi], cj[yi], lj[xi], lj[yi])
    ea_np = np.asarray(ea)

    # per-cluster consistency + sparsify on device slices
    lo = 0
    nnz_devs = []
    for c in chunk:
        n, pairs, b = c["n"], c["pairs"], c["b"]
        seg_pairs = list(pairs) + [pairs[0]] * (b - len(pairs))
        xi_l = jnp.asarray(np.array([p[0] for p in seg_pairs], np.int32))
        yi_l = jnp.asarray(np.array([p[1] for p in seg_pairs], np.int32))
        iters = c["mpc"].consistency_iters if n >= 3 else 0
        precision = consistency_precision_for(
            n, c["mpc"].consistency_precision)
        sv, sc, nnz = post_mod._cons_sparsify(
            post[lo:lo + b], xi_l, yi_l, jnp.float32(n),
            jnp.int32(len(pairs)), post_mod._rung(n, 4), iters,
            c["mpc"].sparse_k, precision == "default")
        c["sv"], c["sc"] = sv, sc
        c["ea"] = ea_np[lo:lo + len(pairs)]
        nnz_devs.append(nnz)
        lo += b
    del post
    nnz_np = np.asarray(jnp.stack(nnz_devs))

    # one packed-CSR fetch for the whole chunk
    chunk_k = 8
    for c, mx in zip(chunk, nnz_np):
        c["max_nnz"] = int(mx)
        k2s = min(c["mpc"].sparse_k, max(8, -(-int(mx) // 8) * 8))
        c["k2s"] = k2s
        chunk_k = max(chunk_k, k2s)
    cat_v = jnp.concatenate(
        [c["sv"][:len(c["pairs"]), :, :chunk_k] for c in chunk])
    cat_c = jnp.concatenate(
        [c["sc"][:len(c["pairs"]), :, :chunk_k] for c in chunk])
    flat_v, flat_c, nnz_rows = post_mod.fetch_store_csr(cat_v, cat_c,
                                                        pad_to)
    del cat_v, cat_c
    row_sums = nnz_rows.sum(axis=1)
    row0 = 0
    base = 0
    for c in chunk:
        npairs = len(c["pairs"])
        rows = nnz_rows[row0:row0 + npairs]
        tot = int(row_sums[row0:row0 + npairs].sum())
        views = post_mod.csr_views(
            flat_v[base:base + tot], flat_c[base:base + tot], rows,
            npairs, lambda t, c=c: int(c["lens"][c["pairs"][t][0]]))
        posts = PairPosteriors()
        for (x, y), (v, cc, r) in zip(c["pairs"], views):
            posts.set_csr(x, y, v, cc, r, int(c["lens"][y]))
        c["posts"] = posts
        row0 += npairs
        base += tot

    # host finish per cluster (tree -> progressive -> refine -> sort)
    for c in chunk:
        mpc, n, pairs = c["mpc"], c["n"], c["pairs"]
        if c["max_nnz"] > mpc.sparse_k:
            mlog.log("sparse posterior truncation: max row nnz %d > "
                     "K=%d", c["max_nnz"], mpc.sparse_k)
        mpc.dist_mx = post_mod.ea_dist_matrix(n, pairs, c["ea"])
        tree = mpc._tree_from_dist(c["labels"], mpc.dist_mx)
        mpc.guide_tree = tree
        joiner = None
        if device_refine(n):
            from .devjoin import DeviceJoiner
            sv = c["sv"][:, :, :c["k2s"]]
            sc = c["sc"][:, :, :c["k2s"]]
            if sv.shape[0] == len(pairs):
                sv = jnp.pad(sv, ((0, 8), (0, 0), (0, 0)))
                sc = jnp.pad(sc, ((0, 8), (0, 0), (0, 0)),
                             constant_values=-1)
            joiner = DeviceJoiner(sv, sc, pairs, c["lens"], n,
                                  min(c["max_nnz"], mpc.sparse_k),
                                  c["l2i"])
        c.pop("sv"), c.pop("sc")
        c["msa"] = mpc._finish(c["sub"], c["derep"], c["unique"], tree,
                               c["l2i"], c["posts"], None, joiner=joiner)
    return len(chunk)
