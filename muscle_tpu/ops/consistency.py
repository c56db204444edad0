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
import numpy as np

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


# ---------------------------------------------------------------------------
# Blocked sparse consistency — the memory-scalable path
# ---------------------------------------------------------------------------
#
# The dense path above materializes the full (N*L, N*L) block matrix:
# exact, but O(N^2 L^2) memory (42 GB at N=200, L=512 — measured OOM at
# N=64 on a 16 GB chip). Here the pair posteriors live in the fixed-K
# row-sparse store (ops/sparse.py) and the M @ M product is computed
# block-by-block: for each (X-block, Y-block) of output pairs,
# accumulate over Z-tiles with both panels *densified on the fly* into
# (block, tile) dense slabs and contracted as one big MXU matmul.
# Identity diagonal blocks (the 2*P_XY term) and transposed orientation
# (P_ZY = P_YZ^T for Z > Y) are handled per-slab by flag maps. Only the
# fixed sparsity pattern of the output pair is gathered from the
# accumulator, so the updated store never grows — exactly the
# reference's rewrite-through-old-offsets semantics
# (src/mysparsemx.cpp:88-113).

FLAG_STORE, FLAG_TRANS, FLAG_EYE = 0, 1, 2


def pair_index(x: int, y: int, n: int) -> int:
    """Index of pair (x, y), x < y, in the canonical
    [(x, y) for x in range(n) for y in range(x+1, n)] order."""
    return x * n - x * (x + 1) // 2 + (y - x - 1)


def _block_maps(n: int, nb: int, dump: int):
    """(nb, nb) pair-id and orientation-flag matrices; entry (a, b)
    describes how to materialize dense M[a, b]. Dump row `dump`
    (all-zero) backs padded/eye slots."""
    pid = np.full((nb, nb), dump, dtype=np.int32)
    flag = np.zeros((nb, nb), dtype=np.int8)
    for a in range(n):
        flag[a, a] = FLAG_EYE
        for b in range(a + 1, n):
            k = pair_index(a, b, n)
            pid[a, b] = k
            pid[b, a] = k
            flag[b, a] = FLAG_TRANS
    return pid, flag


def _block_core(vals, cols, pid_rows, flag_rows, pid_cols, flag_cols,
                pid_out, inv_n, bx: int, by: int, t: int, l: int,
                precision: str, use_pallas: bool = False):
    """One (X-block, Y-block) of the blocked M @ M.

    vals/cols: (P+1, L, K) store (dump row last). pid_rows/flag_rows:
    (bx, nb) Z-panel maps for the X rows; pid_cols/flag_cols: (nb, by);
    pid_out: (bx, by) output pair ids (dump for invalid). Returns the
    block's new pattern values (bx*by, L, K).
    """
    nb = pid_rows.shape[1]
    eye = jnp.eye(l, dtype=jnp.float32)

    def densify_panel(ids, flags):
        # ids, flags: (r*c,) -> (r*c, l, l)
        v = jnp.where(cols[ids] >= 0, vals[ids], 0.0)
        m = ids.shape[0]

        if use_pallas == "pallas":
            # VMEM-resident expansion: K compare+fma passes over
            # registers, ONE HBM write of the dense slab (ops/sparse.py).
            # ~3x faster than the scatter at N=83 BUT its XLA program
            # compiles in 300+s per shape and the remote compile service
            # times out on larger ones — opt-in (MUSCLE_TPU_DENSIFY=
            # pallas).
            from .sparse import densify_pallas
            d = densify_pallas(v, cols[ids], l)
        elif use_pallas == "compare":
            # K compare-accumulate passes in pure XLA (VPU compare+fma
            # per slot): no scatter serialization, no Pallas machinery.
            # Default on accelerators — measured on chip (N=64, L=512,
            # K=32): 2.69 s/iter vs the scatter's 5.90 s (2.2x),
            # bit-equal output. Structured as lax.scan(unroll=8) rather
            # than a plain Python unroll: the full unroll sometimes
            # fails to fuse and XLA keeps every (m, l, l) intermediate
            # live (measured 19 GB HBM OOM at n=14), while the scan
            # bounds peak memory at the accumulator + one unroll window
            # and keeps near-unrolled throughput.
            c = cols[ids]
            jcol = jnp.arange(l, dtype=c.dtype)[None, None, :]
            vk = jnp.moveaxis(v, -1, 0)[:, :, :, None]    # (K, m, l, 1)
            ck = jnp.moveaxis(c, -1, 0)[:, :, :, None]

            def kstep(d, vc):
                vs, cs = vc
                return d + vs * (cs == jcol), None

            d, _ = jax.lax.scan(kstep, jnp.zeros((m, l, l), jnp.float32),
                                (vk, ck), unroll=8)
        else:
            # scatter-add expansion. TPU scatters serialize (the
            # dominant consistency cost at large N), but the program
            # compiles in seconds — and with one compile per (ladder)
            # shape that wins for cluster pipelines.
            c = jnp.where(cols[ids] >= 0, cols[ids], 0)
            ri = jnp.arange(l)[None, :, None]
            d = jnp.zeros((m, l, l), jnp.float32)
            d = d.at[jnp.arange(m)[:, None, None], ri, c].add(v)
        d = jnp.where((flags == FLAG_TRANS)[:, None, None],
                      jnp.swapaxes(d, -1, -2), d)
        d = jnp.where((flags == FLAG_EYE)[:, None, None], eye[None], d)
        return d

    def zstep(zi, acc):
        pr = jax.lax.dynamic_slice(pid_rows, (0, zi * t), (bx, t))
        fr = jax.lax.dynamic_slice(flag_rows, (0, zi * t), (bx, t))
        pc = jax.lax.dynamic_slice(pid_cols, (zi * t, 0), (t, by))
        fc = jax.lax.dynamic_slice(flag_cols, (zi * t, 0), (t, by))
        left = densify_panel(pr.reshape(-1), fr.reshape(-1))
        right = densify_panel(pc.reshape(-1), fc.reshape(-1))
        lm = left.reshape(bx, t, l, l).transpose(0, 2, 1, 3) \
                 .reshape(bx * l, t * l)
        rm = right.reshape(t, by, l, l).transpose(0, 2, 1, 3) \
                  .reshape(t * l, by * l)
        return acc + jnp.dot(lm, rm, precision=precision,
                             preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, nb // t, zstep, jnp.zeros((bx * l, by * l), jnp.float32))
    accp = acc.reshape(bx, l, by, l).transpose(0, 2, 1, 3) \
              .reshape(bx * by, l, l)
    po = pid_out.reshape(-1)
    cxy = cols[po]
    g = jnp.take_along_axis(accp, jnp.where(cxy >= 0, cxy, 0),
                            axis=-1) * inv_n
    return jnp.where(cxy >= 0, g, 0.0)


@partial(jax.jit,
         static_argnames=("bx", "by", "t", "l", "precision",
                          "use_pallas"),
         donate_argnames=("out_vals",))
def _blocks_wave(vals, cols, out_vals, prs, frs, pcs, fcs, pos, inv_n,
                 bx: int, by: int, t: int, l: int, precision: str,
                 use_pallas: bool = False):
    """A wave of independent blocks, vmapped into ONE dispatch (the
    block axis is also the mesh-sharding axis in the multi-chip path)."""
    k = vals.shape[2]
    newv = jax.vmap(
        lambda pr, fr, pc, fc, po: _block_core(
            vals, cols, pr, fr, pc, fc, po, inv_n,
            bx=bx, by=by, t=t, l=l, precision=precision,
            use_pallas=use_pallas)
    )(prs, frs, pcs, fcs, pos)
    # blocks write disjoint pair ids (dump rows excepted, whose value
    # is irrelevant), so scatter order does not matter
    return out_vals.at[pos.reshape(-1)].set(newv.reshape(-1, l, k))


def _nb_bucket(n: int, blk: int) -> int:
    """Pad the Z-panel count to a small ladder so _blocks_wave compiles
    once per (ladder rung, L) instead of once per exact N — padded
    panels reference the all-zero dump row and contribute exact zeros
    (a 159-cluster Super4 run otherwise pays a multi-minute XLA compile
    per distinct cluster size)."""
    nb = -(-n // blk) * blk
    # geometric ladder: blk * {1, 2, 3, 4, 6, 8, 12, 16, ...}
    steps = [1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128]
    for st in steps:
        if blk * st >= nb:
            return blk * st
    return nb


def _wave_plan(n, blk, dump, nb=None, group=1):
    """Host-side block descriptors for one iteration: stacked
    (NB, bx, nb) row maps, (NB, nb, by) col maps, (NB, bx, by) output
    pair ids over the upper-triangular block grid.

    group > 1 emits RECTANGLES of `group` adjacent column blocks
    (by = group*blk): the row z-panels are densified once per
    rectangle instead of once per block — densification is the
    dominant consistency cost — and the matmuls get wider. Overhang
    columns are dump-padded (exact zeros)."""
    if nb is None:
        nb = -(-n // blk) * blk
    pid, flag = _block_maps(n, nb, dump)
    prs, frs, pcs, fcs, pos = [], [], [], [], []
    nblk = nb // blk
    gw = group * blk
    for bi in range(nblk):
        rs = slice(bi * blk, (bi + 1) * blk)
        for bj0 in range(bi, nblk, group):
            width = min(group, nblk - bj0)
            cs = slice(bj0 * blk, (bj0 + width) * blk)
            pc = np.full((nb, gw), dump, np.int32)
            fc = np.zeros((nb, gw), np.int32)
            po = np.full((blk, gw), dump, np.int32)
            pc[:, :width * blk] = pid[:, cs]
            fc[:, :width * blk] = flag[:, cs]
            for a in range(rs.start, min(rs.stop, n)):
                for b in range(max(cs.start, a + 1), min(cs.stop, n)):
                    po[a - rs.start, b - cs.start] = pair_index(a, b, n)
            prs.append(pid[rs])
            frs.append(flag[rs])
            pcs.append(pc)
            fcs.append(fc)
            pos.append(po)
    stack = lambda x: np.stack(x).astype(np.int32)
    return stack(prs), stack(frs), stack(pcs), stack(fcs), stack(pos)


def _dummy_block(dump, blk, nb, group=1):
    """All-dump block descriptor (pads waves to a device multiple)."""
    gw = group * blk
    return (np.full((blk, nb), dump, np.int32),
            np.zeros((blk, nb), np.int32),
            np.full((nb, gw), dump, np.int32),
            np.zeros((nb, gw), np.int32),
            np.full((blk, gw), dump, np.int32))


def consistency_sparse_blocked(vals, cols, n: int, iters: int, *,
                               seq_block: int = 16,
                               precision: str = "highest",
                               wave: int | None = None, mesh=None,
                               max_nnz: int | None = None):
    """Run `iters` consistency iterations over the device sparse store.

    vals/cols: (>= P+1, L, K) device arrays in canonical pair order;
    rows beyond P = n*(n-1)/2 are padding and the LAST row must be
    all-zero (the dump slot). Returns the updated vals store
    (cols/pattern unchanged — reference semantics).

    Blocks are dispatched in vmapped waves; with `mesh` (1-D device
    mesh) the wave's block axis is sharded data-parallel and XLA
    inserts the store all-gather / output merge over ICI.
    """
    p1, l, k = vals.shape
    k_full = k
    if max_nnz is not None and max(8, -(-int(max_nnz) // 8) * 8) < k:
        # densify cost is linear in K and sparsify packs valid slots
        # first (top_k), so run the iteration on the occupied prefix
        # only and pad back at the end — exact, often ~2x less panel
        # expansion work (real posteriors rarely fill K=32 slots)
        k = max(8, -(-int(max_nnz) // 8) * 8)
        vals = vals[:, :, :k]
        cols = cols[:, :, :k]
    import os
    n_pairs = n * (n - 1) // 2
    dump = p1 - 1
    assert n_pairs <= dump
    blk = min(seq_block, max(1, n))
    nb = _nb_bucket(n, blk)
    # rectangle width (in blocks): `group` adjacent column blocks share
    # one densified row z-panel. Measured on chip (N=64, L=512, K16):
    # group=1 4.5 s/iter, group=2 6.5, group=4 5.7 — the triangular
    # grid's dump-padding waste and the lost wave parallelism outweigh
    # the panel reuse, so the default stays 1 (env knob kept for
    # larger-N experiments).
    nblk = nb // blk
    group = 1
    if os.environ.get("MUSCLE_TPU_CONS_GROUP"):
        group = max(1, min(int(os.environ["MUSCLE_TPU_CONS_GROUP"]), nblk))
    gw = group * blk
    prs, frs, pcs, fcs, pos = _wave_plan(n, blk, dump, nb, group)
    nblk_total = prs.shape[0]
    if wave is None:
        # bound the wave's live HBM: per rectangle, the densified
        # (blk*L, blk*L) row panel + (blk*L, gw*L) col panel
        # (double/triple-buffered across the fori accumulate) + the
        # (blk*L, gw*L) accumulator + output pattern. Each rectangle
        # already saturates the MXU, so small waves cost little
        # parallelism.
        per_block = (3 * (blk * blk + blk * gw) + blk * gw) * l * l * 4
        wave = max(1, min(nblk_total, (3 << 30) // max(1, per_block)))
    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        wave = -(-wave // n_dev) * n_dev
    inv_n = jnp.float32(1.0 / n)

    # densify mode for the Z-panel expansion: 'compare' (K-unrolled
    # compare-accumulate, default on accelerators), 'pallas' (VMEM
    # kernel; long compile), 'scatter' (serializing but CPU-friendly)
    use_pallas = os.environ.get("MUSCLE_TPU_DENSIFY") or \
        ("scatter" if jax.default_backend() == "cpu" else "compare")
    if mesh is None:
        def run(*args):
            return _blocks_wave(*args, bx=blk, by=gw, t=blk, l=l,
                                precision=precision,
                                use_pallas=use_pallas)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        # shard the wave's block axis over EVERY mesh axis (1-D 'dp' or
        # 2-D (dcn, ici) — blocks are pure data parallel either way)
        blk_sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        rep = NamedSharding(mesh, P())
        base = _blocks_wave.__wrapped__

        def _fixed(vals_, cols_, out_, prs_, frs_, pcs_, fcs_, pos_,
                   inv_n_):
            return base(vals_, cols_, out_, prs_, frs_, pcs_, fcs_,
                        pos_, inv_n_, bx=blk, by=gw, t=blk, l=l,
                        precision=precision, use_pallas=use_pallas)

        run = jax.jit(_fixed, donate_argnums=(2,),
                      in_shardings=(rep, rep, rep, blk_sh, blk_sh,
                                    blk_sh, blk_sh, blk_sh, rep),
                      out_shardings=rep)

    # retry at the ITERATION level: `run` donates the accumulator, so a
    # failed wave leaves `out` deleted and cannot simply be re-issued
    # (ADVICE r2). vals/cols are never donated, so restarting the
    # iteration from a fresh zero accumulator is always safe.
    from ..utils import logging as mlog
    from ..utils.devretry import is_transient
    import time as _time
    retries = 5
    for _ in range(iters):
        for attempt in range(retries + 1):
            out = jnp.zeros_like(vals)
            try:
                for lo in range(0, nblk_total, wave):
                    w = [a[lo:lo + wave]
                         for a in (prs, frs, pcs, fcs, pos)]
                    pad = (wave - w[0].shape[0]
                           if lo + wave > nblk_total else 0)
                    if pad:
                        dmy = _dummy_block(dump, blk, nb, group)
                        w = [np.concatenate([a, np.stack([d] * pad)])
                             for a, d in zip(w, dmy)]
                    out = run(vals, cols, out,
                              jnp.asarray(w[0]), jnp.asarray(w[1]),
                              jnp.asarray(w[2]), jnp.asarray(w[3]),
                              jnp.asarray(w[4]), inv_n)
                break
            except Exception as e:
                if attempt >= retries or not is_transient(e):
                    raise
                delay = 10.0 * (2 ** attempt)
                mlog.progress(
                    "transient device error in consistency (%s); "
                    "restarting iteration %d/%d in %.0fs",
                    str(e).splitlines()[0][:120], attempt + 1, retries,
                    delay)
                _time.sleep(delay)
        vals = out
    if k < k_full:
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, k_full - k)))
    return vals


# ---------------------------------------------------------------------------
# Gram-scheme consistency — the default path
# ---------------------------------------------------------------------------
#
# M is SYMMETRIC as a plain matrix: block (y, x) = block (x, y)^T (the
# store holds P_XY for x < y; M's lower blocks are their transposes and
# the diagonal is I), hence M @ M = M^T M is a GRAM matrix. That means
# each Z row-panel M[Z, :] can be densified ONCE per z-tile and serve
# every output block as BOTH operands:
#
#     out[X, Y] += M[X, Z] @ M[Z, Y] = RZ[:, X]^T @ RZ[:, Y]
#
# The blocked path above re-densifies both operand panels per output
# block — bx*t + t*by slab expansions per (block, z-step), each a full
# HBM round trip of an (m, L, L) slab per K compare pass. At N=200,
# L=512 that is ~1.1M slab expansions per iteration vs ~4k here
# (~270x), and the round-4 profile (docs/PARITY.md) shows exactly that
# expansion traffic dominating the ~240 s consistency wall. Here the
# matmuls — the irreducible O(N^3 L^3 / blk^3) MXU work — are the only
# O(N^2)-per-z cost; z-tiles beyond N are skipped host-side (no ladder
# padding waste in the contraction), and partial sums accumulate
# straight into the fixed sparsity pattern (f32 scatter-add on the
# (P, L, K) store), so no dense (N*L)^2 accumulator ever exists.
# Reference semantics unchanged: src/relaxflat.cpp:4-94,
# src/mysparsemx.cpp:88-113 (rewrite-through-old-offsets).


def _slab_expand(vals, cols, ids, flags, l: int, mode: str):
    """(m,) store ids + orientation flags -> (m, l, l) dense slabs."""
    v = jnp.where(cols[ids] >= 0, vals[ids], 0.0)
    m = ids.shape[0]
    eye = jnp.eye(l, dtype=jnp.float32)
    if mode == "pallas":
        from .sparse import densify_pallas
        d = densify_pallas(v, cols[ids], l)
    elif mode == "compare":
        # K compare-accumulate passes (see _block_core for the
        # scan-vs-unroll memory rationale)
        c = cols[ids]
        jcol = jnp.arange(l, dtype=c.dtype)[None, None, :]
        vk = jnp.moveaxis(v, -1, 0)[:, :, :, None]
        ck = jnp.moveaxis(c, -1, 0)[:, :, :, None]

        def kstep(d, vc):
            vs, cs = vc
            return d + vs * (cs == jcol), None

        d, _ = jax.lax.scan(kstep, jnp.zeros((m, l, l), jnp.float32),
                            (vk, ck), unroll=8)
    else:  # scatter (CPU-friendly)
        c = jnp.where(cols[ids] >= 0, cols[ids], 0)
        ri = jnp.arange(l)[None, :, None]
        d = jnp.zeros((m, l, l), jnp.float32)
        d = d.at[jnp.arange(m)[:, None, None], ri, c].add(v)
    d = jnp.where((flags == FLAG_TRANS)[:, None, None],
                  jnp.swapaxes(d, -1, -2), d)
    d = jnp.where((flags == FLAG_EYE)[:, None, None], eye[None], d)
    return d


@partial(jax.jit, static_argnames=("t", "l", "mode", "bf16", "cb"))
def _densify_rowpanel(vals, cols, pids, flags, t: int, l: int,
                      mode: str, bf16: bool = False, cb: int = 16):
    """(t, NBP) z-tile maps -> (t*l, NBP*l) dense row panel of M.

    mode "fused" (TPU default): masked-reduction expansion XLA fuses
    into one pass per chunk. All modes run as chunked XLA expansion —
    column chunks of `cb` blocks inside a fori_loop (the all-at-once expansion would
    materialize t*NBP (l, l) slabs — 140 GB of intermediates at N=200)
    with in-place updates of the panel. NBP must be a multiple of cb
    (the caller dump-pads).
    """
    nbp = pids.shape[1]
    assert nbp % cb == 0, (nbp, cb)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    jcol = jnp.arange(l, dtype=jnp.int32)[None, None, None, :]

    def chunk(ci, rz):
        pc = jax.lax.dynamic_slice(pids, (0, ci * cb), (t, cb))
        fc = jax.lax.dynamic_slice(flags, (0, ci * cb), (t, cb))
        if mode == "fused":
            # masked-reduction densify: XLA fuses the virtual
            # (m, l, K, l) compare+mul+sum into ONE pass writing the
            # (m, l, l) slabs — measured 55 ms/panel vs 563 ms for the
            # K-pass scan at N=200/L=512 (the scan re-reads its HBM
            # accumulator every pass)
            ids = pc.reshape(-1)
            fls = fc.reshape(-1)
            v = jnp.where(cols[ids] >= 0, vals[ids], 0.0)
            c = cols[ids]
            d = (v[:, :, :, None] * (c[:, :, :, None] == jcol)) \
                .sum(axis=2).astype(dtype)
            d = jnp.where((fls == FLAG_TRANS)[:, None, None],
                          jnp.swapaxes(d, -1, -2), d)
            d = jnp.where((fls == FLAG_EYE)[:, None, None],
                          jnp.eye(l, dtype=dtype)[None], d)
        else:
            d = _slab_expand(vals, cols, pc.reshape(-1),
                             fc.reshape(-1), l, mode).astype(dtype)
        blkm = d.reshape(t, cb, l, l).transpose(0, 2, 1, 3) \
                .reshape(t * l, cb * l)
        return jax.lax.dynamic_update_slice(rz, blkm, (0, ci * cb * l))

    rz = jnp.zeros((t * l, nbp * l), dtype)
    return jax.lax.fori_loop(0, nbp // cb, chunk, rz)


def _gram_wave_impl(rz, cols, out_vals, bis, bj0s, pos, inv_n,
                    blk: int, gw: int, t: int, l: int, precision: str):
    """One z-tile's contribution for a wave of output rectangles.

    rz: (t*l, NBP*l) dense row panel. bis/bj0s: (W,) row/col BLOCK
    indices of each rectangle; pos: (W, blk, gw) output pair ids (dump
    for invalid). Accumulates into out_vals through the fixed pattern.
    """

    def one(bi, bj0, po):
        a = jax.lax.dynamic_slice(rz, (0, bi * blk * l),
                                  (t * l, blk * l))
        b = jax.lax.dynamic_slice(rz, (0, bj0 * blk * l),
                                  (t * l, gw * l))
        prod = jnp.dot(a.T, b, precision=precision,
                       preferred_element_type=jnp.float32)
        # sparsify through the fixed pattern by compare-reduce rather
        # than gather: each row has unique col indices, so the masked
        # sum selects exactly the gathered value (bit-identical), and
        # XLA fuses it into one pass over prod — measured 19 ms/rect
        # vs 51 ms for transpose+take_along_axis at N=200, L=512
        pr = prod.reshape(blk * l, gw, l)
        cxy = cols[po.reshape(-1)]                   # (blk*gw, l, K)
        kk = cxy.shape[-1]
        cr = cxy.reshape(blk, gw, l, kk).transpose(0, 2, 1, 3) \
                .reshape(blk * l, gw, kk)
        jcol = jnp.arange(l, dtype=cr.dtype)[None, None, :, None]
        mask = cr[:, :, None, :] == jcol             # (blk*l, gw, l, K)
        g = (pr[:, :, :, None] * mask).sum(axis=2)   # (blk*l, gw, K)
        g = g.reshape(blk, l, gw, kk).transpose(0, 2, 1, 3) \
             .reshape(blk * gw, l, kk)
        return jnp.where(cxy >= 0, g * inv_n, 0.0)

    newv = jax.vmap(one)(bis, bj0s, pos)
    k = cols.shape[2]
    # pattern ids are disjoint across rectangles (dump slots excepted,
    # which add exact zeros), so the scatter-add order is irrelevant
    return out_vals.at[pos.reshape(-1)].add(newv.reshape(-1, l, k))


_gram_wave = partial(jax.jit,
                     static_argnames=("blk", "gw", "t", "l",
                                      "precision"),
                     donate_argnames=("out_vals",))(_gram_wave_impl)


def consistency_sparse(vals, cols, n: int, iters: int, *,
                       seq_block: int = 16, precision: str = "highest",
                       wave: int | None = None, mesh=None,
                       max_nnz: int | None = None):
    """Run `iters` consistency iterations over the device sparse store.

    Same contract as consistency_sparse_blocked (vals/cols layout, dump
    row, mesh sharding, reference rewrite-through-pattern semantics);
    the Gram scheme is the default — MUSCLE_TPU_CONS_IMPL=blocked
    selects the old per-block densify path.
    """
    import os
    if os.environ.get("MUSCLE_TPU_CONS_IMPL") == "blocked":
        return consistency_sparse_blocked(
            vals, cols, n, iters, seq_block=seq_block,
            precision=precision, wave=wave, mesh=mesh, max_nnz=max_nnz)

    p1, l, k = vals.shape
    k_full = k
    if max_nnz is not None and max(8, -(-int(max_nnz) // 8) * 8) < k:
        k = max(8, -(-int(max_nnz) // 8) * 8)
        vals = vals[:, :, :k]
        cols = cols[:, :, :k]
    n_pairs = n * (n - 1) // 2
    dump = p1 - 1
    assert n_pairs <= dump
    blk = min(seq_block, max(1, n))
    nblk_real = -(-n // blk)
    # rectangle width (in column blocks): keep the B operand near 16k
    # lanes so each matmul is wide enough to amortize the A panel read
    group = max(1, 16384 // max(1, blk * l))
    if os.environ.get("MUSCLE_TPU_CONS_GROUP"):
        group = max(1, int(os.environ["MUSCLE_TPU_CONS_GROUP"]))
    group = min(group, nblk_real)
    gw = group * blk
    # panel width: ladder-bucketed (compile reuse across cluster runs)
    # + rectangle overhang, rounded to the densify chunk width; only
    # the densify pays for the padding — the z loop below covers REAL
    # tiles only
    # chunk width: bound each expansion chunk's (blk*cb, l, l) slab
    # stack at ~256 MB
    cb = max(1, (64 << 20) // max(1, l * l * blk))
    nbp = _nb_bucket(n, blk) + (group - 1) * blk
    nbp = -(-nbp // cb) * cb
    pid, flag = _block_maps(n, nbp, dump)

    bis, bj0s, pos = [], [], []
    for bi in range(nblk_real):
        for bj0 in range(bi, nblk_real, group):
            po = np.full((blk, gw), dump, np.int32)
            for a in range(bi * blk, min((bi + 1) * blk, n)):
                for b in range(max(bj0 * blk, a + 1),
                               min((bj0 + group) * blk, n)):
                    po[a - bi * blk, b - bj0 * blk] = \
                        pair_index(a, b, n)
            bis.append(bi)
            bj0s.append(bj0)
            pos.append(po)
    bis = np.asarray(bis, np.int32)
    bj0s = np.asarray(bj0s, np.int32)
    pos = np.stack(pos).astype(np.int32)
    n_rects = len(bis)

    bf16 = precision == "default"
    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
    if wave is None:
        # one rect per device per dispatch: the LOCAL batch width
        # changes how XLA lowers the dot (different f32 reduction
        # order), so keeping it at 1 in every configuration makes
        # single-device, 1-D-mesh and 2-D-mesh results BIT-IDENTICAL
        # (measured: W=4 vs W=1 differ by 1 ulp; W=1 vs 8-dev mesh
        # local-1 are equal). Dispatches are enqueued async, so the
        # smaller wave costs no wall-clock on chip.
        wave = n_dev
    elif mesh is not None:
        wave = -(-wave // n_dev) * n_dev
    inv_n = jnp.float32(1.0 / n)
    densify_mode = os.environ.get("MUSCLE_TPU_CONS_DENSIFY") or \
        ("scatter" if jax.default_backend() == "cpu" else "fused")

    if mesh is None:
        def run(rz, out, bi_w, bj_w, po_w):
            return _gram_wave(rz, cols, out, bi_w, bj_w, po_w, inv_n,
                              blk=blk, gw=gw, t=blk, l=l,
                              precision=precision)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        blk_sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        rep = NamedSharding(mesh, P())

        def _fixed(rz_, cols_, out_, bi_, bj_, po_, inv_n_):
            return _gram_wave_impl(rz_, cols_, out_, bi_, bj_, po_,
                                   inv_n_, blk=blk, gw=gw, t=blk, l=l,
                                   precision=precision)

        run_sh = jax.jit(_fixed, donate_argnums=(2,),
                         in_shardings=(rep, rep, rep, blk_sh, blk_sh,
                                       blk_sh, rep),
                         out_shardings=rep)

        def run(rz, out, bi_w, bj_w, po_w):
            return run_sh(rz, cols, out, bi_w, bj_w, po_w, inv_n)

    # retry at the ITERATION level (the wave donates the accumulator;
    # vals/cols are never donated, so restarting from fresh zeros is
    # always safe — see consistency_sparse_blocked)
    from ..utils import logging as mlog
    from ..utils.devretry import is_transient
    import time as _time
    dmy_po = np.full((blk, gw), dump, np.int32)
    retries = 5
    for _ in range(iters):
        for attempt in range(retries + 1):
            out = jnp.zeros_like(vals)
            try:
                for zi in range(nblk_real):
                    rz = _densify_rowpanel(
                        vals, cols,
                        jnp.asarray(pid[zi * blk:(zi + 1) * blk]),
                        jnp.asarray(flag[zi * blk:(zi + 1) * blk]),
                        t=blk, l=l, mode=densify_mode, bf16=bf16,
                        cb=cb)
                    for lo in range(0, n_rects, wave):
                        bi_w = bis[lo:lo + wave]
                        bj_w = bj0s[lo:lo + wave]
                        po_w = pos[lo:lo + wave]
                        pad = wave - len(bi_w)
                        if pad:
                            bi_w = np.concatenate(
                                [bi_w, np.zeros(pad, np.int32)])
                            bj_w = np.concatenate(
                                [bj_w, np.zeros(pad, np.int32)])
                            po_w = np.concatenate(
                                [po_w, np.stack([dmy_po] * pad)])
                        out = run(rz, out, jnp.asarray(bi_w),
                                  jnp.asarray(bj_w), jnp.asarray(po_w))
                break
            except Exception as e:
                if attempt >= retries or not is_transient(e):
                    raise
                delay = 10.0 * (2 ** attempt)
                mlog.progress(
                    "transient device error in consistency (%s); "
                    "restarting iteration %d/%d in %.0fs",
                    str(e).splitlines()[0][:120], attempt + 1, retries,
                    delay)
                _time.sleep(delay)
        vals = out
    if k < k_full:
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, k_full - k)))
    return vals
