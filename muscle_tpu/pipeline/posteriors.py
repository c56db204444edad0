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

from functools import partial

import numpy as np
import jax
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


def _make_batch_fn(codes_l, pack, with_mea, backend, device_batch_fn,
                   n_dev):
    """Device batch function (xb, yb, lxb, lyb) -> (post, ea)."""
    args = pairhmm.score_args(pack)
    if device_batch_fn is not None:
        return device_batch_fn
    if n_dev > 1:
        # shard the pair axis across the device mesh (pure data
        # parallel; chunk padding keeps B a mesh multiple)
        from ..parallel.mesh import make_mesh, sharded_batch_posteriors
        return sharded_batch_posteriors(make_mesh(), pack,
                                        with_mea=with_mea, backend=backend)
    if backend == "pallas":
        from ..ops import pairhmm_pallas
        assert codes_l % 128 == 0, "pallas path needs 128-padded L"
        return lambda xb, yb, lxb, lyb: \
            pairhmm_pallas.batch_posteriors_pallas(
                xb, yb, lxb, lyb, *args, with_mea=with_mea)
    return lambda xb, yb, lxb, lyb: pairhmm.batch_posteriors(
        xb, yb, lxb, lyb, *args, with_mea=with_mea)


def _chunk_iter(pairs, b):
    for lo in range(0, len(pairs), b):
        chunk = pairs[lo:lo + b]
        # pad the final chunk by repeating the first pair (same shapes ->
        # one XLA compilation); padded lanes are discarded by callers
        full = list(chunk) + [chunk[0]] * (b - len(chunk))
        xi = np.array([p[0] for p in full])
        yi = np.array([p[1] for p in full])
        yield lo, len(chunk), xi, yi


def all_pairs_posteriors(codes: np.ndarray, lens: np.ndarray,
                         pack: ScorePack, pairs: list[tuple[int, int]],
                         batch_size: int = 32, with_mea: bool = True,
                         device_batch_fn=None, backend: str = "auto",
                         return_post: bool = True):
    """Compute posteriors + EA for the given (x, y) pairs (x < y).

    Returns (post (P, L, L) float32 numpy, ea (P,) float32 numpy) where
    L is the padded length of `codes`. `backend` picks the device
    kernel: 'pallas' (TPU) or 'scan' (pure-XLA reference path).

    return_post=False skips the dense device->host posterior transfer
    entirely and returns (None, ea) — the right mode for EA-only
    callers (UCLUST verification, distance matrices, PProg scoring);
    the host link is the scarcest resource on a tunneled TPU.

    NOTE: the dense return materializes every pair posterior on host;
    prefer `all_pairs_posteriors_sparse` (device-resident fixed-K
    store) anywhere N is non-trivial.
    """
    n_pairs = len(pairs)
    if n_pairs == 0:
        L = codes.shape[1]
        post0 = np.zeros((0, L, L), np.float32) if return_post else None
        return post0, np.zeros(0, np.float32)

    if backend == "auto":
        backend = default_backend()
    import jax
    n_dev = len(jax.devices())
    b = _pick_chunk(batch_size, n_pairs, backend, n_dev)

    if not return_post:
        # EA-only: length-bucketed, nothing but scores leaves the device
        buckets = _bucketize(pairs, lens, codes.shape[1]) or \
            [(codes.shape[1], list(range(n_pairs)))]
        ea_out = np.zeros(n_pairs, np.float32)
        for lb, idxs in buckets:
            fn = _make_batch_fn(lb, pack, with_mea, backend,
                                device_batch_fn, n_dev)
            for lo in range(0, len(idxs), b):
                ch = idxs[lo:lo + b]
                full = ch + [ch[0]] * (b - len(ch))
                xi = np.array([pairs[t][0] for t in full])
                yi = np.array([pairs[t][1] for t in full])
                from ..utils.devretry import call_with_retry
                _, ea = call_with_retry(
                    fn, jnp.asarray(codes[xi, :lb]),
                    jnp.asarray(codes[yi, :lb]),
                    jnp.asarray(lens[xi]), jnp.asarray(lens[yi]))
                ea_out[np.array(ch)] = np.asarray(ea)[:len(ch)]
        return None, ea_out

    fn = _make_batch_fn(codes.shape[1], pack, with_mea, backend,
                        device_batch_fn, n_dev)
    posts = []
    eas = []
    for lo, m, xi, yi in _chunk_iter(pairs, b):
        post, ea = fn(jnp.asarray(codes[xi]), jnp.asarray(codes[yi]),
                      jnp.asarray(lens[xi]), jnp.asarray(lens[yi]))
        posts.append(np.asarray(post)[:m])
        eas.append(np.asarray(ea)[:m])
    return np.concatenate(posts), np.concatenate(eas)


def _pick_chunk(batch_size, n_pairs, backend, n_dev):
    return _rung(min(batch_size, n_pairs), _chunk_step(backend, n_dev))


# Length-bucket ladder (SURVEY Phase 2): pairs are grouped by
# round-up(max(Lx, Ly)) into these padded lengths so short pairs stop
# paying the family-max lattice. A small fixed ladder keeps the XLA/
# Pallas compile cache bounded (one kernel per ladder rung ever).
BUCKET_LADDER = (128, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096,
                 6144, 8192, 12288, 16384, 24576)


def _bucket_of(maxlen: int, cap: int) -> int:
    for b in BUCKET_LADDER:
        if b >= maxlen:
            return min(b, cap)
    return cap


def _bucketize(pairs, lens, cap: int, min_saving: float = 0.25):
    """Group pair indices by length bucket. Returns [(Lb, idx_list)] or
    None when bucketing saves < min_saving of total DP cells (not worth
    extra compilations)."""
    if len(pairs) <= 8:
        return None
    maxl = np.maximum(lens[[p[0] for p in pairs]],
                      lens[[p[1] for p in pairs]])
    buckets: dict[int, list[int]] = {}
    for k, ml in enumerate(maxl):
        buckets.setdefault(_bucket_of(int(ml), cap), []).append(k)
    if len(buckets) == 1:
        return None
    cells = sum(lb * lb * len(ix) for lb, ix in buckets.items())
    if cells > (1.0 - min_saving) * cap * cap * len(pairs):
        return None
    return sorted(buckets.items())


def _chunk_step(backend: str, n_dev: int) -> int:
    """Granularity every chunk size must honor: tile_p sublanes (8) on
    the Pallas path AND an even split across the mesh (lcm, so the
    HBM clamp below cannot break mesh divisibility — ADVICE r3)."""
    step = 8 if backend == "pallas" else 1
    if n_dev > 1:
        step = step * n_dev // np.gcd(step, n_dev)
    return step


def _rung(x: int, step: int) -> int:
    """Round x UP to step * 2^i. Chunk sizes (and with store_rows, the
    whole compile-shape space) stay on a tiny geometric ladder —
    Super4/Super7 run one MPC per cluster/shrub with ever-different
    pair counts, and every fresh shape is a fresh ~10 s XLA compile on
    the chip (the round-4 super5 profile showed compile time, not
    work, dominating small clusters)."""
    r = step
    while r < x:
        r *= 2
    return r


def _floor_rung(x: int, step: int) -> int:
    r = step
    while r * 2 <= x:
        r *= 2
    return r


def store_rows(n_pairs: int) -> int:
    """Bucketed pair-axis size for the device sparse store (>= one
    dump row beyond n_pairs; 1/4-step geometric rungs cap both memory
    waste and the number of distinct store shapes ever compiled)."""
    cap = 16
    while cap < n_pairs + 1:
        cap += max(16, cap // 4)
    return cap


def _clamp_chunk_by_len(b: int, lb: int, step: int = 8) -> int:
    """Cap the pair chunk so the fwd+bwd (Lx, B, Ly) lattices plus the
    posterior stay within ~8 GB of HBM at bucket length lb; the result
    stays on the step * 2^i rung ladder (compile-shape discipline)."""
    cap = max(step, int((8 << 30) // max(1, 12 * lb * lb)))
    return max(step, min(b, _floor_rung(cap, step)))


@partial(jax.jit, donate_argnames=("sv", "sc", "se", "mx"),
         static_argnames=("kk",))
def _absorb(sv, sc, se, mx, post, ea, idx, kk):
    """Sparsify one posterior chunk into the device store (module-level
    jit: per-call jit objects leak one compiled executable per
    Super4/Super7 cluster). Duplicate idx entries (final-chunk padding
    repeats a real pair) write identical data, so scatter order is
    irrelevant."""
    from ..ops import sparse as sp
    vals, cols, nnz = sp.sparsify(post, kk)
    lb = post.shape[1]
    l_full = sv.shape[1]
    if lb < l_full:
        vals = jnp.pad(vals, ((0, 0), (0, l_full - lb), (0, 0)))
        cols = jnp.pad(cols, ((0, 0), (0, l_full - lb), (0, 0)),
                       constant_values=-1)
    sv = sv.at[idx].set(vals)
    sc = sc.at[idx].set(cols)
    se = se.at[idx].set(ea)
    return sv, sc, se, jnp.maximum(mx, nnz)


def _sparse_store_loop(make_fn, chunk_args_fn, pairs, lens, b, k,
                       l_full, bucket=True, step=8, sync=True):
    """Shared device loop: run batches (length-bucketed), sparsify on
    device, scatter into a device-resident (P+1, L, K) store whose last
    row is the all-zero dump slot. Returns
    (vals_dev, cols_dev, ea_np, max_nnz_int); with sync=False the ea
    and max_nnz stay DEVICE arrays and nothing blocks — the PProg
    prefetch pipeline uses this to enqueue the next join's pair grid
    behind the current join's host-side traceback.

    make_fn(Lb) builds the device batch fn for bucket length Lb;
    chunk_args_fn(xi, yi, Lb) slices/pads the encoded inputs.
    """
    n_pairs = len(pairs)
    # pair axis bucketed (store_rows): rows beyond n_pairs stay
    # all-zero — the last one is the consistency dump slot, the rest
    # are shape padding so Super4/Super7's per-cluster stores reuse
    # one compiled shape instead of compiling per pair count
    store_v = jnp.zeros((store_rows(n_pairs), l_full, k), jnp.float32)
    store_c = jnp.full((store_rows(n_pairs), l_full, k), -1, jnp.int32)
    store_ea = jnp.zeros((n_pairs,), jnp.float32)
    max_nnz = jnp.zeros((), jnp.int32)
    absorb = _absorb

    buckets = _bucketize(pairs, lens, l_full) if bucket else None
    if buckets is None:
        buckets = [(l_full, list(range(n_pairs)))]
    for lb, idxs in buckets:
        fn = make_fn(lb)
        b = _clamp_chunk_by_len(b, lb, step)
        for lo in range(0, len(idxs), b):
            ch = idxs[lo:lo + b]
            full = ch + [ch[0]] * (b - len(ch))
            xi = np.array([pairs[t][0] for t in full])
            yi = np.array([pairs[t][1] for t in full])
            from ..utils.devretry import call_with_retry, is_transient
            post, ea = call_with_retry(fn, *chunk_args_fn(xi, yi, lb))
            idxj = jnp.asarray(np.array(full, np.int32))
            # absorb donates the store — retry a transient ONLY while
            # the donated buffers are still live (a compile-phase
            # tunnel drop, e.g. "remote_compile: response body closed",
            # fails before donation consumes them; observed killing a
            # 4.5k-seq run at PProg join 131/158)
            import time as _t
            for attempt in range(4):
                try:
                    store_v, store_c, store_ea, max_nnz = absorb(
                        store_v, store_c, store_ea, max_nnz, post, ea,
                        idxj, kk=k)
                    break
                except Exception as e:
                    if (not is_transient(e) or attempt == 3
                            or store_v.is_deleted()):
                        raise
                    _t.sleep(10.0 * (2 ** attempt))
    if not sync:
        return store_v, store_c, store_ea, max_nnz
    ea_np = np.asarray(store_ea)
    return store_v, store_c, ea_np, int(max_nnz)


def all_pairs_posteriors_sparse(codes: np.ndarray, lens: np.ndarray,
                                pack: ScorePack,
                                pairs: list[tuple[int, int]],
                                batch_size: int = 32, k: int = 32,
                                device_batch_fn=None,
                                backend: str = "auto",
                                bucket: bool = True,
                                sync: bool = True):
    """Device-resident sparse variant of all_pairs_posteriors.

    Returns (vals (P+1, L, K) device, cols device, ea (P,) numpy,
    max_nnz). The store's trailing row is the all-zero dump slot the
    blocked consistency expects. max_nnz > K signals (rare) truncation
    of rows with more than K entries >= 0.01 — callers should log it.
    sync=False keeps ea/max_nnz as device arrays and returns without
    blocking (the long-pair path still syncs — it is host-driven).
    """
    if backend == "auto":
        backend = default_backend()
    if codes.shape[1] > LONG_PAIR_THRESHOLD:
        if not sync:
            # callers using sync=False for pipelining (PProg prefetch)
            # silently lose the overlap here — the long-pair path is
            # host-driven and fully synchronous (ADVICE r4)
            from ..utils.logging import log_once
            log_once("long-pair sparse store is host-driven: async "
                     "dispatch degrades to synchronous (L=%d > %d)"
                     % (codes.shape[1], LONG_PAIR_THRESHOLD))
        return _long_pairs_sparse(codes, lens, pack, pairs, k)
    import jax
    n_dev = len(jax.devices())
    b = _pick_chunk(batch_size, len(pairs), backend, n_dev)
    cj = jnp.asarray(codes)
    lj = jnp.asarray(lens)

    def make_fn(lb):
        return _make_batch_fn(lb, pack, True, backend, device_batch_fn,
                              n_dev)

    def chunk_args(xi, yi, lb):
        return cj[xi, :lb], cj[yi, :lb], lj[xi], lj[yi]

    return _sparse_store_loop(make_fn, chunk_args, pairs, lens, b, k,
                              codes.shape[1], bucket=bucket,
                              step=_chunk_step(backend, n_dev),
                              sync=sync)


# beyond this padded length the batched kernels' (Lx, B, Ly) lattices
# stop fitting; switch to the per-pair blocked checkpoint/recompute
# path (ops/pairhmm_long.py) which removes the reference's ~21k cap
LONG_PAIR_THRESHOLD = 8192


# Pallas long-path limits: VMEM scratch at the minimum tile (sublane
# 8) caps the LANE axis at ~9.9k (single source of truth:
# ops.pairhmm_pallas.FUSED_MAX_LY), and the (Lx, 8, Ly) f32 fwd-M +
# posterior lattices cap total cells in HBM. Beyond either the
# O(sqrt) checkpoint/recompute scan path takes over (no length cap).
_LONG_PALLAS_MAX_LY = 9856  # == ops.pairhmm_pallas.FUSED_MAX_LY (asserted in tests)
_LONG_PALLAS_CELL_BUDGET = 160 * 1024 * 1024


def _long_rung(v: int) -> int:
    """Padding rung for the Pallas long path: the ladder below the
    batch threshold, 512-multiples above it (the ladder's next rung,
    12288, exceeds the tile_p=8 VMEM lane cap; long pairs are rare
    enough that finer rungs cost few compiles)."""
    if v <= LONG_PAIR_THRESHOLD:
        return _bucket_of(v, LONG_PAIR_THRESHOLD)
    return round_up(v, 512)


def _long_pairs_pallas_batch(codes, lens, pack, batch, k,
                             transpose_post=False):
    """Up to 8 long pairs through the regular fused Pallas kernels.

    The batched path refuses L > LONG_PAIR_THRESHOLD only because a
    (Lx, B, Ly) lattice at production batch sizes blows HBM — at the
    minimum tile (B=8, Mosaic's f32 sublane) pairs up to ~12.6k run on
    the optimized kernel (the reference caps at ~21k,
    src/calcpost.cpp:8-9). Real long pairs fill the 8 lanes; only the
    final remainder replicates. Rectangular ladder padding bounds the
    compile-shape count. Returns [(vals, cols, ea, nnz)] per pair."""
    import jax
    from ..ops import pairhmm
    from ..ops.pairhmm_pallas import batch_posteriors_pallas
    from ..ops import sparse as sp

    args = pairhmm.score_args(pack)
    full = batch + [batch[0]] * (8 - len(batch))
    px = max(_long_rung(int(lens[x])) for x, _ in full)
    py = max(_long_rung(int(lens[y])) for _, y in full)
    wild = args[0].shape[0] - 1
    xb = np.full((8, px), wild, np.int32)
    yb = np.full((8, py), wild, np.int32)
    lx = np.empty(8, np.int32)
    ly = np.empty(8, np.int32)
    for j, (x, y) in enumerate(full):
        lx[j] = lens[x]
        ly[j] = lens[y]
        xb[j, :lx[j]] = codes[x][:lx[j]]
        yb[j, :ly[j]] = codes[y][:ly[j]]
    post, ea = batch_posteriors_pallas(
        jnp.asarray(xb), jnp.asarray(yb),
        jnp.asarray(lx), jnp.asarray(ly), *args, tile_p=8)
    if transpose_post:
        # pair was computed with x/y swapped to fit the lane cap; the
        # caller's store is row-major in the ORIGINAL x
        post = jax.jit(lambda p: p.transpose(0, 2, 1))(post)
    vals, cols, nnz = jax.jit(sp.sparsify, static_argnames=("k",))(
        post, k=k)
    vals = np.asarray(vals)
    cols = np.asarray(cols)
    ea = np.asarray(ea)
    nnz = int(np.asarray(nnz))
    return [(vals[j], cols[j], float(ea[j]), nnz)
            for j in range(len(batch))]


# Y-striped kernel limits (ops/pairhmm_striped.py): stripes of
# _STRIPE_W lanes remove the VMEM lane cap entirely; the remaining
# bound is HBM for the per-stripe M/posterior lattices + boundary
# arrays (~2-3 GB transient at 25k x 25k, tile_p=8).
_STRIPE_W = 2048
_STRIPED_CELL_BUDGET = 640 * 1024 * 1024   # 25k x 25k


def _long_pairs_striped_batch(codes, lens, pack, batch, k):
    """Up to 8 beyond-the-lane-cap pairs through the Y-striped fused
    kernels (ops/pairhmm_striped.py) — the band the reference serves
    from its flat kernel at ~21k max (src/fwdflat3.cpp:17-18) and we
    previously served only via the slow checkpoint scan."""
    import jax
    from ..ops import pairhmm
    from ..ops.pairhmm_striped import striped_posteriors_sparse

    args = pairhmm.score_args(pack)
    full = batch + [batch[0]] * (8 - len(batch))
    px = max(_long_rung(int(lens[x])) for x, _ in full)
    py = max(round_up(int(lens[y]), _STRIPE_W) for _, y in full)
    wild = args[0].shape[0] - 1
    xb = np.full((8, px), wild, np.int32)
    yb = np.full((8, py), wild, np.int32)
    lx = np.empty(8, np.int32)
    ly = np.empty(8, np.int32)
    for j, (x, y) in enumerate(full):
        lx[j] = lens[x]
        ly[j] = lens[y]
        xb[j, :lx[j]] = codes[x][:lx[j]]
        yb[j, :ly[j]] = codes[y][:ly[j]]
    vals, cols, ea, nnz = striped_posteriors_sparse(
        jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(lx),
        jnp.asarray(ly), *args, k=k, stripe_w=_STRIPE_W, tile_p=8)
    vals = np.asarray(vals)
    cols = np.asarray(cols)
    ea = np.asarray(ea)
    nnz = int(np.asarray(nnz))
    return [(vals[j], cols[j], float(ea[j]), nnz)
            for j in range(len(batch))]


def _long_pairs_sparse(codes, lens, pack, pairs, k):
    """Per-pair long-sequence posterior loop (host store)."""
    from ..ops.pairhmm_long import long_pair_posterior_sparse
    l = codes.shape[1]
    n_pairs = len(pairs)
    sv = np.zeros((store_rows(n_pairs), l, k), np.float32)
    sc = np.full((store_rows(n_pairs), l, k), -1, np.int32)
    ea = np.zeros(n_pairs, np.float32)
    max_nnz = 0
    use_pallas = default_backend() == "pallas"

    def fits(x, y):
        py = round_up(int(lens[y]), 128)
        return (py <= _LONG_PALLAS_MAX_LY and
                round_up(int(lens[x]), 128) * py
                <= _LONG_PALLAS_CELL_BUDGET)

    def fits_striped(x, y):
        return (round_up(int(lens[x]), 128) *
                round_up(int(lens[y]), _STRIPE_W)
                <= _STRIPED_CELL_BUDGET)

    # group Pallas-eligible pairs by their (px, py) ladder rectangle so
    # batches share one compile shape and fill the 8 lanes with real
    # work. The VMEM lane cap binds only the Y axis, so pairs whose
    # SHORTER side exceeds it are computed TRANSPOSED (x<->y swapped;
    # the posterior transposes back on device, EA is symmetric) —
    # extending the fast path to every pair with min(Lx, Ly) <= cap
    # (e.g. 21k x 9.8k; the reference binary itself dies past
    # Lx*Ly*5 > INT_MAX, src/calcpost.cpp:8-9)
    from collections import defaultdict
    groups: dict[tuple[int, int, bool], list[int]] = defaultdict(list)
    striped_groups: dict[tuple[int, int], list[int]] = defaultdict(list)
    scan_idx = []
    for i, (x, y) in enumerate(pairs):
        if use_pallas and fits(x, y):
            groups[(_long_rung(int(lens[x])), _long_rung(int(lens[y])),
                    False)].append(i)
        elif use_pallas and fits(y, x):
            groups[(_long_rung(int(lens[y])), _long_rung(int(lens[x])),
                    True)].append(i)
        elif use_pallas and fits_striped(x, y):
            # both sides beyond the lane cap: Y-striped kernels
            striped_groups[(_long_rung(int(lens[x])),
                            round_up(int(lens[y]), _STRIPE_W))].append(i)
        else:
            scan_idx.append(i)

    for (px, py, swapped), idxs in groups.items():
        for lo in range(0, len(idxs), 8):
            ch = idxs[lo:lo + 8]
            batch = [pairs[t][::-1] if swapped else pairs[t]
                     for t in ch]
            results = _long_pairs_pallas_batch(
                codes, lens, pack, batch, k, transpose_post=swapped)
            for i, (vals, cols, ea_p, nnz) in zip(ch, results):
                x = pairs[i][0]
                sv[i, :lens[x]] = vals[:lens[x]]
                sc[i, :lens[x]] = cols[:lens[x]]
                ea[i] = ea_p
                max_nnz = max(max_nnz, nnz)

    for (px, py), idxs in striped_groups.items():
        for lo in range(0, len(idxs), 8):
            ch = idxs[lo:lo + 8]
            batch = [pairs[t] for t in ch]
            results = _long_pairs_striped_batch(codes, lens, pack,
                                                batch, k)
            for i, (vals, cols, ea_p, nnz) in zip(ch, results):
                x = pairs[i][0]
                sv[i, :lens[x]] = vals[:lens[x]]
                sc[i, :lens[x]] = cols[:lens[x]]
                ea[i] = ea_p
                max_nnz = max(max_nnz, nnz)

    for i in scan_idx:
        x, y = pairs[i]
        vals, cols, ea_p, _tot = long_pair_posterior_sparse(
            codes[x][:lens[x]], codes[y][:lens[y]], pack, k=k,
            row_block=2048)
        sv[i, :lens[x]] = vals
        sc[i, :lens[x]] = cols
        ea[i] = ea_p
        # note: nnz beyond K is invisible to the blocked path (top-K
        # per row); report the stored max
        max_nnz = max(max_nnz, int((vals > 0).sum(axis=1).max()))
    return jnp.asarray(sv), jnp.asarray(sc), ea, max_nnz


def ensemble_pairs_posteriors_sparse(codes: np.ndarray, lens: np.ndarray,
                                     packs, pairs: list[tuple[int, int]],
                                     batch_size: int = 256, k: int = 32,
                                     backend: str = "auto",
                                     with_mea: bool = True):
    """Pair grids of R differently-parameterized HMMs in ONE device
    stream (ensemble replicate batching, SURVEY §7: replicates are
    embarrassingly parallel — run them as the outer batch axis).

    packs: R ScorePacks (e.g. one per perturbation seed). Every (rep,
    pair) combination becomes one batch lane carrying its own score
    tables, so chunks mix replicates and the device stays saturated even
    when one replicate's pair count is small.

    Returns (vals (R, P+1, L, K) device, cols device, ea (R, P) numpy,
    max_nnz); each replicate's trailing row is its consistency dump
    slot.
    """
    import jax
    from ..ops import sparse as sp

    if backend == "auto":
        backend = default_backend()
    r_count = len(packs)
    n_pairs = len(pairs)
    l_full = codes.shape[1]
    if l_full > LONG_PAIR_THRESHOLD:
        raise ValueError("ensemble batching requires L <= %d"
                         % LONG_PAIR_THRESHOLD)

    # stacked per-replicate tables (device-resident once)
    match_s = jnp.asarray(np.stack([p.match for p in packs]))
    insert_s = jnp.asarray(np.stack([p.insert for p in packs]))
    start_s = jnp.asarray(np.stack([p.start for p in packs]))
    tv_s = jnp.stack([pairhmm._trans_vec(p) for p in packs])

    if backend == "pallas":
        from ..ops.pairhmm_pallas import batch_posteriors_pallas_multi \
            as multi_fn
    else:
        multi_fn = pairhmm.batch_posteriors_multi

    n_dev = len(jax.devices())
    if n_dev > 1:
        # shard the (rep, pair) batch axis across the mesh — every array
        # argument carries batch as its leading axis (ADVICE r2)
        from jax.sharding import NamedSharding
        from ..parallel.mesh import batch_spec, make_mesh
        mesh = make_mesh()
        dsh = NamedSharding(mesh, batch_spec(mesh))
        base_fn = multi_fn
        mea_flag = with_mea

        @partial(jax.jit, in_shardings=(dsh,) * 8,
                 out_shardings=(dsh, dsh))
        def _sharded(xb, yb, lxb, lyb, mb, ib, sb, tb):
            return base_fn(xb, yb, lxb, lyb, mb, ib, sb, tb,
                           with_mea=mea_flag)

        def multi_fn(xb, yb, lxb, lyb, mb, ib, sb, tb, with_mea=True):
            return _sharded(xb, yb, lxb, lyb, mb, ib, sb, tb)

    cj = jnp.asarray(codes)
    lj = jnp.asarray(lens)

    store_v = jnp.zeros((r_count, store_rows(n_pairs), l_full, k),
                        jnp.float32)
    store_c = jnp.full((r_count, store_rows(n_pairs), l_full, k), -1,
                       jnp.int32)
    store_ea = jnp.zeros((r_count, n_pairs), jnp.float32)
    max_nnz = jnp.zeros((), jnp.int32)

    @partial(jax.jit, donate_argnames=("sv", "sc", "se", "mx"),
             static_argnames=("kk",))
    def absorb(sv, sc, se, mx, post, ea, ri, pi, kk):
        vals, cols, nnz = sp.sparsify(post, kk)
        lb = post.shape[1]
        if lb < l_full:
            vals = jnp.pad(vals, ((0, 0), (0, l_full - lb), (0, 0)))
            cols = jnp.pad(cols, ((0, 0), (0, l_full - lb), (0, 0)),
                           constant_values=-1)
        sv = sv.at[ri, pi].set(vals)
        sc = sc.at[ri, pi].set(cols)
        se = se.at[ri, pi].set(ea)
        return sv, sc, se, jnp.maximum(mx, nnz)

    # entries (rep, pair_index); same lengths per replicate, so bucket
    # by pair then replicate-major within a bucket
    buckets = _bucketize(pairs, lens, l_full) or \
        [(l_full, list(range(n_pairs)))]
    b0 = _pick_chunk(batch_size, r_count * n_pairs, backend, n_dev)
    for lb, idxs in buckets:
        entries = [(r, pi) for r in range(r_count) for pi in idxs]
        b = _clamp_chunk_by_len(b0, lb, _chunk_step(backend, n_dev))
        for lo in range(0, len(entries), b):
            ch = entries[lo:lo + b]
            full = ch + [ch[0]] * (b - len(ch))
            ri = np.array([t[0] for t in full], np.int32)
            pi = np.array([t[1] for t in full], np.int32)
            xi = np.array([pairs[t][0] for t in pi])
            yi = np.array([pairs[t][1] for t in pi])
            rij = jnp.asarray(ri)
            from ..utils.devretry import call_with_retry
            post, ea = call_with_retry(
                multi_fn, cj[xi, :lb], cj[yi, :lb], lj[xi], lj[yi],
                match_s[rij], insert_s[rij], start_s[rij], tv_s[rij],
                with_mea=with_mea)
            store_v, store_c, store_ea, max_nnz = absorb(
                store_v, store_c, store_ea, max_nnz, post, ea,
                rij, jnp.asarray(pi), kk=k)
    return store_v, store_c, np.asarray(store_ea), int(max_nnz)


# Dense small-family threshold: the (n_pad*L)^2 block matrix of the
# one-dispatch consistency must fit HBM (~1 GB per matrix at 16384^2
# f32, x3 live)
SMALL_DENSE_NL = 16384


def _small_cons_jit():
    """Module-level jit (per-call jit objects each cache their own
    compiled TPU executable — one fresh object per Super4 cluster
    exhausted device program memory after ~60 clusters)."""
    import jax
    from functools import partial as _p
    from ..ops import consistency as cons
    from ..ops import sparse as sp

    @_p(jax.jit, static_argnames=("n_pad", "iters", "kk", "fast"))
    def _fn(post, xi, yi, n_real, p_real, n_pad, iters, kk, fast):
        l = post.shape[1]
        t = jnp.zeros((n_pad, n_pad, l, l), jnp.float32)
        t = t.at[xi, yi].set(post)
        t = t.at[yi, xi].set(jnp.swapaxes(post, -1, -2))
        mask = cons.sparsity_mask(t)
        for _ in range(iters):
            t = cons.consistency_iter(t, mask, n_real, fast=fast)
        out = t[xi, yi]
        vals, cols_, nnz = sp.sparsify(out, kk)
        lane = jnp.arange(vals.shape[0])[:, None, None]
        vals = jnp.where(lane < p_real, vals, 0.0)
        cols_ = jnp.where(lane < p_real, cols_, -1)
        return vals, cols_, nnz

    return _fn


_cons_sparsify_fn = None


def _cons_sparsify(post, xi, yi, n_real, p_real, n_pad, iters, kk,
                   fast):
    global _cons_sparsify_fn
    if _cons_sparsify_fn is None:
        _cons_sparsify_fn = _small_cons_jit()
    return _cons_sparsify_fn(post, xi, yi, n_real, p_real,
                             n_pad=n_pad, iters=iters, kk=kk, fast=fast)


def small_family_store(codes_or_profiles, lens, pack_or_mega, pairs,
                       n: int, k: int, iters: int, precision: str,
                       mega=None, backend: str = "auto",
                       batch_fn=None):
    """ONE-DISPATCH pair stage + dense consistency + sparsify for small
    families (n*L <= SMALL_DENSE_NL).

    Super4/Super7 run MPC once per cluster/shrub; at cluster sizes the
    blocked-sparse machinery's per-wave dispatches and per-shape
    compiles dominate (measured ~9 s consistency + ~5 s fetch per
    <=33-seq cluster on the tunneled chip). Here the whole cluster
    becomes: one batched posterior call -> (n, n, L, L) tensor -> 2
    dense MXU consistency iterations -> device sparsify — a handful of
    dispatches on a few compile shapes shared by every cluster.

    Returns (vals (P2, L, K) device, cols, ea (P,) np, max_nnz) in the
    sparse-store contract (rows beyond P empty; last row is a zero
    dump slot).
    """
    import jax
    from ..ops import consistency as cons
    from ..ops import sparse as sp

    n_pairs = len(pairs)
    l = codes_or_profiles.shape[1]
    if backend == "auto":
        backend = default_backend()
    # the mega chunk fn shards its pair axis over the mesh
    # (_make_mega_chunk_fn) — the rung must honor mesh divisibility;
    # the letter fn below is built single-device (n_dev=1)
    n_dev = len(jax.devices()) if mega is not None else 1
    b = _rung(n_pairs, _chunk_step(backend, n_dev))
    full = list(pairs) + [pairs[0]] * (b - n_pairs)
    xi = np.array([p[0] for p in full])
    yi = np.array([p[1] for p in full])
    if batch_fn is None:
        if mega is not None:
            run_chunk = _make_mega_chunk_fn(mega, pack_or_mega, True,
                                            backend)
            cj = jnp.asarray(codes_or_profiles)
            lj = jnp.asarray(lens)
            post, ea = run_chunk(cj[xi], cj[yi], lj[xi], lj[yi])
        else:
            fn = _make_batch_fn(l, pack_or_mega, True, backend, None, 1)
            cj = jnp.asarray(codes_or_profiles)
            lj = jnp.asarray(lens)
            from ..utils.devretry import call_with_retry
            post, ea = call_with_retry(fn, cj[xi], cj[yi], lj[xi],
                                       lj[yi])
    else:
        post, ea = batch_fn(xi, yi)

    n_pad = _rung(n, 4)
    xi_j = jnp.asarray(xi.astype(np.int32))
    yi_j = jnp.asarray(yi.astype(np.int32))
    sv, sc, nnz = _cons_sparsify(post, xi_j, yi_j, jnp.float32(n),
                                 jnp.int32(n_pairs), n_pad, iters, k,
                                 precision == "default")
    if sv.shape[0] == n_pairs:
        # guarantee a trailing all-zero dump row for device joiners
        sv = jnp.pad(sv, ((0, 8), (0, 0), (0, 0)))
        sc = jnp.pad(sc, ((0, 8), (0, 0), (0, 0)), constant_values=-1)
    return sv, sc, np.asarray(ea)[:n_pairs], int(nnz)


def fetch_store_csr(store_v, store_c, pad_to: int):
    """Fetch a device sparse store as a packed CSR stream.

    Returns (flat_vals (total,) f32, flat_cols (total,) int32,
    nnz (P_rows, L) int64) on host. Valid slots arrive in row-major
    packed order, so per-pair CSR views are just offset slices (callers
    compute rowptr from the nnz counts). Only real entries cross the
    host link — the fixed-K padding never leaves the device.
    """
    import time as _time
    from ..ops import sparse as sp
    from ..utils import logging as mlog
    t0 = _time.perf_counter()
    ctype = jnp.int16 if pad_to < (1 << 15) else jnp.int32
    rows, l, kk = store_v.shape
    # slab EVERYTHING (count + pack + fetch) for big stores: the
    # whole-store nonzero/gather/count workspace OOMed a 16 GB chip at
    # rdrp-cluster scale (34k rows x 512 x 24 right after the
    # consistency peak)
    slab = rows if rows * l * kk <= (192 << 20) else 8192
    parts_v, parts_c, parts_n = [], [], []
    t_count = 0.0
    t_pack = 0.0
    t_fetch = 0.0
    for lo in range(0, rows, slab):
        hi = min(lo + slab, rows)
        tc0 = _time.perf_counter()
        nnz_dev, _ = sp.store_nnz(store_c[lo:hi])
        nnz_s = np.asarray(nnz_dev.astype(jnp.uint8)).astype(np.int64)
        sub_total = int(nnz_s.sum())
        parts_n.append(nnz_s)
        tp = _time.perf_counter()
        t_count += tp - tc0
        fv, fc = sp.pack_store(store_v[lo:hi], store_c[lo:hi],
                               sp.pack_cap(sub_total), ctype)
        fv.block_until_ready()
        tf = _time.perf_counter()
        t_pack += tf - tp
        parts_v.append(np.asarray(fv)[:sub_total])
        parts_c.append(np.asarray(fc)[:sub_total])
        t_fetch += _time.perf_counter() - tf
    flat_v = (parts_v[0] if len(parts_v) == 1
              else np.concatenate(parts_v))
    flat_c = (parts_c[0] if len(parts_c) == 1
              else np.concatenate(parts_c)).astype(np.int32)
    nnz_np = (parts_n[0] if len(parts_n) == 1
              else np.concatenate(parts_n))
    total = int(nnz_np.sum())
    mlog.log("fetch_csr: nnz=%d (%.1f MB) count %.2fs pack %.2fs "
             "fetch %.2fs", total, total * 6 / 1e6, t_count, t_pack,
             t_fetch)
    return flat_v, flat_c, nnz_np


def csr_views(flat_v, flat_c, nnz_np, n_pairs: int, lx_of):
    """Per-pair (vals, cols, rowptr) CSR views into the packed stream
    (zero copies beyond the rowptr rebase). lx_of(i) gives pair i's
    row count."""
    l = nnz_np.shape[1]
    big_rowptr = np.zeros(n_pairs * l + 1, np.int64)
    np.cumsum(nnz_np[:n_pairs].ravel(), out=big_rowptr[1:])
    out = []
    for i in range(n_pairs):
        lx = lx_of(i)
        base = big_rowptr[i * l]
        end = big_rowptr[i * l + lx]
        out.append((flat_v[base:end], flat_c[base:end],
                    big_rowptr[i * l:i * l + lx + 1] - base))
    return out


def posts_from_store(store_v, store_c, pairs, lens, pad_to: int):
    """Fetch a device sparse store into a host PairPosteriors (CSR
    views into one flat buffer — zero copies beyond the wire fetch)."""
    from .progressive import PairPosteriors
    flat_v, flat_c, nnz_np = fetch_store_csr(store_v, store_c, pad_to)
    views = csr_views(flat_v, flat_c, nnz_np, len(pairs),
                      lambda i: int(lens[pairs[i][0]]))
    posts = PairPosteriors()
    for (x, y), (v, c, r) in zip(pairs, views):
        posts.set_csr(x, y, v, c, r, int(lens[y]))
    return posts


def ea_dist_matrix(n: int, pairs: list[tuple[int, int]], ea: np.ndarray
                   ) -> np.ndarray:
    d = np.zeros((n, n), dtype=np.float32)
    for (x, y), v in zip(pairs, ea):
        d[x, y] = d[y, x] = v
    return d


_MEGA_FN_CACHE: dict = {}


def _make_mega_chunk_fn(mega, pack, with_mea, backend):
    """Jitted (px, py, lx, ly) -> (post, ea) for mega profiles.

    Memoized on the (mega, pack) identities: Super7 runs one MPC per
    shrub and a fresh jit per shrub leaks one compiled executable each
    (same failure mode as the per-cluster absorb jits). The cache
    intentionally holds the mega/pack objects alive so ids stay valid.
    """
    import jax
    key = (id(mega), id(pack), with_mea, backend)
    hit = _MEGA_FN_CACHE.get(key)
    if hit is not None:
        return hit[0]
    if len(_MEGA_FN_CACHE) >= 8:
        _MEGA_FN_CACHE.clear()
    from ..ops import pairhmm
    from ..ops.emissions import (mega_emission_matrix, mega_feature_arrays,
                                 mega_insert_scores)

    weights, log_probs, log_prob_mx = mega_feature_arrays(mega)
    start = jnp.asarray(pack.start)
    tv = pairhmm._trans_vec(pack)

    if backend == "pallas":
        from ..ops.pairhmm_pallas import batch_posteriors_pallas_emissions \
            as emis_fn
    else:
        emis_fn = pairhmm.batch_posteriors_emissions

    def _chunk(px, py, lx, ly):
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

    n_dev = len(jax.devices())
    if n_dev > 1:
        # structure alignment shards its pair grid like the letter path
        # (pure data parallel over the mesh; the small mega tables are
        # replicated closures)
        from jax.sharding import NamedSharding
        from ..parallel.mesh import batch_spec, make_mesh
        mesh = make_mesh()
        dsh = NamedSharding(mesh, batch_spec(mesh))
        fn = jax.jit(_chunk, in_shardings=(dsh,) * 4,
                     out_shardings=(dsh, dsh))
    else:
        fn = jax.jit(_chunk)
    _MEGA_FN_CACHE[key] = (fn, mega, pack)
    return fn


def all_pairs_posteriors_mega(profiles: np.ndarray, lens: np.ndarray,
                              mega, pack: ScorePack,
                              pairs: list[tuple[int, int]],
                              batch_size: int = 16, with_mea: bool = True,
                              backend: str = "auto",
                              return_post: bool = True):
    """Muscle-3D variant: posteriors from feature-profile emissions.

    profiles: (N, L, F) uint8 padded feature letters; transitions come
    from the standard HMM params (`pack`), emissions from the mega
    tables (reference: MPCFlat_mega overriding only Fwd/Bwd emissions,
    src/mpcflat.h:63-66 + src/fwdflat_mega.cpp).
    """
    n_pairs = len(pairs)
    L = profiles.shape[1]
    if n_pairs == 0:
        post0 = np.zeros((0, L, L), np.float32) if return_post else None
        return post0, np.zeros(0, np.float32)

    if backend == "auto":
        backend = default_backend()
    import jax
    run_chunk = _make_mega_chunk_fn(mega, pack, with_mea, backend)
    b = _pick_chunk(batch_size, n_pairs, backend, len(jax.devices()))
    posts = []
    eas = []
    for lo, m, xi, yi in _chunk_iter(pairs, b):
        post, ea = run_chunk(jnp.asarray(profiles[xi]),
                             jnp.asarray(profiles[yi]),
                             jnp.asarray(lens[xi]), jnp.asarray(lens[yi]))
        if return_post:
            posts.append(np.asarray(post)[:m])
        eas.append(np.asarray(ea)[:m])
    return (np.concatenate(posts) if return_post else None), \
        np.concatenate(eas)


def all_pairs_posteriors_mega_sparse(profiles: np.ndarray,
                                     lens: np.ndarray, mega,
                                     pack: ScorePack,
                                     pairs: list[tuple[int, int]],
                                     batch_size: int = 16, k: int = 32,
                                     backend: str = "auto",
                                     bucket: bool = True,
                                     sync: bool = True):
    """Sparse device-resident variant of all_pairs_posteriors_mega."""
    if backend == "auto":
        backend = default_backend()
    import jax
    n_dev = len(jax.devices())
    run_chunk = _make_mega_chunk_fn(mega, pack, True, backend)
    b = _pick_chunk(batch_size, len(pairs), backend, n_dev)
    pj = jnp.asarray(profiles)
    lj = jnp.asarray(lens)

    def make_fn(lb):
        return run_chunk

    def chunk_args(xi, yi, lb):
        return pj[xi, :lb], pj[yi, :lb], lj[xi], lj[yi]

    return _sparse_store_loop(make_fn, chunk_args, pairs, lens, b, k,
                              profiles.shape[1], bucket=bucket,
                              step=_chunk_step(backend, n_dev),
                              sync=sync)
