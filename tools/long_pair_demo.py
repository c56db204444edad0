"""Demonstrate a beyond-reference-cap pairwise alignment.

The reference dies at LX*LY*5+100 > INT_MAX (~21k x 21k,
src/calcpost.cpp:8-9). This tool aligns one ~25k x 25k pair with the
blocked checkpoint/recompute path (ops/pairhmm_long.py) and validates
the machinery on a smaller control against the monolithic scan.

  python tools/long_pair_demo.py [--len 25000] [--row-block 2048]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--len", type=int, dest="length", default=25000)
    ap.add_argument("--row-block", type=int, default=2048)
    ap.add_argument("--mutate", type=float, default=0.15)
    args = ap.parse_args()

    from muscle_tpu.utils.jaxsetup import setup_jax
    setup_jax()
    import jax.numpy as jnp
    from muscle_tpu.hmm.params import HMMParams
    from muscle_tpu.ops import pairhmm, pairhmm_long
    from muscle_tpu.ops.sparse import densify_np

    pack = HMMParams.from_defaults().to_scores()
    rng = np.random.default_rng(0)

    # control: blocked == monolithic on a small pair
    l0 = 384
    base = rng.integers(0, 20, l0)
    yc = base.copy()
    mut = rng.random(l0) < args.mutate
    yc[mut] = rng.integers(0, 20, mut.sum())
    vals, cols, ea, _ = pairhmm_long.long_pair_posterior_sparse(
        base, yc, pack, row_block=128)
    margs = pairhmm.score_args(pack)
    post, ea_ref = pairhmm.batch_posteriors(
        jnp.asarray(base[None].astype(np.int32)),
        jnp.asarray(yc[None].astype(np.int32)),
        jnp.asarray([l0]), jnp.asarray([l0]), *margs)
    d = np.abs(densify_np(vals, cols, l0) - np.asarray(post[0])).max()
    print(f"control L={l0}: max|dpost| vs scan = {d:.2e} "
          f"ea {ea:.4f} vs {float(ea_ref[0]):.4f}")
    assert d < 1e-6

    # the big one
    L = args.length
    base = rng.integers(0, 20, L)
    yc = base.copy()
    mut = rng.random(L) < args.mutate
    yc[mut] = rng.integers(0, 20, mut.sum())
    t0 = time.time()
    vals, cols, ea, total = pairhmm_long.long_pair_posterior_sparse(
        base, yc, pack, row_block=args.row_block)
    dt = time.time() - t0
    nnz = int((vals > 0).sum())
    cells = 2 * L * L
    print(f"long pair {L}x{L}: {dt:.1f}s  {cells/dt/1e9:.2f} Gcells/s  "
          f"ea={ea:.4f} total={total:.1f} nnz={nnz} "
          f"(reference cap ~21k: EXCEEDED OK)")
    # sanity: posterior mass concentrated near the identity diagonal
    ridx = np.arange(L)[:, None] * np.ones((1, cols.shape[1]))
    valid = cols >= 0
    offdiag = np.abs(cols[valid] - ridx[valid])
    print(f"median |col - row| of posterior support: "
          f"{np.median(offdiag):.0f} (expect ~0)")


if __name__ == "__main__":
    main()
