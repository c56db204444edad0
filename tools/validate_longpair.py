"""On-chip validation of the long-pair router's Pallas paths.

Covers the round-4 orientation swap (one side beyond the ~9.9k lane
cap -> transposed fast path) AND the Y-striped kernels
(ops/pairhmm_striped.py; BOTH sides beyond the cap, e.g. 16000 16000
— the 10k-21k band the reference serves from its flat kernel).  The
oracle is the no-cap checkpoint-scan path (ops/pairhmm_long).  Also
times both, giving the measured band throughput the VERDICT asked for.

Usage: python tools/validate_longpair.py [lx ly]  (defaults 4500 11500;
       striped band: 16000 16000)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muscle_tpu.hmm.params import HMMParams
from muscle_tpu.utils.jaxsetup import setup_jax

setup_jax()

from muscle_tpu.ops.pairhmm_long import long_pair_posterior_sparse
from muscle_tpu.pipeline import posteriors as post_mod


def main():
    lx = int(sys.argv[1]) if len(sys.argv) > 1 else 4500
    ly = int(sys.argv[2]) if len(sys.argv) > 2 else 11500
    pack = HMMParams.from_defaults().to_scores()
    rng = np.random.default_rng(0)
    l_pad = post_mod.round_up(max(lx, ly), 128)
    codes = np.full((2, l_pad), 20, np.int32)
    codes[0, :lx] = rng.integers(0, 20, size=lx)
    codes[1, :ly] = rng.integers(0, 20, size=ly)
    lens = np.array([lx, ly], np.int32)
    k = 32

    # router path (should hit the Pallas fast path via the orientation
    # swap: fits(y, x) since ly > cap >= lx)
    t0 = time.time()
    sv, sc, ea, _ = post_mod._long_pairs_sparse(codes, lens, pack,
                                                [(0, 1)], k)
    sv0 = np.asarray(sv[0, :lx])
    sc0 = np.asarray(sc[0, :lx])
    dt_fast = time.time() - t0
    cells = 2 * lx * ly
    print(f"router: {dt_fast:.1f}s  {cells / dt_fast / 1e9:.2f} Gcells/s")

    # oracle: checkpoint-scan (no cap)
    t0 = time.time()
    vals_o, cols_o, ea_o, _tot = long_pair_posterior_sparse(
        codes[0][:lx], codes[1][:ly], pack, k=k, row_block=2048)
    dt_scan = time.time() - t0
    print(f"scan oracle: {dt_scan:.1f}s  {cells / dt_scan / 1e9:.2f} "
          f"Gcells/s  (speedup {dt_scan / dt_fast:.1f}x)")

    from muscle_tpu.ops.sparse import densify_np
    d_fast = densify_np(sv0, sc0, ly)
    d_scan = densify_np(vals_o, cols_o, ly)
    dd = np.abs(d_fast - d_scan)
    flip = ((d_fast == 0) | (d_scan == 0)) & \
           (np.maximum(d_fast, d_scan) <= 0.0102)
    dd = np.where(flip, 0.0, dd)
    outliers = int((dd > 5e-3).sum())
    frac = outliers / dd.size
    dea = abs(float(ea[0]) - float(ea_o))
    ok = frac < 1e-5 and dea < 1e-3
    print(f"max|dpost|={dd.max():.2e} outliers {outliers}/{dd.size} "
          f"({frac:.1e}) |dEA|={dea:.2e} {'OK' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
