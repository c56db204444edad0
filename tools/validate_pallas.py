"""Validate the Pallas pair-HMM path against the XLA-scan reference
path on the real device (ragged lengths, wildcards, both alphabets).

The scan path is itself validated against the per-cell oracle in
tests/test_pairhmm.py (CPU); this closes the loop for the TPU kernels.
Exit code 0 = max |post| diff and |ea| diff within tolerance.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muscle_tpu.hmm.params import HMMParams
from muscle_tpu.ops import pairhmm
from muscle_tpu.utils.jaxsetup import setup_jax

setup_jax()
import jax.numpy as jnp

from muscle_tpu.ops import pairhmm_pallas as pp

# Gates are FIXED, not L-scaled (ADVICE r1 / VERDICT r2): a slowly
# growing tolerance would hide slow numeric drift. Two-tier oracle:
#   * EA scores (the quantity the pipeline acts on) at a fixed 1e-3;
#   * posterior cells: pointwise 1e-3 for short pairs, and for long
#     pairs — where fp32 log-space reassociation between differently
#     shaped scan trees legitimately accumulates — a fixed bound on
#     the FRACTION of cells deviating > 5e-3 (must be < 1e-5 of the
#     valid lattice; a systematic kernel error trips this instantly,
#     benign reassociation tails do not).
POINTWISE_TOL = 1e-3
EA_TOL = 1e-3
OUTLIER_ABS = 5e-3
OUTLIER_FRAC = 1e-5
POINTWISE_MAX_L = 512


def run_case(name, nletters, b, lmax, seed, nucleo=False):
    pack = HMMParams.from_defaults(nucleo=nucleo).to_scores()
    match, insert, start, tv = pairhmm.score_args(pack)
    rng = np.random.default_rng(seed)
    lens_x = rng.integers(max(8, lmax // 3), lmax + 1, size=b).astype(np.int32)
    lens_y = rng.integers(max(8, lmax // 3), lmax + 1, size=b).astype(np.int32)
    lpad = ((lmax + 127) // 128) * 128
    wild = nletters
    xb = np.full((b, lpad), wild, np.int32)
    yb = np.full((b, lpad), wild, np.int32)
    for i in range(b):
        xb[i, :lens_x[i]] = rng.integers(0, nletters + 1, size=lens_x[i])
        yb[i, :lens_y[i]] = rng.integers(0, nletters + 1, size=lens_y[i])
    args = (jnp.asarray(xb), jnp.asarray(yb),
            jnp.asarray(lens_x), jnp.asarray(lens_y),
            match, insert, start, tv)
    post_s, ea_s = pairhmm.batch_posteriors(*args)
    post_p, ea_p = pp.batch_posteriors_pallas(*args)
    post_s = np.asarray(post_s)
    post_p = np.asarray(post_p)
    d = np.abs(post_s - post_p)
    # cells sitting exactly at the 0.01 sparse threshold may flip
    # in/out between differently-associated fp32 paths; exclude them
    flip = ((post_s == 0) | (post_p == 0)) & \
           (np.maximum(post_s, post_p) <= 0.0102)
    dd = np.where(flip, 0.0, d)
    dpost = float(np.max(dd))
    dea = float(jnp.max(jnp.abs(ea_s - ea_p)))
    cells = dd.size
    outliers = int((dd > OUTLIER_ABS).sum())
    if lmax <= POINTWISE_MAX_L:
        ok = dpost < POINTWISE_TOL and dea < EA_TOL
        gate = f"pointwise<{POINTWISE_TOL:.0e}"
    else:
        ok = (outliers < OUTLIER_FRAC * cells) and dea < EA_TOL
        gate = f"outliers {outliers}/{cells} (<{OUTLIER_FRAC:.0e})"
    print(f"{name}: max|dpost|={dpost:.2e} max|dea|={dea:.2e} "
          f"thresh-flips={int((flip & (d > 0)).sum())} [{gate}] "
          f"{'OK' if ok else 'FAIL'}")
    return ok


def main():
    import jax
    ok = True
    ok &= run_case("amino ragged", 20, 16, 200, 0)
    ok &= run_case("amino uniform", 20, 8, 128, 1)
    ok &= run_case("nucleo ragged", 4, 16, 250, 2, nucleo=True)
    ok &= run_case("amino long", 20, 8, 500, 3)
    # exercises the VMEM-aware tile_p selection (tile 8 at L=2048)
    ok &= run_case("amino verylong", 20, 8, 2000, 4)
    # in-kernel-emission fused backward (_bwd_post_pallas): production
    # path whenever the emission lattice exceeds the ELATTICE budget
    # (large batches, all long pairs) — validate it on-chip too
    pp.ELATTICE = False
    jax.clear_caches()   # flag is read at trace time, not in jit key
    ok &= run_case("amino ragged (in-kernel emissions)", 20, 16, 200, 5)
    ok &= run_case("amino long (in-kernel emissions)", 20, 8, 500, 6)
    pp.ELATTICE = True
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
