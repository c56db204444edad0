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

# fp32 log-space reassociation between scan orders grows with the
# number of LOG_ADD rounds, i.e. with sequence length — scale the
# tolerance accordingly (ADVICE r1: the fixed 5e-4 gate was red at
# L=500 on real hardware while the Pallas paths agree bit-exactly).
def tol_for(lmax: int) -> float:
    return 5e-4 * max(1.0, lmax / 250.0)


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
    dpost = float(np.max(np.where(flip, 0.0, d)))
    dea = float(jnp.max(jnp.abs(ea_s - ea_p)))
    tol = tol_for(lmax)
    ok = dpost < tol and dea < tol
    print(f"{name}: max|dpost|={dpost:.2e} max|dea|={dea:.2e} "
          f"tol={tol:.1e} thresh-flips={int((flip & (d > 0)).sum())} "
          f"{'OK' if ok else 'FAIL'}")
    return ok


def main():
    ok = True
    ok &= run_case("amino ragged", 20, 16, 200, 0)
    ok &= run_case("amino uniform", 20, 8, 128, 1)
    ok &= run_case("nucleo ragged", 4, 16, 250, 2, nucleo=True)
    ok &= run_case("amino long", 20, 8, 500, 3)
    # exercises the VMEM-aware tile_p selection (tile 8 at L=2048)
    ok &= run_case("amino verylong", 20, 8, 2000, 4)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
