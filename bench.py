"""Benchmark: pair-HMM DP cells/sec on the available accelerator.

Primary metric per BASELINE.md: pair-HMM DP cells/sec/chip (the unit of
all hot work in the MPC pipeline — SURVEY §3.4). One cell = one (i, j)
lattice position of one direction (Forward or Backward), i.e. a full
Forward+Backward pass over a LX x LY pair counts 2*LX*LY cells. The
posterior + EA-score stages are included in the timed region, so this
is end-to-end pair throughput, not a stripped kernel number.

vs_baseline compares against the reference C++ binary's measured
throughput on this host's CPU (all cores, OpenMP), scaled to a 64-core
CPU (the BASELINE.json target is >= 10x pair-HMM pairs/s vs 64-core CPU
per chip). Override the baseline via MUSCLE_TPU_BASELINE_CELLS.

Prints ONE JSON line:
  {"metric": "pairhmm_cells_per_sec", "value": N, "unit": "cells/s",
   "vs_baseline": R}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Reference C++ MUSCLE v5.3 (-O3 -DNDEBUG -march=native, OpenMP) measured
# on this container's CPU (16 seqs x L=1000 -align end-to-end, 2 cores):
# 5.48e6 cells/sec/core — see tools/measure_ref_baseline.py. The
# comparison target is a 64-core CPU node (BASELINE.md: >= 10x that).
REF_CELLS_PER_SEC_PER_CORE = float(
    os.environ.get("MUSCLE_TPU_REF_CELLS_PER_CORE", 5.48e6))
BASELINE_CORES = 64


def main():
    from muscle_tpu.hmm.params import HMMParams
    from muscle_tpu.ops import pairhmm
    from muscle_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    B = int(os.environ.get("BENCH_BATCH", 512))
    L = int(os.environ.get("BENCH_LEN", 512))
    iters = int(os.environ.get("BENCH_ITERS", 5))
    backend = os.environ.get("BENCH_BACKEND", "auto")
    if backend == "auto":
        backend = "scan" if jax.default_backend() == "cpu" else "pallas"

    pack = HMMParams.from_defaults().to_scores()
    args = pairhmm.score_args(pack)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
    yb = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
    lb = jnp.full((B,), L, jnp.int32)

    if backend == "pallas":
        from muscle_tpu.ops.pairhmm_pallas import batch_posteriors_pallas

        def step():
            post, ea = batch_posteriors_pallas(xb, yb, lb, lb, *args)
            return ea
    else:
        def step():
            post, ea = pairhmm.batch_posteriors(xb, yb, lb, lb, *args)
            return ea

    # warmup/compile; np.asarray forces a real device round-trip — through
    # the remote-TPU tunnel block_until_ready alone returns early
    np.asarray(step())
    t0 = time.perf_counter()
    for _ in range(iters):
        ea = np.asarray(step())
    dt = (time.perf_counter() - t0) / iters

    cells = 2 * B * L * L        # fwd + bwd lattices
    cps = cells / dt
    baseline = REF_CELLS_PER_SEC_PER_CORE * BASELINE_CORES
    print(json.dumps({
        "metric": "pairhmm_cells_per_sec",
        "value": round(cps),
        "unit": "cells/s",
        "vs_baseline": round(cps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
