"""A/B benchmark of the within-row scan implementations on real TPU.

Runs batch_posteriors_pallas end-to-end (fwd + bwd + posterior + MEA)
for every scan impl in {hillis, poly, seg, segpoly} x L in
{256, 512, 1024, 2048} and prints a Gcells/s table. One process, runs
serially (side JAX processes wedge the axon tunnel).

Usage: python tools/ab_scan.py [--quick]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from muscle_tpu.hmm.params import HMMParams
    from muscle_tpu.ops import pairhmm
    from muscle_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    from muscle_tpu.ops.pairhmm_pallas import batch_posteriors_pallas

    quick = "--quick" in sys.argv
    impls = ("hillis", "poly", "seg", "segpoly")
    lens = (512, 2048) if quick else (256, 512, 1024, 2048)
    # keep per-config work ~constant: B * L^2 ~= 512 * 512^2
    b_for = {256: 1024, 512: 512, 1024: 128, 2048: 32}

    pack = HMMParams.from_defaults().to_scores()
    args = pairhmm.score_args(pack)
    rng = np.random.default_rng(0)

    results = []
    for L in lens:
        B = b_for[L]
        xb = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
        yb = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
        lb = jnp.full((B,), L, jnp.int32)
        for impl in impls:
            def step():
                post, ea = batch_posteriors_pallas(
                    xb, yb, lb, lb, *args, scan_impl=impl)
                return ea
            try:
                np.asarray(step())  # compile + warmup
                iters = 3
                t0 = time.perf_counter()
                for _ in range(iters):
                    np.asarray(step())
                dt = (time.perf_counter() - t0) / iters
                cps = 2 * B * L * L / dt
            except Exception as e:  # Mosaic compile failures etc.
                print(f"L={L:5d} B={B:4d} {impl:8s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            results.append({"impl": impl, "L": L, "B": B,
                            "gcells_s": round(cps / 1e9, 3)})
            print(f"L={L:5d} B={B:4d} {impl:8s} {cps / 1e9:7.3f} Gcells/s",
                  flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
