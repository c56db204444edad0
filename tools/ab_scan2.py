"""Round-2 A/B: poly base updates (+all impls) and bigger pair tiles.

Usage: python tools/ab_scan2.py
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

    configs = []
    for L, B in ((512, 512), (1024, 128), (2048, 32)):
        for impl in ("segpoly", "polyall", "segpolyall"):
            for tp in (None, 128):
                configs.append((L, B, impl, tp))

    pack = HMMParams.from_defaults().to_scores()
    args = pairhmm.score_args(pack)
    rng = np.random.default_rng(0)

    data = {}
    results = []
    for L, B, impl, tp in configs:
        if (L, B) not in data:
            data[(L, B)] = (
                jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32)),
                jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32)),
                jnp.full((B,), L, jnp.int32))
        xb, yb, lb = data[(L, B)]
        if tp is not None and B % tp != 0:
            continue

        def step():
            post, ea = batch_posteriors_pallas(
                xb, yb, lb, lb, *args, scan_impl=impl, tile_p=tp)
            return ea
        try:
            np.asarray(step())
            iters = 3
            t0 = time.perf_counter()
            for _ in range(iters):
                np.asarray(step())
            dt = (time.perf_counter() - t0) / iters
            cps = 2 * B * L * L / dt
        except Exception as e:
            print(f"L={L:5d} {impl:11s} tp={tp} FAILED: "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)
            continue
        results.append({"impl": impl, "L": L, "tile_p": tp,
                        "gcells_s": round(cps / 1e9, 3)})
        print(f"L={L:5d} B={B:4d} {impl:11s} tp={str(tp):4s} "
              f"{cps / 1e9:7.3f} Gcells/s", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
