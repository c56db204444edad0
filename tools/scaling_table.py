"""Pair-throughput scaling table across mesh sizes.

Measures the sharded pair-grid posterior stage (the MPC hot loop) at
1, 2, 4, ... devices and prints pairs/s + parallel efficiency. On a
multi-chip TPU host this measures real ICI scaling; otherwise run with
the virtual CPU mesh to validate the sharded code path:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_table.py [--pairs 64] [--len 256]

(BASELINE.md target: >= 80% efficiency at 2 hosts.)
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--len", type=int, dest="length", default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args()

    from muscle_tpu.utils.jaxsetup import setup_jax
    setup_jax()
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # sitecustomize may force-register the TPU plugin and overwrite
        # jax_platforms (same dance as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from muscle_tpu.hmm.params import HMMParams
    from muscle_tpu.parallel.mesh import make_mesh, sharded_batch_posteriors
    from muscle_tpu.pipeline.posteriors import default_backend

    backend = args.backend
    if backend == "auto":
        backend = default_backend()
    pack = HMMParams.from_defaults().to_scores()
    rng = np.random.default_rng(0)
    b, l = args.pairs, args.length
    xb = jnp.asarray(rng.integers(0, 20, size=(b, l)).astype(np.int32))
    yb = jnp.asarray(rng.integers(0, 20, size=(b, l)).astype(np.int32))
    lens = jnp.asarray(np.full(b, l, np.int32))

    devs = jax.devices()
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devs)]
    base = None
    print(f"backend={backend} pairs={b} len={l}")
    for nd in sizes:
        if b % nd:
            continue
        fn = sharded_batch_posteriors(make_mesh(devs[:nd]), pack,
                                      backend=backend)
        _, ea = fn(xb, yb, lens, lens)   # compile + warm
        np.asarray(ea)
        t0 = time.time()
        for _ in range(args.iters):
            _, ea = fn(xb, yb, lens, lens)
            np.asarray(ea)
        dt = (time.time() - t0) / args.iters
        pps = b / dt
        if base is None:
            base = pps
        eff = pps / (base * nd)
        print(f"devices={nd:3d}  {pps:10.1f} pairs/s   "
              f"efficiency {100*eff:5.1f}%")


if __name__ == "__main__":
    main()
