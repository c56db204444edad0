"""Stage-level timing of the Pallas posterior path on the real chip.

Breaks batch_posteriors_pallas into prep / fwd / bwd / finish / MEA and
times each as its own jitted dispatch, so we know where the cells/sec
actually go before optimizing. One process, serial (side JAX processes
wedge the axon tunnel).

Usage: python tools/profile_stages.py [L] [B]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _probe(r):
    """Force completion by fetching ONE element per output array (the
    tunnel's host link is far too slow to move whole lattices, and
    block_until_ready returns early through the tunnel)."""
    leaves = r if isinstance(r, (tuple, list)) else (r,)
    for lf in leaves:
        np.asarray(lf.ravel()[-1:])


def timeit(fn, *args, iters=8):
    out = fn(*args)
    _probe(out)
    # amortize the tunnel round-trip: launch `iters` async dispatches,
    # force completion once at the end (single fetch)
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    _probe(r)
    return (time.perf_counter() - t0) / iters, out


def main():
    from muscle_tpu.hmm.params import HMMParams
    from muscle_tpu.ops import pairhmm
    from muscle_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    from muscle_tpu.ops import pairhmm_pallas as pp

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    pack = HMMParams.from_defaults().to_scores()
    match, insert, start, tv = pairhmm.score_args(pack)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
    yb = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
    lb = jnp.full((B,), L, jnp.int32)
    impl = os.environ.get("MUSCLE_TPU_SCAN_IMPL", "hillis")

    kk = match.shape[0]
    kp = pp._round_up(kk, 8)
    tile_p = pp._pick_tile_p(B, L, kp)
    print(f"L={L} B={B} tile_p={tile_p} impl={impl}")

    @jax.jit
    def prep(xb, yb, lxb, lyb):
        xr = jax.vmap(lambda x, lx: jnp.roll(x[::-1], lx - L))(xb, lxb)
        yr = jax.vmap(lambda y, ly: jnp.roll(y[::-1], ly - L))(yb, lyb)

        def xmt(codes):
            ox = jax.nn.one_hot(codes, kk, dtype=jnp.float32)
            xm = jax.lax.dot_general(ox, match, (((2,), (0,)), ((), ())),
                                     precision=jax.lax.Precision.HIGHEST)
            return jnp.pad(xm, ((0, 0), (0, 0), (0, 128 - kk))
                           ).transpose(1, 0, 2)

        def oyt(codes):
            oy = jax.nn.one_hot(codes, kk, dtype=jnp.float32, axis=1)
            return jnp.pad(oy, ((0, 0), (0, kp - kk), (0, 0)))

        jj = jnp.arange(L)
        lymask = (jj[None, :] == (lyb[:, None] - 1)).astype(jnp.float32)
        lxf = jnp.broadcast_to(lxb.astype(jnp.float32)[:, None], (B, 128))
        params = pp._params_rows(start, tv, B)
        return (xmt(xb), oyt(yb), insert[xb].T[:, :, None], insert[yb],
                xmt(xr), oyt(yr), insert[xr].T[:, :, None], insert[yr],
                lymask, lxf, params)

    print("compiling prep...", flush=True)
    dt_prep, prep_out = timeit(prep, xb, yb, lb, lb)
    print("prep done", flush=True)
    (xm_t, oy, insx_t, insy, xm_rt, oy_r, insx_rt, insy_r,
     lymask, lxf, params) = prep_out

    # big arrays are ARGUMENTS, never closures: closed-over device
    # arrays become XLA constants and the compiler tries to fold them
    @jax.jit
    def fwd(xm_t, oy, insx_t, insy, lymask, lxf, params):
        return pp._fwd_pallas_fused(xm_t, oy, insx_t, insy, lymask, lxf,
                                    params, tile_p, kk, impl)

    @jax.jit
    def bwd(xm_rt, oy_r, insx_rt, insy_r, params):
        return pp._bwd_pallas_fused(xm_rt, oy_r, insx_rt, insy_r,
                                    params, tile_p, kk, impl)

    print("compiling fwd...", flush=True)
    dt_fwd, fwd_out = timeit(fwd, xm_t, oy, insx_t, insy, lymask, lxf,
                             params)
    print("fwd done", flush=True)
    fm_t, f_end5 = fwd_out
    dt_bwd, rbm_t = timeit(bwd, xm_rt, oy_r, insx_rt, insy_r, params)
    print("bwd done", flush=True)

    @jax.jit
    def finish(fm_t, rbm_t, f_end5, lb):
        return pp._finish_posteriors(fm_t, rbm_t, f_end5, lb, lb, start,
                                     False, tile_p)

    dt_fin, (post, _) = timeit(finish, fm_t, rbm_t, f_end5, lb)
    print("finish done", flush=True)
    # materialize the (Lx, B, Ly) layout outside the timed MEA stage
    post_t = jax.jit(lambda p: p.transpose(1, 0, 2))(post)
    _probe(post_t)

    @jax.jit
    def mea(post_t):
        return pp.mea_scores_pallas(post_t, tile_p)

    dt_mea, _ = timeit(mea, post_t)

    cells = B * L * L
    tot = dt_prep + dt_fwd + dt_bwd + dt_fin + dt_mea
    print(f"{'stage':8s} {'ms':>9s} {'%':>6s} {'Gcells/s(1dir)':>15s}")
    for name, dt in (("prep", dt_prep), ("fwd", dt_fwd), ("bwd", dt_bwd),
                     ("finish", dt_fin), ("mea", dt_mea), ("TOTAL", tot)):
        print(f"{name:8s} {dt * 1e3:9.2f} {100 * dt / tot:6.1f} "
              f"{cells / dt / 1e9:15.2f}")
    print(f"end-to-end 2-dir Gcells/s: {2 * cells / tot / 1e9:.3f}")


if __name__ == "__main__":
    main()
