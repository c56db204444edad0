"""Micro-profile the Pallas pair-HMM components on the real device."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muscle_tpu.hmm.params import HMMParams
from muscle_tpu.ops import pairhmm
from muscle_tpu.utils.jaxsetup import setup_jax

setup_jax()
import jax
import jax.numpy as jnp

from muscle_tpu.ops import pairhmm_pallas as pp

B = int(os.environ.get("BENCH_BATCH", 512))
L = int(os.environ.get("BENCH_LEN", 512))
TILE = int(os.environ.get("TILE_P", 0)) or None

pack = HMMParams.from_defaults().to_scores()
match, insert, start, tv = pairhmm.score_args(pack)
rng = np.random.default_rng(0)
xb = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
yb = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
lb = jnp.full((B,), L, jnp.int32)


def timeit(name, fn, *args, iters=5):
    np.asarray(fn(*args))  # compile + real roundtrip (scalar out)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = np.asarray(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    cells = B * L * L
    print(f"{name:24s} {dt*1e3:8.2f} ms   {cells/dt/1e9:8.2f} Gcells/s(1dir)")
    return dt


tile_p = TILE or pp._pick_tile_p(B)
print(f"B={B} L={L} tile_p={tile_p}")


@jax.jit
def prep(xb, yb, lb, match, insert):
    xr = jax.vmap(lambda x, lx: jnp.roll(x[::-1], lx - L))(xb, lb)
    yr = jax.vmap(lambda y, ly: jnp.roll(y[::-1], ly - L))(yb, lb)
    e = pp.emission_matrix(xb, yb, match)
    e_rev = pp.emission_matrix(xr, yr, match)
    return (e, e_rev, insert[xb], insert[yb], insert[xr], insert[yr])


@jax.jit
def emis_t(xb, yb, match):
    return pp.emission_matrix(xb, yb, match)[0, 0, 0]


e, e_rev, insx, insy, insxr, insyr = jax.block_until_ready(
    prep(xb, yb, lb, match, insert))
ii = jnp.arange(L)
lymask = (ii[None, :] == (lb[:, None] - 1)).astype(jnp.float32)
lxf = jnp.broadcast_to(lb.astype(jnp.float32)[:, None], (B, 128))
params = jnp.asarray(pp._params_rows(start, tv, B))

e_t = jnp.asarray(e.transpose(1, 0, 2))
er_t = jnp.asarray(e_rev.transpose(1, 0, 2))
insx_t = jnp.asarray(insx.T[:, :, None])
insxr_t = jnp.asarray(insxr.T[:, :, None])


@jax.jit
def fwd_t(e_t, insx_t, insy, lymask, lxf, params):
    m, s = pp._fwd_pallas(e_t, insx_t, insy, lymask, lxf, params, tile_p)
    return m[0, 0, 0] + s[0, 0]


@jax.jit
def bwd_t(er_t, insxr_t, insyr, params):
    m = pp._bwd_pallas(er_t, insxr_t, insyr, params, tile_p)
    return m[0, 0, 0]


@jax.jit
def full_t(xb, yb, lb, match, insert, start, tv):
    post, ea = pp.batch_posteriors_pallas(xb, yb, lb, lb, match, insert,
                                          start, tv)
    return post[0, 0, 0] + ea[0]


@jax.jit
def nomea_t(xb, yb, lb, match, insert, start, tv):
    post, ea = pp.batch_posteriors_pallas(xb, yb, lb, lb, match, insert,
                                          start, tv, with_mea=False)
    return post[0, 0, 0]


timeit("emissions(x1)", emis_t, xb, yb, match)
timeit("fwd kernel", fwd_t, e_t, insx_t, insy, lymask, lxf, params)
timeit("bwd kernel", bwd_t, er_t, insxr_t, insyr, params)
timeit("full (post+mea)", full_t, xb, yb, lb, match, insert, start, tv)
timeit("full (no mea)", nomea_t, xb, yb, lb, match, insert, start, tv)


@jax.jit
def mea_t(post_t):
    return pp.mea_scores_pallas(post_t, tile_p)[0]


post, _ = pp.batch_posteriors_pallas(xb, yb, lb, lb, match, insert, start, tv,
                                     with_mea=False)
post_t = jnp.asarray(post.transpose(1, 0, 2))
timeit("mea only", mea_t, post_t)
