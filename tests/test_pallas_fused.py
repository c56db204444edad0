"""Fused backward+posterior Pallas kernel vs the XLA-scan reference,
run in Pallas interpreter mode on CPU (no TPU needed).

The scan path is validated against the per-cell oracle in
test_pairhmm.py; this closes the loop for the fused kernel's leading-
padding machinery (pinned init rows, boundary chains in padding lanes,
static lane flip) on ragged batches. On-chip validation (compiled
Mosaic) is tools/validate_pallas.py.
"""

import numpy as np
import pytest

from muscle_tpu.hmm.params import HMMParams
from muscle_tpu.ops import pairhmm


def _case(b, lmax, seed, nucleo=False, multi=False):
    import jax.numpy as jnp
    from muscle_tpu.ops import pairhmm_pallas as pp

    nletters = 4 if nucleo else 20
    rng = np.random.default_rng(seed)
    lens_x = rng.integers(max(8, lmax // 3), lmax + 1, size=b).astype(np.int32)
    lens_y = rng.integers(max(8, lmax // 3), lmax + 1, size=b).astype(np.int32)
    # make at least one pair exactly full-width (q0 = 0 edge case)
    lens_x[0] = lens_y[0] = lmax
    lpad = ((lmax + 127) // 128) * 128
    wild = nletters
    xb = np.full((b, lpad), wild, np.int32)
    yb = np.full((b, lpad), wild, np.int32)
    for i in range(b):
        xb[i, :lens_x[i]] = rng.integers(0, nletters + 1, size=lens_x[i])
        yb[i, :lens_y[i]] = rng.integers(0, nletters + 1, size=lens_y[i])

    jargs = (jnp.asarray(xb), jnp.asarray(yb),
             jnp.asarray(lens_x), jnp.asarray(lens_y))
    if multi:
        packs = []
        for i in range(b):
            hp = HMMParams.from_defaults(nucleo=nucleo)
            hp.perturb(seed=i + 1)
            packs.append(hp.to_scores())
        match_b = jnp.asarray(np.stack([p.match for p in packs]))
        insert_b = jnp.asarray(np.stack([p.insert for p in packs]))
        start_b = jnp.asarray(np.stack([p.start for p in packs]))
        tv_b = jnp.stack([pairhmm._trans_vec(p) for p in packs])
        post_s, ea_s = pairhmm.batch_posteriors_multi(
            *jargs, match_b, insert_b, start_b, tv_b)
        post_p, ea_p = pp.batch_posteriors_pallas_multi(
            *jargs, match_b, insert_b, start_b, tv_b,
            fused=True, interpret=True)
    else:
        pack = HMMParams.from_defaults(nucleo=nucleo).to_scores()
        args = pairhmm.score_args(pack)
        post_s, ea_s = pairhmm.batch_posteriors(*jargs, *args)
        post_p, ea_p = pp.batch_posteriors_pallas(
            *jargs, *args, fused=True, interpret=True)

    post_s = np.asarray(post_s)
    post_p = np.asarray(post_p)
    d = np.abs(post_s - post_p)
    # cells at the 0.01 threshold may flip between fp32 associations
    flip = ((post_s == 0) | (post_p == 0)) & \
           (np.maximum(post_s, post_p) <= 0.0102)
    dpost = float(np.max(np.where(flip, 0.0, d)))
    dea = float(np.max(np.abs(np.asarray(ea_s) - np.asarray(ea_p))))
    assert dpost < 2e-3, dpost
    assert dea < 2e-3, dea


def test_fused_amino_ragged():
    _case(b=8, lmax=96, seed=0)


def test_fused_inkernel_emissions():
    """The flip_e=False in-kernel-emission fused backward
    (_bwd_post_pallas) is a production path — taken whenever the
    (B, Lx, Ly) emission lattice exceeds the ELATTICE HBM budget
    (B=512/L=1024 batches; all long pairs) — but the small shapes of
    the tests above always fit the budget and exercise only
    _bwd_post_pallas_emissions. Force the in-kernel variant by
    disabling ELATTICE (ADVICE r3)."""
    import jax
    from muscle_tpu.ops import pairhmm_pallas as pp
    old = pp.ELATTICE
    pp.ELATTICE = False
    # ELATTICE is read at trace time and is NOT part of the jit cache
    # key — drop cached traces so the flag actually takes effect
    jax.clear_caches()
    try:
        _case(b=8, lmax=96, seed=3)
        _case(b=8, lmax=70, seed=4, nucleo=True)
    finally:
        pp.ELATTICE = old
        jax.clear_caches()


def test_fused_max_ly_single_source():
    """posteriors.py's long-pair router mirrors the kernel lane cap."""
    from muscle_tpu.ops import pairhmm_pallas as pp
    from muscle_tpu.pipeline import posteriors as post_mod
    assert post_mod._LONG_PALLAS_MAX_LY == pp.FUSED_MAX_LY


def test_fused_nucleo_ragged():
    _case(b=8, lmax=70, seed=1, nucleo=True)


def test_fused_multi_tables():
    _case(b=8, lmax=80, seed=2, multi=True)
