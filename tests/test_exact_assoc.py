"""Exact-association mode (MUSCLE_TPU_EXACT_ASSOC=1).

The default pair-HMM kernels use O(log L)-depth tree scans whose
LOGEXP1 association differs from the reference binary's sequential
LOG_ADD chains (docs/PARITY.md "BB11005 divergence analysis"). The
exact mode replays the reference's order; against a per-cell
transcription of fwdflat3/bwdflat3 (tests/naive_oracle.py) it must
agree to the f64-vs-f32 rounding floor of the oracle itself, with an
identical 0.01-threshold sparsity pattern.

Runs in a subprocess: the flag is read at import (the jit cache would
otherwise serve stale executables across a mid-process flip).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["MUSCLE_TPU_EXACT_ASSOC"] = "1"
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")   # sitecustomize may force a TPU
import numpy as np
import jax.numpy as jnp
from muscle_tpu.hmm.params import HMMParams
from muscle_tpu.ops import pairhmm
from tests import naive_oracle as NO

assert pairhmm.EXACT_ASSOC

pack = HMMParams.from_defaults().to_scores()
args = pairhmm.score_args(pack)
rng = np.random.default_rng(11)
lx, ly, L = 83, 97, 128
x = rng.integers(0, 20, lx).astype(np.int32)
y = rng.integers(0, 20, ly).astype(np.int32)
xb = np.full((1, L), 20, np.int32); xb[0, :lx] = x
yb = np.full((1, L), 20, np.int32); yb[0, :ly] = y
post, ea = pairhmm.batch_posteriors(
    jnp.asarray(xb), jnp.asarray(yb),
    jnp.asarray([lx]), jnp.asarray([ly]), *args)
mine = np.asarray(post)[0][:lx, :ly]

class P: pass
p2 = P()
p2.insert = np.asarray(pack.insert); p2.match = np.asarray(pack.match)
p2.start = np.asarray(pack.start)
for nm in ("tMM", "tMI", "tMJ", "tII", "tIM", "tJJ", "tJM"):
    setattr(p2, nm, float(getattr(pack, nm)))
po, total = NO.posterior(x, y, p2)

d = np.abs(mine - po).max()
xor = int(((mine > 0) ^ (po > 0)).sum())
print("RESULT", d, xor)
# the oracle's own mixed f64/f32 rounding floors the comparison around
# ~2e-5 (the oracle sits 2.1e-5 from the reference binary itself —
# docs/PARITY.md); against the reference binary's dump the exact-mode
# lattices are bit-identical and the posterior agrees to 2.8e-6
assert d < 1e-4, d
assert xor == 0, xor
"""


def test_exact_assoc_matches_sequential_oracle():
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"repo": REPO}],
        capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "RESULT" in r.stdout


def test_exact_assoc_defaults_off():
    from muscle_tpu.ops import pairhmm
    if os.environ.get("MUSCLE_TPU_EXACT_ASSOC") == "1":
        return          # explicitly enabled for this test run
    assert not pairhmm.EXACT_ASSOC
