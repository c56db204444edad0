"""HMM parameter model: defaults, normalization, perturbation, round-trip."""

import numpy as np
import pytest

from muscle_tpu.hmm.params import HMMParams, TRANS_NAMES
from muscle_tpu.utils.rng import MwcRng, GlibcRand


def test_default_amino_valid():
    hp = HMMParams.from_defaults(nucleo=False)
    assert hp.alpha_size == 20
    t = {n: hp.trans[i] for i, n in enumerate(TRANS_NAMES)}
    assert abs(t["START_M"] + 2 * t["START_IS"] + 2 * t["START_IL"] - 1) < 1e-5
    assert abs(t["M_M"] + 2 * t["M_IS"] + 2 * t["M_IL"] - 1) < 1e-5
    assert abs(t["IS_IS"] + t["IS_M"] - 1) < 1e-5
    assert abs(t["IL_IL"] + t["IL_M"] - 1) < 1e-5
    assert abs(hp.emits.sum() - 1) < 1e-4
    assert np.allclose(hp.emits, hp.emits.T)


def test_default_nucleo_valid():
    hp = HMMParams.from_defaults(nucleo=True)
    assert hp.alpha_size == 4
    assert abs(hp.emits.sum() - 1) < 1e-5


def test_perturb_deterministic_and_normalized():
    a = HMMParams.from_defaults()
    b = HMMParams.from_defaults()
    a.perturb(17)
    b.perturb(17)
    assert np.array_equal(a.trans, b.trans)
    assert np.array_equal(a.emits, b.emits)
    c = HMMParams.from_defaults()
    c.perturb(18)
    assert not np.array_equal(a.trans, c.trans)
    assert abs(a.emits.sum() - 1) < 1e-4


def test_perturb_zero_is_noop():
    a = HMMParams.from_defaults()
    b = HMMParams.from_defaults()
    b.perturb(0)
    assert np.array_equal(a.trans, b.trans)


def test_text_round_trip(tmp_path):
    hp = HMMParams.from_defaults()
    hp.perturb(3)
    p = tmp_path / "hmm.txt"
    hp.to_file(str(p))
    hp2 = HMMParams.from_file(str(p))
    np.testing.assert_allclose(hp.trans, hp2.trans, rtol=1e-4)
    np.testing.assert_allclose(hp.emits, hp2.emits, rtol=1e-4)


def test_scorepack_shapes():
    pack = HMMParams.from_defaults().to_scores()
    assert pack.match.shape == (21, 21)
    assert pack.insert.shape == (21,)
    # wildcard rows = uniform
    assert abs(pack.insert[20] - np.log(1 / 20)) < 1e-5
    assert abs(pack.match[20, 20] - np.log(1 / 400)) < 1e-4
    # insert scores = log marginals
    assert np.all(pack.insert[:20] < 0)


def test_mwc_rng_reset_deterministic():
    r1 = MwcRng(42)
    vals1 = [r1.randu32() for _ in range(5)]
    r2 = MwcRng(42)
    vals2 = [r2.randu32() for _ in range(5)]
    assert vals1 == vals2
    r1.reset(42)
    assert [r1.randu32() for _ in range(5)] == vals1


def test_glibc_rand_matches_glibc():
    g = GlibcRand(1)
    assert [g.rand() for _ in range(5)] == [
        1804289383, 846930886, 1681692777, 1714636915, 1957747793]
