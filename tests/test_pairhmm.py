"""Validate the batched scan pair-HMM against the naive per-cell oracle."""

import numpy as np
import pytest

from muscle_tpu.alphabet import ALPHA_AMINO, encode
from muscle_tpu.hmm.params import HMMParams
from muscle_tpu.ops import pairhmm

from naive_oracle import posterior as naive_posterior, mea_score as naive_mea


@pytest.fixture(scope="module")
def pack():
    return HMMParams.from_defaults(nucleo=False).to_scores()


def _rand_seq(rng, n):
    return "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), size=n))


def _codes(s):
    return encode(np.frombuffer(s.encode(), dtype=np.uint8), ALPHA_AMINO).astype(np.int32)


def _run_batch(pack, seqs_xy, bx, by):
    xb = np.zeros((len(seqs_xy), bx), np.int32) + pack.alpha_size  # pad wildcard
    yb = np.zeros((len(seqs_xy), by), np.int32) + pack.alpha_size
    lx = np.zeros(len(seqs_xy), np.int32)
    ly = np.zeros(len(seqs_xy), np.int32)
    for k, (x, y) in enumerate(seqs_xy):
        cx, cy = _codes(x), _codes(y)
        xb[k, :len(cx)] = cx
        yb[k, :len(cy)] = cy
        lx[k], ly[k] = len(cx), len(cy)
    args = pairhmm.score_args(pack)
    post, ea = pairhmm.batch_posteriors(xb, yb, lx, ly, *args)
    return np.asarray(post), np.asarray(ea), lx, ly


def test_posterior_matches_naive_oracle(pack):
    rng = np.random.default_rng(0)
    pairs = [
        (_rand_seq(rng, 12), _rand_seq(rng, 15)),
        (_rand_seq(rng, 30), _rand_seq(rng, 22)),
        ("ACDEFGHIKL", "ACDEFGHIKL"),
        (_rand_seq(rng, 7), _rand_seq(rng, 40)),
    ]
    post, ea, lx, ly = _run_batch(pack, pairs, 48, 48)
    for k, (x, y) in enumerate(pairs):
        P_ref, _ = naive_posterior(_codes(x), _codes(y), pack)
        got = post[k, :lx[k], :ly[k]]
        np.testing.assert_allclose(got, P_ref, atol=2e-3, rtol=1e-2)
        # padding region must be exactly zero
        assert np.all(post[k, lx[k]:, :] == 0)
        assert np.all(post[k, :, ly[k]:] == 0)
        # EA score
        ea_ref = naive_mea(P_ref) / min(lx[k], ly[k])
        np.testing.assert_allclose(ea[k], ea_ref, atol=2e-3)


def test_identical_sequences_high_posterior_diag(pack):
    s = "MKVLITGGAGFIGSHLVDELLRRGHEVIVLDNLS"
    post, ea, lx, ly = _run_batch(pack, [(s, s)], 40, 40)
    d = np.diagonal(post[0, :lx[0], :ly[0]])
    assert np.all(d > 0.5), d.min()
    assert ea[0] > 0.9


def test_posterior_row_sums_le_one(pack):
    rng = np.random.default_rng(1)
    pairs = [(_rand_seq(rng, 25), _rand_seq(rng, 28))]
    post, _, lx, ly = _run_batch(pack, pairs, 32, 32)
    rows = post[0, :lx[0], :ly[0]].sum(axis=1)
    assert np.all(rows <= 1.0 + 1e-3)


def test_sparse_posteriors_bucketed_matches_unbucketed():
    """Length-bucketed sparse pair stage == single-bucket results."""
    import numpy as np
    from muscle_tpu.hmm.params import HMMParams
    from muscle_tpu.pipeline import posteriors as post_mod
    from muscle_tpu.sequence import MultiSequence, Sequence

    rng = np.random.default_rng(11)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    seqs = []
    for i, ln in enumerate([40, 50, 120, 130, 250, 260, 270, 60, 245]):
        seqs.append(Sequence(f"s{i}", "".join(
            aas[j] for j in rng.integers(0, 20, ln))))
    ms = MultiSequence(seqs)
    pack = HMMParams.from_defaults().to_scores()
    codes, lens = post_mod.encode_batch(ms, "amino", pad_to=384)
    pairs = [(x, y) for x in range(len(seqs)) for y in range(x + 1, len(seqs))]
    assert post_mod._bucketize(pairs, lens, 384) is not None

    sv1, sc1, ea1, m1 = post_mod.all_pairs_posteriors_sparse(
        codes, lens, pack, pairs, bucket=True)
    sv0, sc0, ea0, m0 = post_mod.all_pairs_posteriors_sparse(
        codes, lens, pack, pairs, bucket=False)
    assert np.array_equal(np.asarray(sv1), np.asarray(sv0))
    assert np.array_equal(np.asarray(sc1), np.asarray(sc0))
    assert np.allclose(ea1, ea0)
    # EA-only bucketed path agrees too
    _, ea2 = post_mod.all_pairs_posteriors(
        codes, lens, pack, pairs, return_post=False)
    assert np.allclose(ea2, ea0)
