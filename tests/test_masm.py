"""MASM structure model: train from BB11001 mega data, score, align."""

import os

import numpy as np
import pytest

from muscle_tpu.sequence import MultiSequence, Sequence

MEGA = "/root/reference/test_data/mega/BB11001.mega"
GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "BB11001.mega.afa")

needs_data = pytest.mark.skipif(not os.path.exists(MEGA),
                                reason="no mega test data")


@pytest.fixture(scope="module")
def mega():
    from muscle_tpu.io.mega import parse_mega
    return parse_mega(MEGA)


@pytest.fixture(scope="module")
def aln(mega):
    if os.path.exists(GOLDEN):
        return MultiSequence.from_fasta(GOLDEN)
    # fall back: trivial 2-row alignment of the two first chains
    from muscle_tpu.pipeline.mpc import align
    seqs = MultiSequence([Sequence(lb, sq)
                          for lb, sq in zip(mega.labels, mega.seqs)])
    return align(seqs, mega=mega, refine_iters=0)


@needs_data
def test_masm_train_and_roundtrip(mega, aln, tmp_path):
    from muscle_tpu.pipeline.masm import MASM
    m = MASM.from_msa(aln, mega, "BB11001")
    assert m.col_count == aln.col_count()
    assert m.feature_names == mega.feature_names
    # freqs per feature sum to <= 1 (gaps excluded)
    for c in (0, m.col_count // 2):
        for f in range(len(m.feature_names)):
            s = float(m.freqs[c][f].sum())
            assert 0 <= s <= 1.0 + 1e-6

    p = tmp_path / "m.masm"
    m.to_file(str(p))
    m2 = MASM.from_file(str(p))
    assert m2.col_count == m.col_count
    assert m2.feature_names == m.feature_names
    np.testing.assert_allclose(m2.scores[3][0], m.scores[3][0], atol=1e-2)


@needs_data
def test_masm_sw_self_alignment(mega, aln):
    """Aligning a member chain's own profile against the MASM should
    produce a high-scoring, mostly-diagonal local alignment."""
    from muscle_tpu.pipeline.masm import MASM
    m = MASM.from_msa(aln, mega, "BB11001")
    prof = mega.profiles[0]
    score, path, lo_m, lo_q = m.sw_vs_profile(prof)
    assert score > 50
    assert path.count("B") > 0.8 * prof.shape[0]

    # an unrelated random profile should score much lower
    rng = np.random.default_rng(0)
    fake = np.zeros_like(prof)
    fake[:, 0] = rng.integers(0, 20, size=prof.shape[0])
    for f in range(1, prof.shape[1]):
        fake[:, f] = rng.integers(0, 16, size=prof.shape[0])
    score_fake, _, _, _ = m.sw_vs_profile(fake)
    assert score_fake < score * 0.5
