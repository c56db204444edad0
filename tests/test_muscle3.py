"""Classic muscle3 profile aligner."""

import os

import numpy as np
import pytest

from muscle_tpu.pipeline.muscle3 import Muscle3, Profile3, _nw_profile
from muscle_tpu.sequence import MultiSequence, Sequence
from muscle_tpu.qscore import qscore
from muscle_tpu.ops.sw import BLOSUM62


def test_profile3_stats():
    msa = MultiSequence([Sequence("a", "AC-D"), Sequence("b", "ACED")])
    w = np.array([0.5, 0.5])
    p = Profile3(msa, w, BLOSUM62.astype(np.float64), -6.0)
    assert p.col_count == 4
    assert abs(p.occ[0] - 1.0) < 1e-9
    assert abs(p.occ[2] - 0.5) < 1e-9
    # col 2: 'b' has E (weight .5)
    assert abs(p.freqs[2, 3] - 0.5) < 1e-9   # E is index 3
    # gap open at col 2: 1 - m_LG... LG at col 2 = weight of rows with
    # letter before and gap here = 0.5 ('a')
    assert abs(p.gap_open[2] - (-6.0) * (1 - 0.5) / 2) < 1e-9


def test_nw_profile_identical():
    msa1 = MultiSequence([Sequence("a", "MKVLITGG")])
    msa2 = MultiSequence([Sequence("b", "MKVLITGG")])
    s = (BLOSUM62 + 0.8).astype(np.float64)
    p1 = Profile3(msa1, np.array([1.0]), s, -6.0)
    p2 = Profile3(msa2, np.array([1.0]), s, -6.0)
    score, path = _nw_profile(p1, p2)
    assert path == "B" * 8
    assert score > 0


def test_nw_profile_insert():
    msa1 = MultiSequence([Sequence("a", "MKVWWWLITGG")])
    msa2 = MultiSequence([Sequence("b", "MKVLITGG")])
    s = (BLOSUM62 + 0.8).astype(np.float64)
    p1 = Profile3(msa1, np.array([1.0]), s, -6.0)
    p2 = Profile3(msa2, np.array([1.0]), s, -6.0)
    _, path = _nw_profile(p1, p2)
    assert sum(c in "BX" for c in path) == 11
    assert sum(c in "BY" for c in path) == 8
    assert path.count("X") == 3


@pytest.mark.skipif(not os.path.isdir("/root/reference/test_data/fa"),
                    reason="no test data")
def test_muscle3_bb11001_reasonable():
    seqs = MultiSequence.from_fasta("/root/reference/test_data/fa/BB11001")
    msa = Muscle3(tree_iters=1).run(seqs)
    assert msa.is_aligned()
    rows = {s.label: s.text() for s in msa}
    for s in seqs:
        assert rows[s.label].replace("-", "") == s.text()
    ref = MultiSequence.from_fasta("/root/reference/test_data/ref_alns/BB11001")
    q, tc = qscore(msa, ref)
    # classic aligner: lower accuracy than MPC but must be sane
    assert q >= 0.5, q
