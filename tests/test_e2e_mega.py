"""Muscle-3D end-to-end vs reference goldens (structure alignment)."""

import os

import pytest

from muscle_tpu.qscore import qscore
from muscle_tpu.sequence import MultiSequence, Sequence

MEGA_DIR = "/root/reference/test_data/mega"
REF_DIR = "/root/reference/test_data/ref_alns"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(MEGA_DIR), reason="reference test_data not available")


@needs_testdata
def test_mega_parse_bb11001():
    from muscle_tpu.io.mega import parse_mega
    mega = parse_mega(f"{MEGA_DIR}/BB11001.mega")
    assert mega.feature_count == 8
    assert mega.feature_names[0] == "AA"
    assert len(mega.labels) == 4
    assert all(p.shape[1] == 8 for p in mega.profiles)
    # feature 0 letters reproduce the AA sequence
    assert len(mega.seqs[0]) == mega.profiles[0].shape[0]
    # weighted match score of identical positions should beat mismatched
    s_same = mega.match_score(mega.profiles[0], 0, mega.profiles[0], 0)
    s_diff = mega.match_score(mega.profiles[0], 0, mega.profiles[1], 5)
    assert s_same > s_diff


@needs_testdata
def test_mega_align_bb11001_matches_reference():
    from muscle_tpu.io.mega import parse_mega
    from muscle_tpu.pipeline.mpc import align
    mega = parse_mega(f"{MEGA_DIR}/BB11001.mega")
    seqs = MultiSequence([Sequence(lb, sq)
                          for lb, sq in zip(mega.labels, mega.seqs)])
    msa = align(seqs, mega=mega)
    # committed golden = reference binary output (tests/goldens/README.md)
    gold = {s.label: s.text() for s in
            MultiSequence.from_fasta(f"{GOLDEN_DIR}/BB11001.mega.afa")}
    assert {s.label: s.text() for s in msa} == gold
    ref = MultiSequence.from_fasta(f"{REF_DIR}/BB11001")
    q, tc = qscore(msa, ref, by_sequence=True)
    # golden: Q=0.985 TC=0.982 (check_results.py:44); >= 0.7x tolerance
    assert q >= 0.7 * 0.985
    assert tc >= 0.7 * 0.982
