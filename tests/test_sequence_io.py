"""Sequence model, FASTA I/O, qscore, derep."""

import numpy as np
import pytest

from muscle_tpu.sequence import MultiSequence, Sequence
from muscle_tpu.qscore import qscore
from muscle_tpu.pipeline.derep import Derep


def test_fasta_round_trip(tmp_path):
    text = ">a desc\nMKVL\nITGG\n>b\nMK-VL\n"
    ms = MultiSequence.from_fasta_text(text)
    assert ms.labels() == ["a desc", "b"]
    assert ms[0].text() == "MKVLITGG"
    p = tmp_path / "x.fa"
    ms.write_fasta(str(p))
    ms2 = MultiSequence.from_fasta(str(p))
    assert [s.text() for s in ms2] == [s.text() for s in ms]


def test_fasta_80col_wrap(tmp_path):
    s = Sequence("long", "A" * 200)
    p = tmp_path / "l.fa"
    MultiSequence([s]).write_fasta(str(p))
    lines = p.read_text().splitlines()
    assert lines[0] == ">long"
    assert len(lines[1]) == 80 and len(lines[3]) == 40


def test_add_gaps_path():
    s = Sequence("x", "ABC")
    out = s.add_gaps_path("BXYB", "X")
    assert out.text() == "AB-C"
    out = s.add_gaps_path("BXYB", "Y")
    assert out.text() == "A-BC"


def test_pos_col_maps():
    s = Sequence("x", "AT-G--C")
    assert list(s.pos_to_col()) == [0, 1, 3, 6]
    assert list(s.col_to_pos()) == [0, 1, -1, 2, -1, -1, 3]


def test_project_removes_allgap_columns():
    ms = MultiSequence([Sequence("a", "A-C-"), Sequence("b", "AD-G"),
                        Sequence("c", "A-CG")])
    sub = ms.project([0, 2])
    assert [s.text() for s in sub] == ["AC-", "ACG"]
    sub2 = ms.project([0])
    assert sub2[0].text() == "AC"  # all-gap cols dropped


def test_qscore_perfect_and_partial():
    ref = MultiSequence.from_fasta_text(">a\nMKV-L\n>b\nMKVQL\n")
    test_same = MultiSequence.from_fasta_text(">a\nMKV-L\n>b\nMKVQL\n")
    q, tc = qscore(test_same, ref)
    assert q == 1.0 and tc == 1.0
    test_diffgap = MultiSequence.from_fasta_text(">a\nMKVL-\n>b\nMKVQL\n")
    q2, tc2 = qscore(test_diffgap, ref)
    assert q2 < 1.0


def test_qscore_lowercase_ref_ignored():
    # lower-case ref columns are non-core: not scored
    ref = MultiSequence.from_fasta_text(">a\nMKvL\n>b\nMKvL\n")
    test = MultiSequence.from_fasta_text(">a\nMKvL\n>b\nMKvL\n")
    q, tc = qscore(test, ref)
    assert q == 1.0  # only the 3 upper columns scored


def test_derep():
    ms = MultiSequence([Sequence("a", "MKVL"), Sequence("b", "mkvl"),
                        Sequence("c", "MKVQ"), Sequence("d", "MKVL")])
    d = Derep()
    d.run(ms)
    assert d.rep_indexes == [0, 2]
    dupes = d.rep_label_to_dupe_labels(ms)
    assert dupes == {"a": ["b", "d"]}


def test_guess_is_nucleo():
    from muscle_tpu.alphabet import guess_is_nucleo
    from muscle_tpu.utils.rng import MwcRng
    nt = MultiSequence([Sequence(f"n{i}", "ACGTACGTACGT" * 5) for i in range(3)])
    aa = MultiSequence([Sequence(f"a{i}", "MKVLITGGWQERYPH" * 4) for i in range(3)])
    assert guess_is_nucleo(nt, MwcRng(1)) is True
    assert guess_is_nucleo(aa, MwcRng(1)) is False
