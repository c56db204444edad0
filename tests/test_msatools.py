import numpy as np

from muscle_tpu.msatools import (core_blocks, make_a2m, relabel,
                                 squeeze_inserts, strip_gappy_cols,
                                 strip_gappy_rows, trim_to_ref)
from muscle_tpu.sequence import MultiSequence, Sequence


def _msa():
    return MultiSequence([
        Sequence("a", "MK-VL-"),
        Sequence("b", "MKQVL-"),
        Sequence("c", "MK-VLW"),
        Sequence("d", "------"),
    ])


def test_strip_gappy_cols():
    out = strip_gappy_cols(_msa(), 0.5)
    # cols 2 and 5 have 3/4 gaps (row d is all-gap) -> dropped
    assert out[0].text() == "MKVL"
    assert out.col_count() == 4


def test_strip_gappy_rows():
    out = strip_gappy_rows(_msa(), 0.5)
    assert out.labels() == ["a", "b", "c"]


def test_relabel():
    out = relabel(_msa(), {"a": "alpha", "c": "gamma"})
    assert out.labels() == ["alpha", "b", "gamma", "d"]


def test_trim_to_ref():
    ref = MultiSequence([Sequence("a", "MKVL"), Sequence("c", "MKVLW")])
    out = trim_to_ref(_msa(), ref)
    assert out.labels() == ["a", "c"]
    # all-gap column (old col 2) removed
    assert out[0].text() == "MK-VL-"[:2] + "VL-"


def test_make_a2m():
    out = make_a2m(_msa(), 0.5)
    # cols 2 and 5 are insert columns (75% gaps with the all-gap row)
    assert out[0].text() == "MKVL"
    assert out[1].text() == "MKqVL"
    assert out[2].text() == "MKVLw"


def test_squeeze_inserts():
    msa = MultiSequence([
        Sequence("a", "MK--WVL"),
        Sequence("b", "MK-Q-VL"),
        Sequence("c", "MK---VL"),
    ])
    out = squeeze_inserts(msa, 0.5)
    # gappy run (cols 2-4) packs left; emptied columns dropped
    assert out[0].text() == "MKWVL"
    assert out[1].text() == "MKQVL"
    assert out[2].text() == "MK-VL"


def test_core_blocks():
    msa = MultiSequence([Sequence(f"s{i}", "MKVLITGGAB") for i in range(8)]
                        + [Sequence("gappy", "M---------")])
    blocks = core_blocks(msa, min_cols=8, min_seqs=8)
    assert blocks
    c0, w, r0, nr = blocks[0]
    assert w >= 8 and nr >= 8
