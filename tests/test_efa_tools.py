"""EFA utility tests: -efa_bestconf, -efa_bestcols, -colscore_efa,
-qscore_efa, -trimtoref_efa, -eesort, -cmp_msa.

reference: src/efabestconf.cpp, src/efabestcols.cpp, src/colscoreefa.cpp,
src/qscoreefa.cpp, src/trimtorefefa.cpp, src/eesort.cpp,
src/cmd_cmp_msa.cpp.
"""

import numpy as np
import pytest

from muscle_tpu.cli import main as cli_main
from muscle_tpu.pipeline.ensemble import Ensemble
from muscle_tpu.sequence import MultiSequence, Sequence

# three replicates over two sequences; rep1 == rep0, rep2 differs in
# one column pairing
EFA = """\
<rep0
>a
ACD-F
>b
AC-EF
<rep1
>a
ACD-F
>b
AC-EF
<rep2
>a
ACDF
>b
ACEF
"""


@pytest.fixture()
def efa_path(tmp_path):
    p = tmp_path / "ens.efa"
    p.write_text(EFA)
    return str(p)


def test_best_conf_stats_and_median(efa_path):
    ens = Ensemble.from_efa(efa_path)
    stats = ens.best_conf_stats()
    assert len(stats) == 3
    # cols A and C and F appear in all three replicates
    assert stats[0]["n1"] == 3
    assert stats[0]["cols"] == 5
    # rep0/rep1 identical -> higher total conf than rep2
    assert stats[0]["total_conf"] == stats[1]["total_conf"]
    assert stats[2]["total_conf"] < stats[0]["total_conf"]
    assert 0 < stats[0]["median_conf"] <= 1


def test_best_cols_msa_full_confidence_only(efa_path):
    ens = Ensemble.from_efa(efa_path)
    msa = ens.best_cols_msa(min_conf=1.0, max_gap_fract=0.5)
    # exactly the three unanimous columns (A, C, F), every row a letter
    assert msa.col_count() == 3
    assert [s.text() for s in msa] == ["ACF", "ACF"]
    capped = ens.best_cols_msa(min_conf=0.5, max_gap_fract=1.0, max_cols=2)
    assert capped.col_count() == 2


def test_colscore_bins_sum_and_mean_tc(efa_path):
    ens = Ensemble.from_efa(efa_path)
    ref = MultiSequence.from_fasta_text(">a\nACD-F\n>b\nAC-EF\n")
    res = ens.colscore(ref, max_gap_fract=1.0)
    # rep0/rep1 match ref exactly (TC 1), rep2 shares 3 of 5 ref cols
    assert res["mean_tc"] == pytest.approx((1.0 + 1.0 + 3 / 5) / 3)
    total = sum(b["count"] for b in res["bins"])
    assert total == 5 + 5 + 4


def test_cli_efa_tools_roundtrip(efa_path, tmp_path, capsys):
    out = tmp_path / "best.afa"
    assert cli_main(["-efa_bestconf", efa_path, "-output", str(out),
                     "-quiet"]) == 0
    assert out.exists()
    ref = tmp_path / "ref.afa"
    ref.write_text(">a\nACD-F\n>b\nAC-EF\n")
    assert cli_main(["-qscore_efa", efa_path, "-ref", str(ref),
                     "-quiet"]) == 0
    cap = capsys.readouterr().out
    assert "rep0 Q=1.0000" in cap
    trimmed = tmp_path / "trim.efa"
    assert cli_main(["-trimtoref_efa", efa_path, "-ref", str(ref),
                     "-output", str(trimmed), "-quiet"]) == 0
    assert trimmed.read_text().count("<") == 3


def test_cli_cmp_msa_colors_columns(tmp_path):
    test = tmp_path / "t.afa"
    ref = tmp_path / "r.afa"
    test.write_text(">a\nACDF\n>b\nACEF\n")
    ref.write_text(">a\nACD-F\n>b\nAC-EF\n")
    out = tmp_path / "cmp.html"
    assert cli_main(["-cmp_msa", str(test), "-ref", str(ref),
                     "-output", str(out), "-quiet"]) == 0
    html = out.read_text()
    assert html.startswith("<html>")
    assert "background-color:#" in html


def test_cli_eesort_orders_by_ea(tmp_path):
    # db contains the query itself (EA 1) and an unrelated sequence
    q = tmp_path / "q.fa"
    db = tmp_path / "db.fa"
    q.write_text(">q\nMKVLITGGSGFIGSHLVDRLMA\n")
    db.write_text(">near\nMKVLITGGSGFIGSHLVDRLMA\n"
                  ">far\nWWWWPPPPWWWWPPPPWWWW\n")
    out = tmp_path / "sorted.fa"
    tsv = tmp_path / "ee.tsv"
    assert cli_main(["-eesort", str(q), "-db", str(db),
                     "-output", str(out), "-tsvout", str(tsv),
                     "-quiet"]) == 0
    lines = tsv.read_text().splitlines()
    assert lines[0].endswith("near")
    assert lines[1].endswith("far")
    ea0 = float(lines[0].split("\t")[0])
    ea1 = float(lines[1].split("\t")[0])
    assert ea0 > ea1
    labels = [ln[1:] for ln in out.read_text().splitlines()
              if ln.startswith(">")]
    assert labels == ["near", "far"]
