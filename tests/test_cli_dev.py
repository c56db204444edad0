"""Smoke tests for the standalone dev-stage CLI commands
(reference: src/cmds.h surface — cmd_derep, cmd_uclust, cmd_transaln,
cmd_shrub, cmd_swdistmx, cmd_hmmdump, cmd_perturbhmm, cmd_masm_train,
cmd_masm_stats, cmd_swmasm)."""

import os

import pytest

from muscle_tpu.cli import main
from muscle_tpu.sequence import MultiSequence

FA_DIR = "/root/reference/test_data/fa"
MEGA_DIR = "/root/reference/test_data/mega"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(FA_DIR), reason="reference test_data not available")


@needs_testdata
def test_derep_cmd(tmp_path):
    src = f"{FA_DIR}/BB11001"
    dup = tmp_path / "dup.fa"
    base = open(src).read()
    dup.write_text(base + base.replace(">", ">copy_"))
    out = tmp_path / "u.fa"
    assert main(["-derep", str(dup), "-output", str(out),
                 "-quiet"]) == 0
    uniq = MultiSequence.from_fasta(str(out))
    assert len(uniq) == len(MultiSequence.from_fasta(src))


@needs_testdata
def test_uclust_cmd(tmp_path):
    out = tmp_path / "cent.fa"
    assert main(["-uclust", f"{FA_DIR}/BB11001", "-output", str(out),
                 "-minea", "0.99", "-quiet"]) == 0
    cents = MultiSequence.from_fasta(str(out))
    assert 1 <= len(cents) <= 4


@needs_testdata
def test_transaln_cmd(tmp_path):
    # transitively align the family's own ungapped sequences back onto
    # the golden MSA: every input must appear, all rows equal length
    ref = f"{GOLDEN_DIR}/BB11001.seq.afa"
    out = tmp_path / "ext.afa"
    assert main(["-transaln", f"{FA_DIR}/BB11001", "-ref", ref,
                 "-output", str(out), "-quiet"]) == 0
    ext = MultiSequence.from_fasta(str(out))
    assert len(ext) == 8  # 4 MSA rows + 4 fresh
    cols = {len(s.text()) for s in ext}
    assert len(cols) == 1


@needs_testdata
def test_shrub_swdistmx_cmds(tmp_path, capsys):
    tree_path = tmp_path / "t.nwk"
    assert main(["-swdistmx", f"{FA_DIR}/BB11007",
                 "-guidetreeout", str(tree_path), "-quiet"]) == 0
    nwk = open(tree_path).read()
    seqs = MultiSequence.from_fasta(f"{FA_DIR}/BB11007")
    for s in seqs:
        assert s.label.split()[0].split("/")[0] in nwk or s.label in nwk
    assert main(["-shrub", str(tree_path), "-n", "2", "-quiet"]) == 0
    out = capsys.readouterr().out
    assert "shrubs" in out


def test_hmmdump_perturbhmm_cmds(tmp_path, capsys):
    d = tmp_path / "dump"
    assert main(["-hmmdump", str(d), "-quiet"]) == 0
    h2 = (d / "hmm2.tsv").read_text()
    h3 = (d / "hmm3.tsv").read_text()
    assert h2 == h3  # serialization round trip is exact
    sa = (d / "sa.hmm").read_text()
    assert sa and sa != h2
    assert main(["-perturbhmm", "3", "-quiet"]) == 0


@needs_testdata
def test_masm_cmds(tmp_path, capsys):
    masm = tmp_path / "m.masm"
    assert main(["-masm_train", f"{GOLDEN_DIR}/BB11001.mega.afa",
                 "-input", f"{MEGA_DIR}/BB11001.mega",
                 "-output", str(masm), "-label", "bb1", "-quiet"]) == 0
    assert main(["-masm_stats", str(masm), "-quiet"]) == 0
    out = capsys.readouterr().out
    assert "Sequences" in out and "Columns" in out
    tsv = tmp_path / "hits.tsv"
    assert main(["-swmasm", str(masm), "-query",
                 f"{MEGA_DIR}/BB11001.mega",
                 "-output", str(tsv), "-quiet"]) == 0
    lines = [ln for ln in tsv.read_text().splitlines() if ln]
    assert len(lines) == 4 and all(ln.startswith("bb1\t")
                                   for ln in lines)
