"""Smoke tests for the Muscle3 benchmark sweep tools.

reference: src/cmd_bench.cpp (-bench / -bench_blosums), src/sweep.cpp
(-sweep grid search), src/spatter.cpp (-spatter shrink search). These
are developer tools; the tests verify the commands run end-to-end on a
small bench directory and report sane Q/TC.
"""

import os

import pytest

from muscle_tpu.pipeline.bench3 import (Bench3, parse_grid_spec, run_bench,
                                        run_bench_blosums, run_spatter,
                                        run_sweep)
from muscle_tpu.pipeline.muscle3 import M3Params

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture()
def bench_dir(tmp_path):
    """A names file + refdir with two small reference MSAs."""
    names = ["BB11001.afa", "BB11002.afa"]
    for name in names:
        src = os.path.join(GOLDEN_DIR, name.replace(".afa", ".seq.afa"))
        with open(src) as f:
            (tmp_path / name).write_text(f.read())
    names_file = tmp_path / "names.txt"
    names_file.write_text("".join(n + "\n" for n in names))
    return str(names_file), str(tmp_path)


def test_bench_load_and_run(bench_dir):
    names_file, ref_dir = bench_dir
    b = Bench3.load(names_file, ref_dir)
    assert len(b.inputs) == 2
    # inputs are gap-stripped copies of the refs
    assert all(not any("-" in s.text() for s in ms) for ms in b.inputs)
    b.run(M3Params())
    # re-aligning a reference MSA from scratch should stay respectable
    assert b.mean_q > 0.5
    assert 0.0 <= b.mean_tc <= 1.0


def test_cmd_bench(bench_dir, tmp_path):
    names_file, ref_dir = bench_dir
    tsv = tmp_path / "tcs.tsv"
    q, tc, n = run_bench(names_file,
                         {"refdir": ref_dir, "tsvout": str(tsv)})
    assert n == 2 and q > 0.5
    assert len(tsv.read_text().strip().splitlines()) == 2


def test_parse_grid_spec():
    names, goods, los, his, sizes = parse_grid_spec(
        "gapopen,-6,-8,-4,3/center,0.8,0.4,1.2,3")
    assert names == ["gapopen", "center"]
    assert goods == [-6.0, 0.8]
    assert los == [-8.0, 0.4] and his == [-4.0, 1.2]
    assert sizes == [3, 3]
    # '-' in the first good disables goods
    _, goods2, _, _, _ = parse_grid_spec("gapopen,-,-8,-4,3")
    assert goods2 == []


def test_sweep_grid(bench_dir, capsys):
    names_file, ref_dir = bench_dir
    results, best = run_sweep(
        names_file,
        {"refdir": ref_dir, "gridspec": "gapopen,-6,-7,-5,2"},
        out=lambda *_: None)
    assert len(results) == 2          # full 2-point grid
    assert best[3] is not None and best[2] >= 0.0


def test_bench_blosums_rows(bench_dir):
    names_file, ref_dir = bench_dir
    # restrict to one seed's worth by monkey-scope: full loop is 6x4x4
    # = 96 Muscle3 runs; on the 2-case bench that is still quick, but
    # keep the smoke test to the structure of the first rows.
    rows = run_bench_blosums(names_file, {"refdir": ref_dir},
                             out=lambda *_: None)
    assert len(rows) == 96
    pcts = {r[0] for r in rows}
    assert pcts == {90, 80, 70, 62}
    assert all(0.0 <= r[2] <= 1.0 for r in rows)


def test_spatter(bench_dir):
    names_file, ref_dir = bench_dir
    best, (q, tc) = run_spatter(
        names_file,
        {"refdir": ref_dir, "gridspec": "gapopen,-6,-8,-4,3",
         "warmup_pct": "50", "maxiters": "2", "maxfailiters": "1",
         "triesperiter": "2", "shrink": "0.6"},
        out=lambda *_: None)
    assert -8.0 <= best[1][0] <= -4.0
    assert q > 0.4


def test_savedir_dumps_joins(tmp_path):
    """-savedir writes every PProg join MSA (reference:
    src/pprog.cpp:354-363)."""
    from muscle_tpu.pipeline import pprog
    from muscle_tpu.sequence import MultiSequence, Sequence

    out = tmp_path / "joins"
    pprog.SAVE_DIR = str(out)
    try:
        pprog._save_join(MultiSequence([Sequence("a", "ACDE")]), 0)
    finally:
        pprog.SAVE_DIR = None
    assert (out / "join0").exists()
