"""CLI end-to-end through subprocess (the real user surface)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FA = "/root/reference/test_data/fa/BB11001"
REF = "/root/reference/test_data/ref_alns/BB11001"

needs_testdata = pytest.mark.skipif(
    not os.path.exists(FA), reason="no reference test data")


def run_cli(*args, timeout=1200):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "muscle_tpu.cli", *args],
        capture_output=True, text=True, timeout=timeout, env=env)


def test_usage():
    r = run_cli()
    assert "muscle-tpu" in r.stdout


def test_bad_option_errors():
    r = run_cli("-align")
    assert r.returncode != 0   # missing -output
    r = run_cli("-bogus_flag")
    assert r.returncode != 0


@needs_testdata
def test_align_and_qscore(tmp_path):
    out = tmp_path / "out.afa"
    r = run_cli("-align", FA, "-output", str(out), "-refineiters", "2")
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
    r = run_cli("-qscore", str(out), "-ref", REF)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Q=" in r.stdout and "TC=" in r.stdout
    q = float(r.stdout.split("Q=")[1].split(",")[0])
    assert q >= 0.7


@needs_testdata
def test_replicates_efa_and_analytics(tmp_path):
    efa = tmp_path / "ens.efa"
    r = run_cli("-align", FA, "-output", str(efa),
                "-replicates", "2", "-refineiters", "1")
    assert r.returncode == 0, r.stderr[-2000:]
    text = efa.read_text()
    assert text.startswith("<none.0")
    assert "<abc.1" in text

    r = run_cli("-disperse", str(efa))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "@disperse" in r.stdout

    best = tmp_path / "best.afa"
    r = run_cli("-maxcc", str(efa), "-output", str(best))
    assert r.returncode == 0, r.stderr[-2000:]
    assert best.exists()

    conf = tmp_path / "conf.efa"
    r = run_cli("-addconfseq", str(efa), "-output", str(conf))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "_conf_" in conf.read_text()

    rs = tmp_path / "resampled.efa"
    r = run_cli("-resample", str(efa), "-output", str(rs),
                "-replicates", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    assert rs.read_text().count("<resampled.") == 3


@needs_testdata
def test_guidetree_roundtrip(tmp_path):
    tree = tmp_path / "t.nwk"
    out = tmp_path / "o.afa"
    r = run_cli("-align", FA, "-output", str(out), "-refineiters", "0",
                "-guidetreeout", str(tree))
    assert r.returncode == 0, r.stderr[-2000:]
    assert tree.exists() and ";" in tree.read_text()
    r = run_cli("-align", FA, "-output", str(out), "-refineiters", "0",
                "-guidetreein", str(tree))
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
