"""Full BAliBASE RV11 end-to-end suite vs committed reference goldens.

Marked `slow` (excluded from the default pytest run — see pyproject):
runs the complete MPC pipeline on all 7 families, sequences and
structures, ~minutes on CPU. Run with `pytest -m slow`.

Gate per workload: output is column-identical to the committed
reference-binary golden (tests/goldens/), OR scores at least the
published golden Q/TC (reference: test_scripts/check_results.py:37-51
enforces only >= 0.7x; equality is stricter).
"""

import os

import pytest

from muscle_tpu.qscore import qscore
from muscle_tpu.sequence import MultiSequence, Sequence

FA_DIR = "/root/reference/test_data/fa"
MEGA_DIR = "/root/reference/test_data/mega"
REF_DIR = "/root/reference/test_data/ref_alns"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

GOLDEN_SEQ = {
    "BB11001": (1.000, 1.000), "BB11002": (0.611, 0.000),
    "BB11004": (0.674, 0.500), "BB11005": (0.568, 0.170),
    "BB11006": (0.561, 0.375), "BB11007": (0.837, 0.662),
    "BB11009": (0.758, 0.700),
}
GOLDEN_MEGA = {
    "BB11001": (0.985, 0.982), "BB11002": (0.838, 0.353),
    "BB11004": (0.812, 0.685), "BB11005": (0.754, 0.455),
    "BB11006": (0.683, 0.500), "BB11007": (0.925, 0.768),
    "BB11009": (0.764, 0.617),
}

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(FA_DIR), reason="reference test_data not available")

FAMILIES = sorted(GOLDEN_SEQ)


# workloads with established column-identity to the reference binary —
# these must stay bit-identical, no score fallback allowed (all 13
# currently-identical workloads pinned per VERDICT r4: without the pin
# a numerics change could silently degrade them to score-parity).
# BB11005 (both tiers) is the lone score-parity workload — see
# docs/PARITY.md "BB11005 divergence analysis".
IDENTICAL_REQUIRED = {
    f"{fam}.{kind}.afa"
    for fam in ("BB11001", "BB11002", "BB11004", "BB11006",
                "BB11007", "BB11009")
    for kind in ("seq", "mega")
}


def _check(msa, fam, golden_file, gq, gtc, by_sequence=False):
    """Golden gate. Branch 1: column-identical to the committed
    reference-binary output. Branch 2 (score parity): Q/TC at least the
    committed golden MSA's OWN score vs the BAliBASE reference — NOT
    the 3-decimal published table values, which round up (e.g. the
    reference's BB11005 structure output scores Q=0.753788, published
    as 0.754; gating on the rounded value rejects runs that match the
    reference's own quality exactly). Published values
    (check_results.py:37-51) are asserted as documentation at 1e-3.
    Returns which branch passed for the parity ledger."""
    golden_msa = MultiSequence.from_fasta(f"{GOLDEN_DIR}/{golden_file}")
    gold = {s.label: s.text() for s in golden_msa}
    mine = {s.label: s.text() for s in msa}
    if mine == gold:
        return "identical"
    assert golden_file not in IDENTICAL_REQUIRED, (
        f"{fam}: column-identity to the reference binary is established "
        f"for this workload but the output diverged")
    ref = MultiSequence.from_fasta(f"{REF_DIR}/{fam}")
    q, tc = qscore(msa, ref, by_sequence=by_sequence)
    q_gold, tc_gold = qscore(golden_msa, ref, by_sequence=by_sequence)
    # sanity: the committed golden matches the published table at the
    # table's own precision
    assert abs(q_gold - gq) < 1.5e-3 and abs(tc_gold - gtc) < 1.5e-3
    assert q >= q_gold - 1e-6 and tc >= tc_gold - 1e-6, (
        f"{fam}: not column-identical and Q/TC {q:.6f}/{tc:.6f} below "
        f"the reference output's own {q_gold:.6f}/{tc_gold:.6f}")
    return "score-parity"


def _record(workload: str, branch: str) -> None:
    """Parity ledger: which gate branch each golden workload passed.
    Always printed (visible with -rA/-s); appended to
    $MUSCLE_TPU_PARITY_LEDGER when set (docs/PARITY.md generation)."""
    print(f"PARITY {workload}: {branch}")
    path = os.environ.get("MUSCLE_TPU_PARITY_LEDGER")
    if path:
        with open(path, "a") as f:
            f.write(f"{workload}\t{branch}\n")


@pytest.mark.slow
@needs_testdata
@pytest.mark.parametrize("fam", FAMILIES)
def test_balibase_seq(fam):
    from muscle_tpu.pipeline.mpc import align
    msa = align(MultiSequence.from_fasta(f"{FA_DIR}/{fam}"))
    gq, gtc = GOLDEN_SEQ[fam]
    _record(f"{fam}.seq", _check(msa, fam, f"{fam}.seq.afa", gq, gtc))


@pytest.mark.slow
@needs_testdata
@pytest.mark.parametrize("fam", FAMILIES)
def test_balibase_mega(fam):
    from muscle_tpu.io.mega import parse_mega
    from muscle_tpu.pipeline.mpc import align
    mega = parse_mega(f"{MEGA_DIR}/{fam}.mega")
    seqs = MultiSequence([Sequence(lb, sq)
                          for lb, sq in zip(mega.labels, mega.seqs)])
    msa = align(seqs, mega=mega)
    gq, gtc = GOLDEN_MEGA[fam]
    _record(f"{fam}.mega",
            _check(msa, fam, f"{fam}.mega.afa", gq, gtc,
                   by_sequence=True))


@pytest.mark.slow
@needs_testdata
def test_bb11005_exact_assoc_column_identical():
    """BB11005 — the one workload the fast tree-scan kernels cannot make
    column-identical (docs/PARITY.md "BB11005 divergence analysis") —
    IS identical under MUSCLE_TPU_EXACT_ASSOC=1, which replays the
    reference binary's sequential LOG_ADD association (the forward and
    backward lattices are then bit-identical to the binary's). 14/14
    column-identity holds with the flag; the fast path keeps 13/14 +
    score-parity. Subprocess: the flag is read at import."""
    import subprocess
    import sys
    script = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["MUSCLE_TPU_EXACT_ASSOC"] = "1"
sys.path.insert(0, %r)
import jax
jax.config.update("jax_platforms", "cpu")
from muscle_tpu.sequence import MultiSequence
from muscle_tpu.pipeline.mpc import align
msa = align(MultiSequence.from_fasta(%r))
gold = {s.label: s.text() for s in MultiSequence.from_fasta(%r)}
mine = {s.label: s.text() for s in msa}
assert gold == mine, "exact-assoc BB11005 not column-identical"
print("OK identical")
""" % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
       f"{FA_DIR}/BB11005", f"{GOLDEN_DIR}/BB11005.seq.afa")
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True, timeout=2700)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "OK identical" in r.stdout
    _record("BB11005.seq[exact-assoc]", "identical")
