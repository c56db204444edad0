"""Nucleotide end-to-end oracle vs committed reference-binary goldens.

The reference aligns nucleotides with its own HMM parameter set
(src/defaulthmmparams.cpp:243-278) selected by the GuessIsNucleo
heuristic (src/alpha.cpp); tests/data/nt/ holds three synthetic DNA
families (5%/12%/20% substitution + indels, deterministic seed) and
tests/goldens/*.nt.afa the reference binary's alignments of them.

Gate: our `-align` output (alphabet auto-guessed) is column-identical
to the golden, OR agrees with it at Q >= 0.98 / TC >= 0.90 (the golden
itself is the reference for qscore — synthetic families have no
curated BAliBASE-style reference). Covers the full nt path: alphabet
guess, nt HMM defaults, encode, MPC. reference:
src/defaulthmmparams.cpp:243, src/alpha.cpp (GuessIsNucleo).
"""

import os

import pytest

from muscle_tpu.sequence import MultiSequence

DATA = os.path.join(os.path.dirname(__file__), "data", "nt")
GOLDEN = os.path.join(os.path.dirname(__file__), "goldens")

FAMILIES = ["nt1", "nt2", "nt3"]


@pytest.mark.parametrize("fam", FAMILIES)
def test_nt_align(fam):
    from muscle_tpu.alphabet import guess_is_nucleo
    from muscle_tpu.pipeline.mpc import align
    from muscle_tpu.utils.rng import MwcRng

    seqs = MultiSequence.from_fasta(f"{DATA}/{fam}.fa")
    assert guess_is_nucleo(seqs, MwcRng(1)), \
        "GuessIsNucleo must detect DNA"
    msa = align(seqs)

    golden = MultiSequence.from_fasta(f"{GOLDEN}/{fam}.nt.afa")
    gold = {s.label: s.text() for s in golden}
    mine = {s.label: s.text() for s in msa}
    assert set(mine) == set(gold)
    # all three families have established column-identity to the
    # reference binary (docs/PARITY.md) — pinned, no score fallback
    # (VERDICT r4: an unpinned gate can silently degrade to
    # score-parity)
    assert mine == gold, \
        f"{fam}: diverged from established column-identity"
