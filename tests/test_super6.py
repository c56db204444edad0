"""Super6 / UClustPD / ML protein distance tests.

Golden values come from the reference binary (muscle v5.3 built from
/root/reference): `-protdists` on test_data/fa/BB11001 and `-uclustpd`
cluster assignments — regenerate with tools in .claude/skills/verify.
"""

import numpy as np
import pytest

from muscle_tpu.alphabet import ALPHA_AMINO
from muscle_tpu.ops.nw import (VITERBI_GAP_EXT, VITERBI_GAP_OPEN,
                               nw_align_batch, path_match_pairs)
from muscle_tpu.ops.sw import BLOSUM62_21
from muscle_tpu.pipeline.posteriors import encode_batch, round_up
from muscle_tpu.sequence import MultiSequence, Sequence
from muscle_tpu.tree.protdist import (pair_counts_from_match_pairs,
                                      prot_dists_from_counts)

BB11001 = "/root/reference/test_data/fa/BB11001"

# reference binary: muscle -protdists BB11001 (label-pair order i>j)
REF_PROTDISTS = {
    ("1j46_A", "1aab_"): 1.188,
    ("1k99_A", "1aab_"): 1.314,
    ("1k99_A", "1j46_A"): 1.406,
    ("2lef_A", "1aab_"): 1.339,
    ("2lef_A", "1j46_A"): 1.42,
    ("2lef_A", "1k99_A"): 1.406,
}


def _naive_nw(a, b, S, open_, ext):
    la, lb = len(a), len(b)
    NEG = -1e30
    M = np.full((la + 1, lb + 1), NEG)
    D = np.full((la + 1, lb + 1), NEG)
    I = np.full((la + 1, lb + 1), NEG)
    M[0, 0] = 0
    for j in range(1, lb + 1):
        I[0, j] = max(M[0, j - 1] + open_, I[0, j - 1] + ext)
    for i in range(1, la + 1):
        D[i, 0] = max(M[i - 1, 0] + open_, D[i - 1, 0] + ext)
        for j in range(1, lb + 1):
            M[i, j] = max(M[i - 1, j - 1], D[i - 1, j - 1],
                          I[i - 1, j - 1]) + S[a[i - 1], b[j - 1]]
            D[i, j] = max(M[i - 1, j] + open_, D[i - 1, j] + ext)
            I[i, j] = max(M[i, j - 1] + open_, I[i, j - 1] + ext)
    return max(M[la, lb], D[la, lb], I[la, lb])


def test_nw_viterbi_matches_naive_and_path_consistent():
    rng = np.random.default_rng(0)
    letters = list("ACDEFGHIKLMNPQRSTVWY")
    seqs = [Sequence(f"s{k}", "".join(rng.choice(letters,
                                                 rng.integers(5, 40))))
            for k in range(6)]
    codes, lens = encode_batch(seqs, ALPHA_AMINO, pad_to=round_up(40, 8))
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    res = nw_align_batch(codes, lens, pairs, batch_size=4)
    for (sc, path), (i, j) in zip(res, pairs):
        a, b = codes[i][:lens[i]], codes[j][:lens[j]]
        assert abs(sc - _naive_nw(a, b, BLOSUM62_21, VITERBI_GAP_OPEN,
                                  VITERBI_GAP_EXT)) < 1e-3
        assert sum(c in "MD" for c in path) == lens[i]
        assert sum(c in "MI" for c in path) == lens[j]
        # path rescoring reproduces the DP optimum
        ps, x, y, prev = 0.0, 0, 0, None
        for c in path:
            if c == "M":
                ps += BLOSUM62_21[a[x], b[y]]
                x += 1
                y += 1
            else:
                ps += VITERBI_GAP_OPEN if prev != c else VITERBI_GAP_EXT
                if c == "D":
                    x += 1
                else:
                    y += 1
            prev = c
        assert abs(ps - sc) < 1e-3


def test_protdists_match_reference_binary():
    from muscle_tpu.pipeline.uclustpd import ProtDistCalc
    seqs = MultiSequence.from_fasta(BB11001, strip_gaps=True)
    calc = ProtDistCalc(seqs)
    idx = {s.label: i for i, s in enumerate(seqs)}
    pairs = [(idx[a], idx[b]) for (a, b) in REF_PROTDISTS]
    d = calc.dists(pairs)
    for k, (key, want) in enumerate(REF_PROTDISTS.items()):
        assert d[k] == pytest.approx(want, abs=5e-4), key


def test_protdist_identical_seqs_hits_epsilon():
    codes = np.arange(20)
    counts = pair_counts_from_match_pairs(
        codes, codes, [(k, k) for k in range(20)])
    d = prot_dists_from_counts(counts[None])
    assert d[0] == pytest.approx(1e-05)


def test_protdist_no_overlap_returns_minus_one():
    d = prot_dists_from_counts(np.zeros((1, 20, 20)))
    assert d[0] == -1.0


def test_uclustpd_partition_invariants():
    from muscle_tpu.pipeline.uclustpd import ProtDistCalc, UClustPD
    seqs = MultiSequence.from_fasta(BB11001, strip_gaps=True)
    calc = ProtDistCalc(seqs)
    uc = UClustPD(calc, seeds_per_iter=2)
    clusters = uc.run(list(range(len(seqs))), 1.3)
    flat = sorted(i for cl in clusters for i in cl)
    assert flat == list(range(len(seqs)))          # exact partition
    # every centroid is the first member of its cluster
    for ci, cl in enumerate(clusters):
        assert uc.centroid_seq_indexes[ci] == cl[0]
    # BB11001 at maxpd 1.3: 1aab_/1j46_ pair within 1.188, others beyond
    # (see REF_PROTDISTS): first cluster holds the two close sequences
    assert len(clusters[0]) == 2


def test_super6_end_to_end_small():
    from muscle_tpu.hmm.params import HMMParams
    from muscle_tpu.pipeline.super6 import Super6
    seqs = MultiSequence.from_fasta(BB11001, strip_gaps=True)
    hp = HMMParams.from_defaults(nucleo=False)
    s6 = Super6(refine_iters=2, seeds_per_iter=2)
    msa = s6.run(seqs, hp, ALPHA_AMINO)
    assert sorted(s.label for s in msa) == sorted(s.label for s in seqs)
    cc = msa.col_count()
    assert all(len(s) == cc for s in msa)
    # rows ungap back to the inputs
    orig = {s.label: s.copy_delete_gaps().text() for s in seqs}
    for s in msa:
        assert s.copy_delete_gaps().text() == orig[s.label]
