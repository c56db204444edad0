"""Super5 components: k-mer index, UClust, TransAln, consensus, PProg."""

import os
import subprocess

import numpy as np
import pytest

from muscle_tpu.alphabet import ALPHA_AMINO, encode
from muscle_tpu.hmm.params import HMMParams
from muscle_tpu.pipeline.pairwise import PairAligner
from muscle_tpu.pipeline.transaln import (
    make_tpath1, make_extended_msa)
from muscle_tpu.pipeline.uclust import KmerIndex, UClust
from muscle_tpu.pipeline.super4 import consensus_sequence
from muscle_tpu.sequence import MultiSequence, Sequence

REF_BIN = "/tmp/refbuild/muscle"


@pytest.fixture(scope="module")
def pack():
    return HMMParams.from_defaults().to_scores()


def _codes(s):
    return encode(np.frombuffer(s.encode(), dtype=np.uint8), ALPHA_AMINO)


def test_kmer_index_finds_similar():
    idx = KmerIndex(ALPHA_AMINO)
    s1 = "MKVLITGGAGFIGSHLVDELLRRGHEVIVLDNLS"
    s2 = "MKVLITGGAGFIGSHLVDRLLRRGHEVIVLDNLS"   # 1 mutation
    s3 = "WWWWYYYYPPPPHHHHHCCCCCDDDDDEEEEE"
    idx.add(_codes(s1), 0)
    idx.add(_codes(s3), 2)
    hits = idx.search(_codes(s2))
    assert hits and hits[0][0] == 0


def test_kmer_index_wildcards_skipped():
    idx = KmerIndex(ALPHA_AMINO)
    idx.add(_codes("MKXXXVL"), 0)   # Xs kill most words
    hits = idx.search(_codes("MKWWWVL"))
    assert hits == []  # no shared valid word above threshold


def test_uclust_groups_identical_families(pack):
    fam1 = "MKVLITGGAGFIGSHLVDELLRRGHEVIVLDNLSTGKKENL"
    fam2 = "WQERTYPHASDNGKLIVMFCWQERTYPHASDNGKLIVMFC"
    seqs = MultiSequence([
        Sequence("a1", fam1), Sequence("a2", fam1[:-1] + "I"),
        Sequence("b1", fam2), Sequence("b2", fam2[:-1] + "A")])
    aligner = PairAligner(seqs, pack, ALPHA_AMINO)
    uc = UClust(aligner, ALPHA_AMINO)
    cents, seq2cent, paths = uc.run(seqs, min_ea=0.9)
    assert len(cents) == 2
    # members map to a centroid of their own family
    labels = seqs.labels()
    for i in range(4):
        ci = int(seq2cent[i])
        assert labels[i][0] == labels[ci][0]


def test_tpath1_basic():
    # fresh "AB" vs ungapped row "AB" embedded in MSA row "A-B" (gap col)
    assert make_tpath1("BB", "MGM") == "FgF"
    # insert in fresh
    assert make_tpath1("BXB", "MM") == "FIF"
    # gap in fresh
    assert make_tpath1("BYB", "MMM") == "FGF"


def test_make_extended_msa_simple():
    msa = MultiSequence([Sequence("c1", "AC-D"), Sequence("c2", "ACED")])
    # fresh aligns to ungapped c1 = "ACD" with one insert after C
    fresh = [Sequence("f1", "ACWD")]
    # pw path fresh(X) vs c1-ungapped(Y): B B X B
    ext = make_extended_msa(msa, fresh, [0], ["BBXB"])
    rows = {s.label: s.text() for s in ext}
    assert len(rows["c1"]) == len(rows["f1"])
    # all original letters preserved
    assert rows["c1"].replace("-", "") == "ACD"
    assert rows["c2"].replace("-", "") == "ACED"
    assert rows["f1"].replace("-", "") == "ACWD"
    # f1's W must sit in a column where c1 has a gap
    wcol = rows["f1"].index("W")
    assert rows["c1"][wcol] == "-"


@pytest.mark.skip(reason="reference cmd_transaln dies standalone (empty "
                  "global seq registry); TransAln is covered by the "
                  "invariant tests + super5 end-to-end accuracy")
def test_transaln_matches_reference_binary(tmp_path, pack):
    """Feed identical pairwise paths by using near-identical sequences,
    compare the whole extended MSA to the reference -transaln output."""
    ref_msa = MultiSequence([
        Sequence("r1", "MKVLITGG-AGFIGSHLVDELLRA"),
        Sequence("r2", "MKVLITGGKAGFIGSHLVDELLRA")])
    fresh = MultiSequence([
        Sequence("x1", "MKVLITGGAGFWIGSHLVDELLRA"),   # insert W
        Sequence("x2", "MKVLITGGKAGFIGSHLVDELRA")])   # deletion
    # cmd_transaln resolves pairwise alignments through the global input
    # registry, so the ref rows (ungapped) must also be input sequences;
    # they become extra "fresh" rows aligned to themselves round-robin.
    ungapped = [s.copy_delete_gaps() for s in ref_msa]
    all_fresh = list(fresh) + ungapped
    ref_path = tmp_path / "ref.afa"
    in_path = tmp_path / "in.fa"
    out_path = tmp_path / "out.afa"
    ref_msa.write_fasta(str(ref_path))
    MultiSequence(all_fresh).write_fasta(str(in_path))
    subprocess.run(
        [REF_BIN, "-transaln", str(in_path), "-ref", str(ref_path),
         "-output", str(out_path), "-quiet"],
        check=True, capture_output=True)
    want = [(s.label, s.text())
            for s in MultiSequence.from_fasta(str(out_path))]

    # my side: same round-robin mapping, my pairwise paths
    pool = MultiSequence(
        [Sequence(f"f{k}", s.bytes_view()) for k, s in enumerate(all_fresh)]
        + [Sequence(f"u{k}", u.bytes_view()) for k, u in enumerate(ungapped)])
    aligner = PairAligner(pool, pack, ALPHA_AMINO)
    nf = len(all_fresh)
    paths = [aligner.align_pair(k, nf + (k % 2))[1] for k in range(nf)]
    ext = make_extended_msa(ref_msa, all_fresh,
                            [k % 2 for k in range(nf)], paths)
    got = [(s.label, s.text()) for s in ext]
    assert got == want


def test_consensus_sequence():
    msa = MultiSequence([Sequence("a", "AC-D"), Sequence("b", "ACED"),
                         Sequence("c", "AC-D")])
    # col 2 is majority-gap -> dropped
    assert consensus_sequence(msa, ALPHA_AMINO) == "ACD"


def test_super5_small_end_to_end(pack):
    """Super5 on a small family must reproduce all input sequences."""
    from muscle_tpu.pipeline.super5 import Super5
    from muscle_tpu.hmm.params import HMMParams
    base = "MKVLITGGAGFIGSHLVDELLRRGHEVIVLDNLSTGKKENLP"
    seqs = MultiSequence([
        Sequence("s0", base),
        Sequence("s1", base),                      # dupe
        Sequence("s2", base[:-1] + "A"),           # near-dupe (member)
        Sequence("s3", base[:20] + "W" + base[20:]),
        Sequence("s4", "WQERTYPHASDNGKLIVMFCWQERTYPHASDNGKLIVMFC"),
    ])
    hp = HMMParams.from_defaults()
    s5 = Super5(refine_iters=2)
    msa = s5.run(seqs, hp, ALPHA_AMINO)
    assert sorted(s.label for s in msa) == sorted(s.label for s in seqs)
    assert msa.is_aligned()
    rows = {s.label: s.text() for s in msa}
    for s in seqs:
        assert rows[s.label].replace("-", "") == s.text()
    assert rows["s0"] == rows["s1"]   # dupes identical
