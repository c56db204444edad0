"""Device-side refinement joins (pipeline/devjoin.py) vs the host path.

The device joiner reformulates BuildPost as densify + one-hot MXU
contractions and runs the MEA direction DP on device; these tests pin
the produced ALIGNMENTS (not intermediate floats — f32 summation order
legitimately differs) against the host CSR walk + native MEA on the
same posteriors.
"""

import os

import numpy as np
import pytest


def _family(n=16, lo=60, hi=110, seed=3):
    from muscle_tpu.sequence import MultiSequence, Sequence
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 20, size=hi)
    aas = b"ARNDCQEGHILKMFPSTWYV"
    seqs = MultiSequence()
    for i in range(n):
        ln = int(rng.integers(lo, hi + 1))
        mut = base[:ln].copy()
        nmut = int(rng.integers(0, ln // 3))
        pos = rng.integers(0, ln, size=nmut)
        mut[pos] = rng.integers(0, 20, size=nmut)
        seqs.add(Sequence(f"s{i}", bytes(aas[c] for c in mut)))
    return seqs


def _align(seqs, flag):
    from muscle_tpu.pipeline.mpc import align
    os.environ["MUSCLE_TPU_DEVICE_REFINE"] = flag
    try:
        return align(seqs, refine_iters=12)
    finally:
        del os.environ["MUSCLE_TPU_DEVICE_REFINE"]


def test_device_refine_matches_host():
    seqs = _family()
    host = _align(seqs, "0")
    dev = _align(seqs, "1")
    assert host.labels() == dev.labels()
    for a, b in zip(host, dev):
        assert a.bytes_view().tobytes() == b.bytes_view().tobytes(), \
            a.label


def test_pprog_device_join_matches_host():
    """PProg's sampled-pair device join (align_sampled_device) vs the
    host CSR accumulate + native MEA, on real posteriors, forcing both
    paths via the env knob."""
    from muscle_tpu.alphabet import ALPHA_AMINO
    from muscle_tpu.hmm.params import HMMParams
    from muscle_tpu.pipeline.pairwise import PairAligner
    from muscle_tpu.pipeline.pprog import PProg
    from muscle_tpu.sequence import MultiSequence
    from muscle_tpu.utils.rng import MwcRng

    seqs = _family(n=12, seed=9)
    pack = HMMParams.from_defaults().to_scores()
    aligner = PairAligner(list(seqs), pack, ALPHA_AMINO)
    l2g = {s.label: i for i, s in enumerate(seqs)}
    msas = [MultiSequence([s]) for s in seqs]
    out = {}
    for flag in ("0", "1"):
        os.environ["MUSCLE_TPU_DEVICE_REFINE"] = flag
        try:
            pp = PProg(aligner, l2g, target_pair_count=2000,
                       rng=MwcRng(1))
            out[flag] = pp.run(list(msas))
        finally:
            del os.environ["MUSCLE_TPU_DEVICE_REFINE"]
    a, b = out["0"], out["1"]
    assert a.labels() == b.labels()
    for x, y in zip(a, b):
        assert x.bytes_view().tobytes() == y.bytes_view().tobytes(), \
            x.label


@pytest.mark.parametrize("flag", ["0", "1"])
def test_pprog_pipelined_guide_tree_matches_serial(flag):
    """run_guide_tree's prefetch pipeline (pre-sampled RNG stream +
    async store dispatch) must be byte-identical to the serial
    sample-at-join loop, on both the host and device join paths."""
    from muscle_tpu.alphabet import ALPHA_AMINO
    from muscle_tpu.hmm.params import HMMParams
    from muscle_tpu.pipeline.pairwise import PairAligner
    from muscle_tpu.pipeline.pprog import PProg, align_msas_by_path
    from muscle_tpu.sequence import MultiSequence
    from muscle_tpu.utils.rng import MwcRng

    seqs = _family(n=10, seed=11)
    pack = HMMParams.from_defaults().to_scores()
    aligner = PairAligner(list(seqs), pack, ALPHA_AMINO)
    l2g = {s.label: i for i, s in enumerate(seqs)}
    msas = [MultiSequence([s]) for s in seqs]
    # an unbalanced join order exercising reuse of internal nodes
    idx1 = [0, 1, 10, 11, 4, 5, 12, 14, 8]
    idx2 = [3, 2, 6, 7, 13, 9, 15, 16, 17]

    os.environ["MUSCLE_TPU_DEVICE_REFINE"] = flag
    try:
        # serial oracle: the pre-pipeline loop (sample at join time)
        pps = PProg(aligner, l2g, target_pair_count=6, rng=MwcRng(1))
        nodes = list(msas)
        for k in range(len(idx1)):
            m1, m2 = nodes[idx1[k]], nodes[idx2[k]]
            _, path = pps.path_msas(m1, m2)
            nodes.append(align_msas_by_path(m1, m2, path))
        serial = nodes[-1]

        ppp = PProg(aligner, l2g, target_pair_count=6, rng=MwcRng(1))
        piped = ppp.run_guide_tree(list(msas), idx1, idx2)
    finally:
        del os.environ["MUSCLE_TPU_DEVICE_REFINE"]
    assert serial.labels() == piped.labels()
    for a, b in zip(serial, piped):
        assert a.bytes_view().tobytes() == b.bytes_view().tobytes(), \
            a.label


def test_joiner_align_matches_align_alns():
    """Single-join check on real MPC posteriors, including the
    transposed-orientation grid."""
    from muscle_tpu.alphabet import ALPHA_AMINO
    from muscle_tpu.hmm.params import HMMParams
    from muscle_tpu.pipeline import posteriors as post_mod
    from muscle_tpu.pipeline.devjoin import DeviceJoiner
    from muscle_tpu.pipeline.progressive import align_alns
    from muscle_tpu.sequence import MultiSequence

    seqs = _family(n=10, seed=5)
    pack = HMMParams.from_defaults().to_scores()
    n = len(seqs)
    pairs = [(x, y) for x in range(n) for y in range(x + 1, n)]
    codes, lens = post_mod.encode_batch(seqs, ALPHA_AMINO, pad_to=128)
    sv, sc, ea, max_nnz = post_mod.all_pairs_posteriors_sparse(
        codes, lens, pack, pairs, batch_size=len(pairs))
    l2i = {s.label: i for i, s in enumerate(seqs)}
    posts = post_mod.posts_from_store(sv, sc, pairs, lens, 128)
    joiner = DeviceJoiner(sv, sc, pairs, lens, n,
                          min(int(max_nnz), 32), l2i)

    # align first (host path), then split the alignment like a refine
    # iteration — interleaved so both grid orientations carry real pairs
    from muscle_tpu.pipeline.mpc import align as mpc_align
    os.environ["MUSCLE_TPU_DEVICE_REFINE"] = "0"
    try:
        msa = mpc_align(seqs, refine_iters=2)
    finally:
        del os.environ["MUSCLE_TPU_DEVICE_REFINE"]
    by_label = {s.label: s for s in msa}
    rows = [by_label[s.label] for s in seqs]
    m1 = MultiSequence([rows[i] for i in range(0, n, 2)]).project(
        list(range((n + 1) // 2)))
    m2 = MultiSequence([rows[i] for i in range(1, n, 2)]).project(
        list(range(n // 2)))
    host_msa, host_score = align_alns(m1, m2, l2i, posts)
    dev_score, dev_path = joiner.align(m1, m2)
    from muscle_tpu.pipeline.progressive import join_by_path
    dev_msa = join_by_path(m1, m2, dev_path)
    assert abs(host_score - dev_score) < 1e-2 * max(1.0, abs(host_score))
    for a, b in zip(host_msa, dev_msa):
        assert a.bytes_view().tobytes() == b.bytes_view().tobytes(), \
            a.label
