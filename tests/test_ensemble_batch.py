"""Ensemble replicate batching: per-pair-params kernels + batched
driver must be bit-identical to the serial replicate loop.

reference: cmd_align replicate loop (src/align.cpp:150-167); the TPU
re-design batches all replicates' pair grids into one device stream
(muscle_tpu/pipeline/ensemble_batch.py, SURVEY §7 hard-parts).
"""

import io

import numpy as np
import pytest

from muscle_tpu.hmm.params import HMMParams
from muscle_tpu.ops import pairhmm
from muscle_tpu.pipeline import posteriors as post_mod
from muscle_tpu.sequence import MultiSequence, Sequence

RNG = np.random.default_rng(7)
AA = "ACDEFGHIKLMNPQRSTVWY"


def _rand_seqs(n, lo=30, hi=46):
    out = []
    for i in range(n):
        L = int(RNG.integers(lo, hi))
        out.append(Sequence(f"s{i}",
                            "".join(AA[k] for k in
                                    RNG.integers(0, 20, L))))
    return MultiSequence(out)


@pytest.fixture(scope="module")
def packs():
    hp0 = HMMParams.from_defaults(nucleo=False)
    hp1 = HMMParams.from_defaults(nucleo=False)
    hp1.perturb(3)
    return hp0.to_scores(), hp1.to_scores()


def test_multi_kernel_matches_single(packs):
    """batch_posteriors_multi with mixed per-pair packs reproduces each
    pack's batch_posteriors rows exactly."""
    pack0, pack1 = packs
    seqs = _rand_seqs(4)
    codes, lens = post_mod.encode_batch(seqs, "amino", pad_to=64)
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    xi = np.array([p[0] for p in pairs])
    yi = np.array([p[1] for p in pairs])
    xb, yb = codes[xi], codes[yi]
    lxb, lyb = lens[xi], lens[yi]

    rep_idx = np.array([0, 1, 0, 1])
    m_b, i_b, s_b, t_b = pairhmm.score_args_multi([pack0, pack1], rep_idx)
    post_m, ea_m = pairhmm.batch_posteriors_multi(
        xb, yb, lxb, lyb, m_b, i_b, s_b, t_b)

    for pk, rows in ((pack0, [0, 2]), (pack1, [1, 3])):
        post_s, ea_s = pairhmm.batch_posteriors(
            xb, yb, lxb, lyb, *pairhmm.score_args(pk))
        np.testing.assert_array_equal(np.asarray(post_m)[rows],
                                      np.asarray(post_s)[rows])
        np.testing.assert_array_equal(np.asarray(ea_m)[rows],
                                      np.asarray(ea_s)[rows])


def test_ensemble_sparse_store_matches_per_pack(packs):
    """ensemble_pairs_posteriors_sparse slices == per-pack sparse runs."""
    pack0, pack1 = packs
    seqs = _rand_seqs(5)
    codes, lens = post_mod.encode_batch(seqs, "amino", pad_to=64)
    n = len(seqs)
    pairs = [(x, y) for x in range(n) for y in range(x + 1, n)]

    sv, sc, ea, _ = post_mod.ensemble_pairs_posteriors_sparse(
        codes, lens, [pack0, pack1], pairs)
    for r, pk in enumerate((pack0, pack1)):
        sv1, sc1, ea1, _ = post_mod.all_pairs_posteriors_sparse(
            codes, lens, pk, pairs)
        np.testing.assert_array_equal(np.asarray(sv)[r], np.asarray(sv1))
        np.testing.assert_array_equal(np.asarray(sc)[r], np.asarray(sc1))
        np.testing.assert_allclose(ea[r], ea1, rtol=0, atol=0)


def test_batched_replicates_match_serial_loop():
    """run_replicates_batched == one MPC run per replicate (the serial
    reference loop), byte-identical MSAs."""
    from muscle_tpu.pipeline.ensemble_batch import run_replicates_batched
    from muscle_tpu.pipeline.mpc import MPC

    seqs = _rand_seqs(6)
    reps = [(0, "none"), (1, "abc"), (1, "acb"), (2, "bca")]

    def load_hp():
        return HMMParams.from_defaults(nucleo=False)

    batched = list(run_replicates_batched(
        seqs, reps, load_hp, "amino", consiters=2, refineiters=4))

    for (seed, perm), (bs, bp, bmsa) in zip(reps, batched):
        assert (seed, perm) == (bs, bp)
        hp = load_hp()
        if seed > 0:
            hp.perturb(seed)
        mpc = MPC(consistency_iters=2, refine_iters=4, tree_perm=perm)
        smsa = mpc.run(seqs, hp, "amino")
        assert bmsa.to_fasta_text() == smsa.to_fasta_text(), \
            f"replicate (seed={seed}, perm={perm}) diverged"


def test_run_align_command_replicates_efa(tmp_path):
    """-replicates through the CLI driver produces a well-formed EFA
    via the batched path."""
    from muscle_tpu.pipeline.ensemble import run_align_command

    fa = tmp_path / "in.fa"
    _rand_seqs(5).write_fasta(str(fa))
    out = tmp_path / "out.efa"
    run_align_command("align", str(fa), str(out),
                      {"replicates": "3", "refineiters": "3"})
    text = out.read_text()
    assert text.count("<") == 3
    ens_headers = [ln for ln in text.splitlines() if ln.startswith("<")]
    assert ens_headers[0] == "<none.0"
