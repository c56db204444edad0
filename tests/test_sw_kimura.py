"""Batched SW kernel vs a naive affine-gap implementation; Kimura dists."""

import numpy as np
import pytest

from muscle_tpu.alphabet import ALPHA_AMINO, encode
from muscle_tpu.ops.sw import (BLOSUM62_21, DEFAULT_SW_EXT, DEFAULT_SW_OPEN,
                               sw_scores_batch)
from muscle_tpu.sequence import MultiSequence, Sequence
from muscle_tpu.tree.kimura import fract_id, kimura_dist, kimura_dist_mx


def naive_sw(x, y, subst, open_, ext):
    lx, ly = len(x), len(y)
    H = np.zeros((lx + 1, ly + 1))
    E = np.full((lx + 1, ly + 1), -np.inf)
    F = np.full((lx + 1, ly + 1), -np.inf)
    best = 0.0
    for i in range(1, lx + 1):
        for j in range(1, ly + 1):
            E[i, j] = max(E[i, j - 1] + ext, H[i, j - 1] + open_ + ext)
            F[i, j] = max(F[i - 1, j] + ext, H[i - 1, j] + open_ + ext)
            s = subst[x[i - 1], y[j - 1]]
            H[i, j] = max(0.0, H[i - 1, j - 1] + s, E[i, j], F[i, j])
            best = max(best, H[i, j])
    return best


def _codes(s):
    return encode(np.frombuffer(s.encode(), dtype=np.uint8),
                  ALPHA_AMINO).astype(np.int32)


def test_sw_batch_matches_naive():
    rng = np.random.default_rng(12)
    aas = list("ACDEFGHIKLMNPQRSTVWY")
    seqs = ["".join(rng.choice(aas, size=rng.integers(10, 40)))
            for _ in range(6)]
    lmax = max(len(s) for s in seqs)
    pad = ((lmax + 7) // 8) * 8
    codes = np.full((6, pad), 20, np.int32)
    lens = np.zeros(6, np.int32)
    for i, s in enumerate(seqs):
        c = _codes(s)
        codes[i, :len(c)] = c
        lens[i] = len(c)
    pairs = [(0, 1), (2, 3), (4, 5), (0, 5)]
    xi = np.array([p[0] for p in pairs])
    yi = np.array([p[1] for p in pairs])
    got = np.asarray(sw_scores_batch(codes[xi], codes[yi],
                                     lens[xi], lens[yi], BLOSUM62_21))
    for k, (i, j) in enumerate(pairs):
        want = naive_sw(_codes(seqs[i]), _codes(seqs[j]), BLOSUM62_21,
                        DEFAULT_SW_OPEN, DEFAULT_SW_EXT)
        assert abs(got[k] - want) < 1e-3, (k, got[k], want)


def test_kimura_formula():
    assert kimura_dist(1.0) == 0.0
    # p = 0.5: -ln(1 - 0.5 - 0.05) = -ln(0.45)
    assert abs(kimura_dist(0.5) - (-np.log(0.45))) < 1e-6
    # table region
    assert abs(kimura_dist(0.25) - 1.95) < 1e-6   # p=0.75 -> 195 PAMs
    # beyond table
    assert kimura_dist(0.05) == 10.0


def test_fract_id_and_distmx():
    msa = MultiSequence([Sequence("a", "MKV-L"), Sequence("b", "MKVQL"),
                         Sequence("c", "MAV-L")])
    assert abs(fract_id(msa[0].bytes_view(), msa[1].bytes_view()) - 4 / 5) < 1e-9
    d = kimura_dist_mx(msa)
    assert d[0, 1] < d[1, 2]
    assert np.allclose(np.diag(d), 0)
