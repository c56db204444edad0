"""Batched cluster MPCs (pipeline/cluster_batch.py) are bit-identical
to the serial per-cluster loop the reference models
(reference: src/super4.cpp — one MPCFlat::Run per cluster)."""

import os

import numpy as np
import pytest

from muscle_tpu.hmm.params import HMMParams
from muscle_tpu.pipeline.cluster_batch import run_clusters_batched
from muscle_tpu.pipeline.mpc import MPC
from muscle_tpu.sequence import MultiSequence

FA = "/root/reference/test_data/fa/BB11001"


def _clusters():
    ms = MultiSequence.from_fasta(FA)
    # mimic Super4 output: several small clusters, a 2-seq pair, and a
    # singleton, carved from one family
    seqs = list(ms)
    assert len(seqs) >= 4
    subs = [
        MultiSequence(seqs[:2]),          # 2-seq (no consistency)
        MultiSequence(seqs[1:4]),         # 3-seq
        MultiSequence(seqs[:1]),          # singleton pass-through
        MultiSequence(seqs),              # whole family
    ]
    return subs


def _factory():
    return MPC(refine_iters=3)


def test_batched_matches_serial():
    subs = _clusters()
    hp = HMMParams.from_defaults(nucleo=False)

    os.environ["MUSCLE_TPU_BATCH_CLUSTERS"] = "0"
    try:
        serial = run_clusters_batched(subs, hp, "amino", _factory)
    finally:
        del os.environ["MUSCLE_TPU_BATCH_CLUSTERS"]
    batched = run_clusters_batched(subs, hp, "amino", _factory)

    assert len(serial) == len(batched) == len(subs)
    for i, (a, b) in enumerate(zip(serial, batched)):
        assert a.to_fasta_text() == b.to_fasta_text(), f"cluster {i}"


def test_batched_matches_serial_mega():
    """Muscle-3D shrubs (profile emissions) batch bit-identically."""
    from muscle_tpu.io.mega import parse_mega
    from muscle_tpu.sequence import Sequence

    mega = parse_mega("/root/reference/test_data/mega/BB11001.mega")
    seqs = [Sequence(lb, sq.encode())
            for lb, sq in zip(mega.labels, mega.seqs)]
    subs = [MultiSequence(seqs[:2]), MultiSequence(seqs[1:4])]
    hp = HMMParams.from_defaults(nucleo=False)

    def factory():
        return MPC(refine_iters=2, mega=mega)

    os.environ["MUSCLE_TPU_BATCH_CLUSTERS"] = "0"
    try:
        serial = run_clusters_batched(subs, hp, "amino", factory)
    finally:
        del os.environ["MUSCLE_TPU_BATCH_CLUSTERS"]
    batched = run_clusters_batched(subs, hp, "amino", factory)
    for i, (a, b) in enumerate(zip(serial, batched)):
        assert a.to_fasta_text() == b.to_fasta_text(), f"shrub {i}"


def test_singleton_passthrough():
    ms = MultiSequence.from_fasta(FA)
    sub = MultiSequence(list(ms)[:1])
    hp = HMMParams.from_defaults(nucleo=False)
    out = run_clusters_batched([sub], hp, "amino", _factory)
    assert out[0] is sub
