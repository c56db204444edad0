"""MPC pipeline guards."""


def test_mpc_store_budget_guard(monkeypatch):
    """The single-chip HBM capacity wall fails fast with the remedy
    (docs/PARITY.md "mpc-1000") instead of OOMing mid-pipeline."""
    import numpy as np
    import pytest
    from muscle_tpu.hmm.params import HMMParams
    from muscle_tpu.pipeline import posteriors as post_mod
    from muscle_tpu.pipeline.mpc import MPC
    from muscle_tpu.sequence import MultiSequence, Sequence
    rng = np.random.default_rng(3)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    seqs = MultiSequence([
        Sequence(f"s{i}", "".join(aas[b] for b in
                                  rng.integers(0, 20, 60)))
        for i in range(12)])
    monkeypatch.setattr(post_mod, "SMALL_DENSE_NL", 64)
    monkeypatch.setenv("MUSCLE_TPU_HBM_BUDGET_GB", "0.000001")
    with pytest.raises(MemoryError, match="super5"):
        MPC().run(seqs, HMMParams.from_defaults(), "amino")
