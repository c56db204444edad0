"""Measure ensemble replicate batching speedup (VERDICT r1 item 7).

Done criterion: -diversified on BB11005 is >= 5x faster than 100x the
single-replicate time. Runs the batched driver (production path) and a
serial replicate loop on the same input and prints both, plus the
per-replicate agreement check (batched must be byte-identical).

Usage: python tools/ensemble_bench.py [n_replicates=12] [input.fa]
"""
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muscle_tpu.alphabet import ALPHA_AMINO
from muscle_tpu.hmm.params import HMMParams
from muscle_tpu.pipeline.ensemble import TREE_PERM_NAMES
from muscle_tpu.pipeline.ensemble_batch import run_replicates_batched
from muscle_tpu.pipeline.mpc import MPC
from muscle_tpu.sequence import MultiSequence
from muscle_tpu.utils.jaxsetup import setup_jax


def main():
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    fa = (sys.argv[2] if len(sys.argv) > 2
          else "/root/reference/test_data/fa/BB11005")
    setup_jax()
    seqs = MultiSequence.from_fasta(fa)
    reps = [(r, TREE_PERM_NAMES[r % 4]) for r in range(n_reps)]

    def load_hp():
        return HMMParams.from_defaults(nucleo=False)

    # warm the compile caches with one replicate each way
    warm = list(run_replicates_batched(seqs, reps[:1], load_hp,
                                       ALPHA_AMINO, 2, 100))
    hp = load_hp()
    MPC(consistency_iters=2, refine_iters=100,
        tree_perm="none").run(seqs, hp, ALPHA_AMINO)

    t0 = time.time()
    batched = list(run_replicates_batched(seqs, reps, load_hp,
                                          ALPHA_AMINO, 2, 100))
    t_batched = time.time() - t0

    t0 = time.time()
    serial = []
    for seed, perm in reps:
        hp = load_hp()
        if seed > 0:
            hp.perturb(seed)
        mpc = MPC(consistency_iters=2, refine_iters=100, tree_perm=perm)
        serial.append(mpc.run(seqs, hp, ALPHA_AMINO))
    t_serial = time.time() - t0

    same = all(b[2].to_fasta_text() == s.to_fasta_text()
               for b, s in zip(batched, serial))
    print(f"replicates={n_reps} seqs={len(seqs)} "
          f"batched={t_batched:.1f}s serial={t_serial:.1f}s "
          f"speedup={t_serial / max(t_batched, 1e-9):.2f}x "
          f"identical={same}")


if __name__ == "__main__":
    main()
