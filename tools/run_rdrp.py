"""Full-scale RdRp workloads on the real device (reference:
test_scripts/run_rdrp_seqs.bash and run_rdrp_structs.bash).

Runs the reference's own large-input suite:
  1. -super5 on rdrp.fa (4,528 sequences x ~400 aa)
  2. -super7 on rdrp.fa with -guidetreein rdrp.newick (the structure
     variant needs rdrp.mega, which is not shipped in the mounted
     test_data; the sequence path exercises the same shrub/PProg
     machinery)
and reports wall-clock + Q/TC agreement against a reference-binary
output when one is available (pass its path as argv[1]).

Usage: python tools/run_rdrp.py [reference_super5_output.afa]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muscle_tpu.cli import main as cli_main
from muscle_tpu.qscore import qscore
from muscle_tpu.sequence import MultiSequence

RDRP = "/root/reference/test_data/rdrp"
OUT = os.environ.get("RDRP_OUT", "/tmp/rdrp_out")


def run(name, args):
    t0 = time.time()
    cli_main(args)
    dt = time.time() - t0
    print(f"{name}: {dt:.0f}s")
    return dt


def check(afa, input_fa):
    msa = MultiSequence.from_fasta(afa)
    inp = MultiSequence.from_fasta(input_fa)
    assert sorted(s.label for s in msa) == sorted(s.label for s in inp)
    assert msa.is_aligned()
    print(f"  {afa}: {len(msa)} seqs x {msa.col_count()} cols, "
          "labels + residues intact")


def main():
    os.makedirs(OUT, exist_ok=True)
    fa = f"{RDRP}/rdrp.fa"

    run("super5 rdrp.fa", ["-super5", fa,
                           "-output", f"{OUT}/rdrp_seqs.afa",
                           "-log", f"{OUT}/super5_rdrp.log"])
    check(f"{OUT}/rdrp_seqs.afa", fa)

    run("super7 rdrp.fa + guidetreein", [
        "-super7", fa, "-guidetreein", f"{RDRP}/rdrp.newick",
        "-output", f"{OUT}/rdrp_s7.afa",
        "-log", f"{OUT}/super7_rdrp.log"])
    check(f"{OUT}/rdrp_s7.afa", fa)

    if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        ref = MultiSequence.from_fasta(sys.argv[1])
        ours = MultiSequence.from_fasta(f"{OUT}/rdrp_seqs.afa")
        q, tc = qscore(ours, ref)
        print(f"agreement vs reference binary: Q={q:.3f} TC={tc:.3f}")


if __name__ == "__main__":
    main()
