"""Full BAliBASE RV11 accuracy evaluation (sequences + structures).

Runs -align on all 7 families (FASTA and .mega) and scores Q/TC against
the reference alignments, comparing to the published goldens
(reference: test_scripts/check_results.py:37-51, tolerance >= 0.7x).

Usage: python tools/run_balibase.py [--refine-iters N] [--families a,b]
Prints a table and exits nonzero if any family is below tolerance.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FA_DIR = "/root/reference/test_data/fa"
MEGA_DIR = "/root/reference/test_data/mega"
REF_DIR = "/root/reference/test_data/ref_alns"

# published goldens (test_scripts/check_results.py)
GOLDEN_SEQ = {
    "BB11001": (1.000, 1.000), "BB11002": (0.611, 0.000),
    "BB11004": (0.674, 0.500), "BB11005": (0.568, 0.170),
    "BB11006": (0.561, 0.375), "BB11007": (0.837, 0.662),
    "BB11009": (0.758, 0.700),
}
GOLDEN_MEGA = {
    "BB11001": (0.985, 0.982), "BB11002": (0.838, 0.353),
    "BB11004": (0.812, 0.685), "BB11005": (0.754, 0.455),
    "BB11006": (0.683, 0.500), "BB11007": (0.925, 0.768),
    "BB11009": (0.764, 0.617),
}
TOL = 0.7


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refine-iters", type=int, default=100)
    ap.add_argument("--families", default=",".join(GOLDEN_SEQ))
    ap.add_argument("--skip-mega", action="store_true")
    ap.add_argument("--skip-seq", action="store_true")
    args = ap.parse_args()

    from muscle_tpu.sequence import MultiSequence, Sequence
    from muscle_tpu.pipeline.mpc import align
    from muscle_tpu.qscore import qscore
    from muscle_tpu.io.mega import parse_mega

    fams = args.families.split(",")
    failures = []
    for fam in fams:
        ref = MultiSequence.from_fasta(f"{REF_DIR}/{fam}")
        if not args.skip_seq:
            t0 = time.time()
            msa = align(MultiSequence.from_fasta(f"{FA_DIR}/{fam}"),
                        refine_iters=args.refine_iters)
            q, tc = qscore(msa, ref)
            gq, gtc = GOLDEN_SEQ[fam]
            ok = q >= TOL * gq and tc >= TOL * gtc
            print(f"seq  {fam}: Q={q:.3f} TC={tc:.3f} "
                  f"(golden {gq:.3f}/{gtc:.3f}) "
                  f"{'OK' if ok else 'FAIL'}  [{time.time()-t0:.0f}s]",
                  flush=True)
            if not ok:
                failures.append(("seq", fam, q, tc))
        if not args.skip_mega:
            t0 = time.time()
            mega = parse_mega(f"{MEGA_DIR}/{fam}.mega")
            seqs = MultiSequence([Sequence(lb, sq) for lb, sq in
                                  zip(mega.labels, mega.seqs)])
            msa = align(seqs, mega=mega, refine_iters=args.refine_iters)
            q, tc = qscore(msa, ref, by_sequence=True)
            gq, gtc = GOLDEN_MEGA[fam]
            ok = q >= TOL * gq and tc >= TOL * gtc
            print(f"mega {fam}: Q={q:.3f} TC={tc:.3f} "
                  f"(golden {gq:.3f}/{gtc:.3f}) "
                  f"{'OK' if ok else 'FAIL'}  [{time.time()-t0:.0f}s]",
                  flush=True)
            if not ok:
                failures.append(("mega", fam, q, tc))

    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nALL FAMILIES OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
