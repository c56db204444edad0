"""Synthesize a large .mega structure set + distance matrix for the
super7 scale benchmark.

The mounted test_data ships only the 7 small BAliBASE .mega files (the
reference's rdrp.mega is not included), so the ~1k-structure `-super7
-distmxin` config (reference claims ~10k structures on a desktop,
/root/reference/README.md:25-31) is benchmarked on replicated/perturbed
BB chains: every synthetic chain is a real chain with ~10% of positions
re-drawn per feature, and the distance matrix is the per-pair mean
feature disagreement of the clipped profiles (a cheap but structured
stand-in for reseek distances — UPGMA over it produces a real shrub
partition).

Usage: python tools/make_big_mega.py [n_chains] [outdir]
Writes <outdir>/synth<N>.mega and <outdir>/synth<N>.distmx.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muscle_tpu.io.mega import parse_mega, write_mega

MEGA_DIR = "/root/reference/test_data/mega"


def build(n_chains: int = 1024, seed: int = 7):
    files = sorted(f for f in os.listdir(MEGA_DIR) if f.endswith(".mega"))
    base = parse_mega(os.path.join(MEGA_DIR, files[0]))
    pool = []
    for fn in files:
        ms = parse_mega(os.path.join(MEGA_DIR, fn))
        pool.extend(ms.profiles)
    rng = np.random.default_rng(seed)
    sizes = np.array(base.alpha_sizes, np.int64)
    labels, profiles, seqs = [], [], []
    from muscle_tpu.alphabet import AMINO_ALPHA
    for i in range(n_chains):
        src = pool[int(rng.integers(0, len(pool)))]
        prof = src.copy()
        l = prof.shape[0]
        nmut = max(1, l // 10)
        for f in range(prof.shape[1]):
            pos = rng.integers(0, l, size=nmut)
            prof[pos, f] = rng.integers(0, sizes[f], size=nmut)
        labels.append(f"synth{i:05d}")
        profiles.append(prof)
        seqs.append("".join(AMINO_ALPHA[c] for c in prof[:, 0]))
    base.labels = labels
    base.profiles = profiles
    base.seqs = seqs
    return base


def distmx(ms, path: str):
    """Pairwise mean feature disagreement of the length-padded
    profiles, written in the reseek distmx format the reference's
    -distmxin reads (header `distmx N`, N `idx label` lines, then
    `i j dist` index triples; reader: src/upgma5.cpp ReadDistMx2)."""
    n = len(ms.labels)
    lmax = max(p.shape[0] for p in ms.profiles)
    f = ms.profiles[0].shape[1]
    stack = np.zeros((n, lmax, f), np.int16)
    for i, p in enumerate(ms.profiles):
        stack[i, :p.shape[0]] = p
        stack[i, p.shape[0]:] = -1
    with open(path, "w") as fh:
        fh.write("distmx\t%d\n" % n)
        for i, lb in enumerate(ms.labels):
            fh.write("%d\t%s\n" % (i, lb))
        for i in range(n):
            diffs = (stack[i + 1:] != stack[i][None]).mean(axis=(1, 2))
            for j, d in enumerate(diffs, start=i + 1):
                fh.write("%d\t%d\t%.4f\n" % (i, j, min(float(d), 1.0)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    ms = build(n)
    mega_path = os.path.join(outdir, f"synth{n}.mega")
    dist_path = os.path.join(outdir, f"synth{n}.distmx")
    write_mega(ms, mega_path)
    distmx(ms, dist_path)
    print(mega_path)
    print(dist_path)


if __name__ == "__main__":
    main()
