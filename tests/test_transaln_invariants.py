"""TransAln invariants on randomized inputs.

The extension algebra must, for any pairwise paths: preserve every
letter of every row, keep MSA rows mutually aligned exactly as before
(modulo inserted all-gap columns), and place member inserts in columns
where all original MSA rows have gaps.
"""

import numpy as np

from muscle_tpu.pipeline.transaln import make_extended_msa
from muscle_tpu.sequence import MultiSequence, Sequence


def _random_case(rng, n_msa=3, n_fresh=4, l=25):
    aas = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    # build an MSA by inserting random gaps into random rows
    rows = []
    for i in range(n_msa):
        s = rng.choice(aas, size=l)
        gaps = rng.choice(l, size=rng.integers(0, 5), replace=False)
        s = s.copy()
        s[gaps] = ord("-")
        rows.append(Sequence(f"m{i}", s))
    msa = MultiSequence(rows)

    fresh = []
    f2m = []
    paths = []
    for k in range(n_fresh):
        mi = int(rng.integers(0, n_msa))
        f2m.append(mi)
        target = rows[mi].copy_delete_gaps()
        lt = len(target)
        # random path consistent with target length
        path = []
        fc = 0
        tc = 0
        while tc < lt:
            r = rng.random()
            if r < 0.7:
                path.append("B")
                fc += 1
                tc += 1
            elif r < 0.85:
                path.append("X")
                fc += 1
            else:
                path.append("Y")
                tc += 1
        if rng.random() < 0.3:
            path.append("X")
            fc += 1
        fresh_seq = rng.choice(aas, size=fc)
        fresh.append(Sequence(f"f{k}", fresh_seq))
        paths.append("".join(path))
    return msa, fresh, f2m, paths


def test_transaln_invariants_random():
    rng = np.random.default_rng(11)
    for trial in range(10):
        msa, fresh, f2m, paths = _random_case(rng)
        ext = make_extended_msa(msa, fresh, f2m, paths)
        assert ext.is_aligned()
        rows = {s.label: s.text() for s in ext}
        # letters preserved
        for s in list(msa) + fresh:
            assert rows[s.label].replace("-", "") == s.text().replace("-", "")
        # original MSA rows still mutually aligned the same way:
        # removing columns gapped in all m-rows yields the original MSA
        mat = np.stack([ext[i].bytes_view() for i in range(len(msa))])
        keep = ~np.all(mat == ord("-"), axis=0)
        for i in range(len(msa)):
            orig = msa[i].text()
            # original may itself have all-gap columns; drop those too
            omat = np.stack([m.bytes_view() for m in msa])
            okeep = ~np.all(omat == ord("-"), axis=0)
            assert "".join(chr(c) for c in mat[i][keep]) == \
                "".join(chr(c) for c in omat[i][okeep])
