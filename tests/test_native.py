"""Native C++ host kernels vs the numpy implementations."""

import numpy as np
import pytest

from muscle_tpu.native import (build_post_accumulate_native, get_lib,
                               mea_align_native)
from naive_oracle import mea_score as naive_mea


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++)")
    return lib


def test_native_mea_matches_naive(lib):
    rng = np.random.default_rng(4)
    for _ in range(6):
        lx, ly = rng.integers(2, 60, size=2)
        p = (rng.random((lx, ly)) ** 4).astype(np.float32)
        score, path = mea_align_native(p)
        assert abs(score - naive_mea(p)) < 1e-5
        assert sum(c in "BX" for c in path) == lx
        assert sum(c in "BY" for c in path) == ly


def test_native_mea_matches_numpy_path(lib, monkeypatch):
    # identical tie-breaking: compare against the numpy fallback
    import muscle_tpu.ops.mea as mea_mod
    rng = np.random.default_rng(5)
    for _ in range(4):
        lx, ly = rng.integers(2, 40, size=2)
        p = (rng.random((lx, ly)) ** 4).astype(np.float32)
        p[p < 0.02] = 0
        got = mea_align_native(p)
        monkeypatch.setattr("muscle_tpu.native.mea_align_native",
                            lambda _p: None)
        monkeypatch.setattr(mea_mod, "mea_align_native", None, raising=False)
        # call numpy path directly by re-importing logic
        import importlib
        want_score, want_path = _numpy_mea(p)
        assert got[1] == want_path
        assert abs(got[0] - want_score) < 1e-5


def _numpy_mea(post):
    LX, LY = post.shape
    old = np.zeros(LY + 1, dtype=np.float32)
    tb = np.empty((LX, LY), dtype=np.uint8)
    for i in range(LX):
        b = old[:-1] + post[i]
        x = old[1:]
        e = np.maximum(b, x)
        new = np.maximum.accumulate(np.concatenate(([np.float32(0)], e)))
        y = new[:-1]
        tb[i] = np.where((b >= x) & (b >= y), 0, np.where(x >= y, 1, 2))
        old = new
    path = []
    i, j = LX, LY
    while i > 0 or j > 0:
        if i == 0:
            path.append("Y"); j -= 1
        elif j == 0:
            path.append("X"); i -= 1
        else:
            d = tb[i - 1, j - 1]
            if d == 0: path.append("B"); i -= 1; j -= 1
            elif d == 1: path.append("X"); i -= 1
            else: path.append("Y"); j -= 1
    return float(old[LY]), "".join(reversed(path))


def test_native_build_post(lib):
    rng = np.random.default_rng(6)
    cc1, cc2 = 30, 25
    lx, ly = 20, 18
    out = np.zeros((cc1, cc2), dtype=np.float32)
    P = rng.random((lx, ly)).astype(np.float32)
    ptc1 = np.sort(rng.choice(cc1, lx, replace=False)).astype(np.uint32)
    ptc2 = np.sort(rng.choice(cc2, ly, replace=False)).astype(np.uint32)
    ok = build_post_accumulate_native(out, P, ptc1, ptc2)
    assert ok
    want = np.zeros((cc1, cc2), dtype=np.float32)
    want[np.ix_(ptc1, ptc2)] += P
    np.testing.assert_allclose(out, want, rtol=1e-6)
