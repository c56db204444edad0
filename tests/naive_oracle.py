"""Slow, obviously-correct numpy implementations used only as test oracles.

These transcribe the pair-HMM recurrences (reference: src/fwdflat3.cpp,
src/bwdflat3.cpp, src/calcposteriorflat.cpp, src/calcalnflat.cpp) as
plain per-cell loops, to validate the vectorized scan kernels in
muscle_tpu.ops against an independent implementation of the same math.
"""

import numpy as np

LOG_ZERO = np.float32(-2e20)
M, IX, IY, JX, JY = range(5)


def _logexp1(x):
    if x <= 1.0:
        return ((-0.009350833524763 * x + 0.130659527668286) * x + 0.498799810682272) * x + 0.693203116424741
    if x <= 2.5:
        return ((-0.014532321752540 * x + 0.139942324101744) * x + 0.495635523139337) * x + 0.692140569840976
    if x <= 4.5:
        return ((-0.004605031767994 * x + 0.063427417320019) * x + 0.695956496475118) * x + 0.514272634594009
    return ((-0.000458661602210 * x + 0.009695946122598) * x + 0.930734667215156) * x + 0.168037164329057


def log_add(x, y):
    if x < y:
        x, y = y, x
    # x >= y
    if y <= LOG_ZERO or x - y >= 7.5:
        return np.float32(x)
    return np.float32(_logexp1(np.float32(x - y)) + y)


def log_add_n(*vals):
    acc = vals[-1]
    for v in vals[-2::-1]:
        acc = log_add(v, acc)
    return acc


def _tables(pack, x, y):
    ins = pack.insert
    mt = pack.match
    return ins[x], ins[y], mt


def forward(x, y, pack):
    """Naive forward lattice, returns (LX+1, 5, LY+1)."""
    LX, LY = len(x), len(y)
    t = pack
    F = np.full((LX + 1, 5, LY + 1), LOG_ZERO, dtype=np.float32)
    tSM, tSI, tSJ = t.start[0], t.start[1], t.start[3]

    insx, insy, mt = _tables(pack, x, y)
    # boundaries
    if LX >= 1:
        F[1, IX, 0] = tSI + insx[0]
        F[1, JX, 0] = tSJ + insx[0]
        for i in range(1, LX):
            F[i + 1, IX, 0] = F[i, IX, 0] + t.tII + insx[i]
            F[i + 1, JX, 0] = F[i, JX, 0] + t.tJJ + insx[i]
    if LY >= 1:
        F[0, IY, 1] = tSI + insy[0]
        F[0, JY, 1] = tSJ + insy[0]
        for j in range(1, LY):
            F[0, IY, j + 1] = F[0, IY, j] + t.tII + insy[j]
            F[0, JY, j + 1] = F[0, JY, j] + t.tJJ + insy[j]

    for i in range(1, LX + 1):
        for j in range(1, LY + 1):
            emit = mt[x[i - 1], y[j - 1]]
            if i == 1 and j == 1:
                F[1, M, 1] = tSM + emit
            else:
                F[i, M, j] = log_add_n(
                    F[i - 1, M, j - 1] + t.tMM,
                    F[i - 1, IX, j - 1] + t.tIM,
                    F[i - 1, JX, j - 1] + t.tJM,
                    F[i - 1, IY, j - 1] + t.tIM,
                    F[i - 1, JY, j - 1] + t.tJM) + emit
            F[i, IX, j] = log_add(F[i - 1, IX, j] + t.tII,
                                  F[i - 1, M, j] + t.tMI) + insx[i - 1]
            F[i, JX, j] = log_add(F[i - 1, JX, j] + t.tJJ,
                                  F[i - 1, M, j] + t.tMJ) + insx[i - 1]
            F[i, IY, j] = log_add(F[i, IY, j - 1] + t.tII,
                                  F[i, M, j - 1] + t.tMI) + insy[j - 1]
            F[i, JY, j] = log_add(F[i, JY, j - 1] + t.tJJ,
                                  F[i, M, j - 1] + t.tMJ) + insy[j - 1]
    return F


def backward(x, y, pack):
    """Naive backward lattice, returns (LX+1, 5, LY+1)."""
    LX, LY = len(x), len(y)
    t = pack
    B = np.full((LX + 1, 5, LY + 1), LOG_ZERO, dtype=np.float32)
    tSM, tSI, tSJ = t.start[0], t.start[1], t.start[3]
    insx, insy, mt = _tables(pack, x, y)

    B[LX, :, LY] = [tSM, tSI, tSI, tSJ, tSJ]
    for i in range(LX, -1, -1):
        for j in range(LY, -1, -1):
            if i == LX and j == LY:
                continue
            if i < LX and j < LY:
                nm = B[i + 1, M, j + 1] + mt[x[i], y[j]]
                nix = B[i + 1, IX, j] + insx[i]
                njx = B[i + 1, JX, j] + insx[i]
                niy = B[i, IY, j + 1] + insy[j]
                njy = B[i, JY, j + 1] + insy[j]
                if i > 0 and j > 0:
                    B[i, M, j] = log_add_n(t.tMM + nm, t.tMI + nix, t.tMJ + njx,
                                           t.tMI + niy, t.tMJ + njy)
                if i > 0:
                    B[i, IX, j] = log_add(t.tII + nix, t.tIM + nm)
                    B[i, JX, j] = log_add(t.tJJ + njx, t.tJM + nm)
                if j > 0:
                    B[i, IY, j] = log_add(t.tII + niy, t.tIM + nm)
                    B[i, JY, j] = log_add(t.tJJ + njy, t.tJM + nm)
            elif i < LX:  # j == LY
                if i > 0:
                    nix = B[i + 1, IX, j] + insx[i]
                    njx = B[i + 1, JX, j] + insx[i]
                    B[i, M, j] = log_add(t.tMI + nix, t.tMJ + njx)
                    B[i, IX, j] = t.tII + nix
                    B[i, JX, j] = t.tJJ + njx
            else:  # i == LX, j < LY
                niy = B[i, IY, j + 1] + insy[j]
                njy = B[i, JY, j + 1] + insy[j]
                if j > 0:
                    B[i, M, j] = log_add(t.tMI + niy, t.tMJ + njy)
                    B[i, IY, j] = t.tII + niy
                    B[i, JY, j] = t.tJJ + njy
    return B


def posterior(x, y, pack):
    LX, LY = len(x), len(y)
    F = forward(x, y, pack)
    B = backward(x, y, pack)
    total = LOG_ZERO
    for s in range(5):
        total = log_add(total, F[LX, s, LY] + B[LX, s, LY])
    P = np.zeros((LX, LY), dtype=np.float32)
    for i in range(1, LX + 1):
        for j in range(1, LY + 1):
            sc = F[i, M, j] + B[i, M, j] - total
            if sc >= np.log(0.01):
                P[i - 1, j - 1] = 1.0 if sc >= 0 else np.exp(sc)
    return P, total


def mea_score(post):
    LX, LY = post.shape
    old = np.zeros(LY + 1, dtype=np.float32)
    for i in range(1, LX + 1):
        new = np.zeros(LY + 1, dtype=np.float32)
        for j in range(1, LY + 1):
            new[j] = max(old[j - 1] + post[i - 1, j - 1], old[j], new[j - 1])
        old = new
    return old[LY]
