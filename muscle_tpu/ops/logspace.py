"""Log-space arithmetic for the pair-HMM kernels.

The reference computes Forward/Backward in fp32 log space using a
3-segment-per-branch cubic polynomial approximation of log(1+e^x)
("LOGEXP1", reference: src/scoretype.h:100-149) instead of log1p/exp.
We use the same polynomial — it is branch-free on the VPU (4 cubics +
selects, no transcendentals) and keeps our numerics within float ulps of
the reference's, which matters for alignment-level reproducibility.

Conventions (reference: src/scoretype.h:83-96):
    LOG_ZERO = -2e20   (additive identity; "probability zero")
    x + y in log space = LOG_ADD(x, y) ~= log(e^x + e^y)
    LOG_ADD returns max(x,y) when |x-y| >= 7.5 or min is LOG_ZERO.
"""

from __future__ import annotations

import jax.numpy as jnp

LOG_ZERO = -2e20
LOG_UNDERFLOW = 7.5

# Cubic coefficients for log(1+e^x) on [0, 1], (1, 2.5], (2.5, 4.5], (4.5, 7.5]
# (reference: src/scoretype.h:100-109)
_C0 = (-0.009350833524763, 0.130659527668286, 0.498799810682272, 0.693203116424741)
_C1 = (-0.014532321752540, 0.139942324101744, 0.495635523139337, 0.692140569840976)
_C2 = (-0.004605031767994, 0.063427417320019, 0.695956496475118, 0.514272634594009)
_C3 = (-0.000458661602210, 0.009695946122598, 0.930734667215156, 0.168037164329057)


def _cubic(c, x):
    return ((c[0] * x + c[1]) * x + c[2]) * x + c[3]


def logexp1(x):
    """log(1 + e^x) for x in [0, 7.5] via the reference's cubic splines."""
    y = jnp.where(x <= 1.0, _cubic(_C0, x),
                  jnp.where(x <= 2.5, _cubic(_C1, x),
                            jnp.where(x <= 4.5, _cubic(_C2, x), _cubic(_C3, x))))
    return y


def log_add(x, y):
    """LOG_ADD(x, y) with the reference's underflow clamps."""
    hi = jnp.maximum(x, y)
    lo = jnp.minimum(x, y)
    d = hi - lo
    small = (lo <= LOG_ZERO) | (d >= LOG_UNDERFLOW)
    # clamp the polynomial argument so the garbage lane of the select is finite
    corr = logexp1(jnp.clip(d, 0.0, LOG_UNDERFLOW))
    return jnp.where(small, hi, lo + corr)


def log_add5(x1, x2, x3, x4, x5):
    """Right-fold LOG_ADD of five terms, reference association order
    (src/scoretype.h:137-140)."""
    return log_add(x1, log_add(x2, log_add(x3, log_add(x4, x5))))
