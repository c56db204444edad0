"""Retry wrapper for transient device/tunnel failures.

The TPU may be reached through a forwarding tunnel whose compile/execute
RPCs can drop mid-flight (observed: "remote_compile: read body: response
body closed" killing a 4.5k-sequence Super5 run 6 minutes in). All work
here is deterministic and derived from host-resident inputs, so simply
re-issuing the device call is always safe (SURVEY §5: per-shard
recompute is cheap because all state is derivable from input + seed).
"""

from __future__ import annotations

import time

from . import logging as mlog

_TRANSIENT_MARKERS = (
    "remote_compile", "read body", "connection reset", "socket closed",
    "unavailable", "deadline exceeded", "failed precondition: the tpu",
    # on a shared/tunneled chip, OOM is most often another client's
    # transient allocation (observed: a second process merely *listing*
    # devices reserves HBM and kills a long run mid-consistency);
    # backing off and re-issuing recovers once the intruder exits
    "resource_exhausted", "resource exhausted",
)


def is_transient(exc: Exception) -> bool:
    s = str(exc).lower()
    return any(m in s for m in _TRANSIENT_MARKERS)


def call_with_retry(fn, *args, retries: int = 5, base_delay: float = 10.0,
                    **kwargs):
    """fn(*args, **kwargs) with exponential-backoff retries on transient
    device-runtime errors; non-transient errors propagate immediately."""
    for attempt in range(retries + 1):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # jax.errors.JaxRuntimeError et al.
            if attempt >= retries or not is_transient(e):
                raise
            delay = base_delay * (2 ** attempt)
            mlog.progress("transient device error (%s); retry %d/%d in "
                          "%.0fs", str(e).splitlines()[0][:120],
                          attempt + 1, retries, delay)
            time.sleep(delay)
