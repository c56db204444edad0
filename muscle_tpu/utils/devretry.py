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

# tunnel/RPC failures — always worth a long retry ladder. "unavailable"
# is anchored to the gRPC status form so unrelated error text doesn't
# match (ADVICE r2).
_TUNNEL_MARKERS = (
    "remote_compile", "read body", "connection reset", "socket closed",
    "unavailable:", "deadline exceeded", "failed precondition: the tpu",
)
# allocator OOM on a shared/tunneled chip is most often another client's
# transient allocation (observed: a second process merely *listing*
# devices reserves HBM and kills a long run mid-consistency) — but it
# can also be a deterministic too-large chunk, so it gets a SHORT retry
# ladder (2 tries, small backoff) instead of burning ~5 min.
_OOM_MARKERS = ("resource_exhausted", "resource exhausted")


def classify(exc: Exception) -> str | None:
    s = str(exc).lower()
    if any(m in s for m in _TUNNEL_MARKERS):
        return "tunnel"
    if any(m in s for m in _OOM_MARKERS):
        return "oom"
    return None


def is_transient(exc: Exception) -> bool:
    return classify(exc) is not None


def call_with_retry(fn, *args, retries: int = 5, base_delay: float = 10.0,
                    **kwargs):
    """fn(*args, **kwargs) with exponential-backoff retries on transient
    device-runtime errors; non-transient errors propagate immediately.
    OOM gets at most 2 retries with short backoff (it may be a
    deterministic too-large allocation)."""
    for attempt in range(retries + 1):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # jax.errors.JaxRuntimeError et al.
            kind = classify(e)
            max_r = retries if kind == "tunnel" else 2
            delay = (base_delay if kind == "tunnel" else 3.0) * (2 ** attempt)
            if attempt >= max_r or kind is None:
                raise
            mlog.progress("transient device error (%s); retry %d/%d in "
                          "%.0fs", str(e).splitlines()[0][:120],
                          attempt + 1, max_r, delay)
            time.sleep(delay)
