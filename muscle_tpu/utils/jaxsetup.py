"""One-time JAX configuration for the framework.

Enables the persistent XLA compilation cache so repeated invocations
(tests, CLI runs, benchmarks) skip recompiling the scan kernels, which
dominate cold-start time.
"""

from __future__ import annotations

import os

_done = False


def setup_jax() -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    cache_dir = os.environ.get(
        "MUSCLE_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "muscle_tpu_jax"))
    if cache_dir and cache_dir != "0":
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
