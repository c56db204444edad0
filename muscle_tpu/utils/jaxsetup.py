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
            # per-platform subdir: the CPU client otherwise loads AOT
            # results compiled for the (different) TPU-host CPU — wrong
            # machine features risk SIGILL and spam warnings. Read the
            # env hint rather than jax.default_backend() so the backend
            # is not initialized early.
            platform = os.environ.get("JAX_PLATFORMS") or "device"
            cache_dir = os.path.join(cache_dir, platform.split(",")[0])
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
