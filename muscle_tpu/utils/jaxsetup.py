"""One-time JAX configuration for the framework.

Enables the persistent XLA compilation cache so repeated invocations
(tests, CLI runs, benchmarks) skip recompiling the scan kernels, which
dominate cold-start time.
"""

from __future__ import annotations

import os

_done = False


def _machine_fingerprint() -> str:
    """Short stable hash of this host's CPU model + ISA feature flags.

    XLA:CPU AOT results are machine-code for ONE microarchitecture;
    loading an entry produced on a different host can SIGILL. The
    fingerprint isolates cache entries per physical machine class.
    """
    import hashlib
    import platform as _plat
    parts = [_plat.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "Features")):
                    parts.append(line.strip())
                    if len(parts) >= 3:
                        break
    except OSError:
        parts.append(_plat.processor() or "")
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:10]


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
            # per-platform+machine subdir: the CPU client otherwise
            # loads AOT results compiled for a DIFFERENT host's CPU
            # (e.g. the TPU-host CPU vs this one) — wrong machine
            # features risk SIGILL and spam warnings. Read the env hint
            # rather than jax.default_backend() so the backend is not
            # initialized early; key cpu entries by a fingerprint of
            # this machine's CPU model + feature flags.
            platform = (os.environ.get("JAX_PLATFORMS") or
                        "device").split(",")[0]
            if platform in ("cpu", "device"):
                platform += "-" + _machine_fingerprint()
            cache_dir = os.path.join(cache_dir, platform)
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
