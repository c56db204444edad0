import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware. Must be set before importing jax anywhere; the
# environment may pre-register a TPU plugin (JAX_PLATFORMS=axon +
# sitecustomize keyed on PALLAS_AXON_POOL_IPS), so force both off.
# Set MUSCLE_TPU_TEST_TPU=1 to keep the real accelerator instead (used
# for the slow e2e tier, which then exercises the Pallas kernels).
if not os.environ.get("MUSCLE_TPU_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    # sitecustomize may have force-registered a TPU plugin and overwritten
    # jax_platforms before this file runs; put it back to cpu.
    import jax
    jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
