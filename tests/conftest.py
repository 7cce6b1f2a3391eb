"""Test configuration: CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual device mesh
(``xla_force_host_platform_device_count``), the TPU-world stand-in for
testing multi-node behavior without a cluster (SURVEY §4).
"""

import os

# NB: a sitecustomize (PYTHONPATH=/root/.axon_site) force-sets
# JAX_PLATFORMS=axon at interpreter startup, so a shell-level override is
# not enough — set it here, before jax is imported.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import mfcd_tpu.cache  # noqa: E402,F401  (persistent compile cache)
