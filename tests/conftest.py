"""Test configuration: CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual device mesh
(``xla_force_host_platform_device_count``), the TPU-world stand-in for
testing multi-node behavior without a cluster (SURVEY §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import mfcd_tpu.cache  # noqa: E402,F401  (persistent compile cache)
