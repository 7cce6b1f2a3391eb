"""Test configuration: CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual device mesh
(``xla_force_host_platform_device_count``), the TPU-world stand-in for
testing multi-node behavior without a cluster (SURVEY §4).
"""

import os

# NB: a sitecustomize (PYTHONPATH=/root/.axon_site) force-sets
# JAX_PLATFORMS=axon at interpreter startup AND registers the axon TPU
# PJRT plugin inside `import jax`, where the plugin also overrides the
# jax_platforms CONFIG (not just the env var).  Setting the env var
# here is therefore not enough under the naked environment: the first
# backend init still dials the TPU tunnel and hangs indefinitely during
# tunnel outages (observed: a naked `python -m pytest
# tests/test_shuffle.py` hangs >120 s while the stripped-env run passes
# in seconds).  The env assignment below covers child processes spawned
# by tests; the explicit config.update after `import jax` overrides the
# plugin's import-time config write in THIS interpreter.  (Do not fix
# this by re-exec'ing from conftest: pytest's fd-level capture is
# already active when conftest loads, so an execve'd child inherits
# redirected fds and its entire output evaporates.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import mfcd_tpu.cache  # noqa: E402,F401  (persistent compile cache)
