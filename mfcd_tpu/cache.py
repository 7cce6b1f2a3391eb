"""Persistent XLA compilation cache setup.

The host driving the TPU in this environment has a single CPU core, so XLA
compiles are expensive; caching them on disk makes every process after the
first start instantly.  Importing this module (or calling ``enable``) is
idempotent and safe on any backend.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get(
    "MFCD_JAX_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
)


def enable(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache EVERYTHING, including sub-second programs: the remote compile
    # helper can turn flaky after a worker restart (round-2 outage), and
    # un-cached tiny programs (eager vmap key fan-outs) then re-roll that
    # dice in every process.  With min-compile-time 0 every successful
    # compile is banked and recovery ratchets forward.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # Exact f32 matmuls everywhere: this environment's default drops to
    # bf16-pass precision (~1e-3 error), which corrupts QR/SVD-based
    # generators and metrics.  The framework's matmuls are tiny relative to
    # runtime, so "highest" costs nothing measurable and keeps metric parity
    # with the reference's f32 LAPACK numerics.
    jax.config.update("jax_default_matmul_precision", "highest")


enable()
