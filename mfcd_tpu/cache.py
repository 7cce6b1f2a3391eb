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


def _purge(cache_dir: str) -> int:
    """Delete every persistent-cache entry; returns the number removed."""
    removed = 0
    if not os.path.isdir(cache_dir):
        return removed
    for name in os.listdir(cache_dir):
        if name.endswith("-cache"):
            try:
                os.remove(os.path.join(cache_dir, name))
                removed += 1
            except OSError:
                pass
    return removed


def ensure_cache_healthy(cache_dir: str = DEFAULT_CACHE_DIR,
                         _canary=None, _fresh_probe=None) -> bool:
    """Detect and self-heal a poisoned persistent compile cache.

    After a TPU worker restart / libtpu roll, entries serialized by the old
    worker can fail to *load* on the new one with a bare
    ``FAILED_PRECONDITION`` at the first dispatch, while fresh compiles
    work (round-2 outage; remedy was a manual ``rm -rf .jax_cache``).
    This automates the differential diagnosis:

    1. run a fixed *canary* program (cached from any previous session);
    2. on FAILED_PRECONDITION, run a *never-cached* fresh program —
       if that also fails the backend itself is down: re-raise;
    3. if the fresh program works, the cache is poisoned: purge every
       entry, clear in-memory caches, and re-run the canary (which
       recompiles and re-banks it).

    Returns True when the cache was healthy, False when it was purged.
    Call at process start, after the first trivial device op.
    """
    import jax.numpy as jnp

    def default_canary():
        @jax.jit
        def _mfcd_cache_canary(x):
            return (x * 3.0 + 1.0).sum()

        return _mfcd_cache_canary(
            jnp.arange(97, dtype=jnp.float32)).block_until_ready()

    def default_fresh_probe():
        # A shape no other code path uses, varied per call so the compile
        # can never be served from the persistent cache.
        import time

        k = 1009 + (os.getpid() + int(time.time())) % 997
        return jnp.ones((k,), jnp.float32).sum().block_until_ready()

    canary = _canary or default_canary
    fresh_probe = _fresh_probe or default_fresh_probe

    def is_fp(err) -> bool:
        msg = str(err)
        return "FAILED_PRECONDITION" in msg or "FailedPrecondition" in msg

    try:
        canary()
        return True
    except Exception as e:  # noqa: BLE001 — status classified below
        if not is_fp(e):
            raise
        first_err = e
    # Differential: a fresh compile failing too means the backend is down.
    fresh_probe()
    import sys

    removed = _purge(cache_dir)
    print(
        f"⚠️ poisoned persistent compile cache detected "
        f"(FAILED_PRECONDITION on a cached program, fresh compile OK): "
        f"purged {removed} entries from {cache_dir}: {str(first_err)[:120]}",
        file=sys.stderr,
    )
    jax.clear_caches()
    canary()
    return False


enable()
