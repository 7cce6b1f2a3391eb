"""Fresh-cache compile-cost split of the graded-bench stages (device).

The graded bench's fresh-cache warmup grew 49 s (r01) -> 151 s (r02) ->
1,137.9 s (r04) on this 1-core host (BENCH_r0*.json tails) — 19 minutes
of compile before the first measured run.  Before attacking it, measure
which of the engine's four jitted stages (sample / label / train /
metrics, ``sweep/engine.py``) actually owns the time.

Method: point the persistent compile cache at a throwaway directory
(``MFCD_JAX_CACHE_DIR`` must be in the environment BEFORE this process
imports mfcd_tpu — the wrapper below re-execs to guarantee it), then
drive the exact bench bucket (canonical n=m=1000, d=2, p=0.2, B=2 x R=4,
``bench.py``) stage by stage, timing each first call (compile + one
execution) against a second call (steady).  The difference is that
stage's fresh-compile cost through the axon remote-compile helper.

Usage (single TPU process; serialize with the session flock):
    flock .tpu_session.lock python scripts/profile_compile_stages.py
Optional: --strategy user_similarity (times the cascade sample program),
          --k10 (adds the K=10 label/train shapes of ``time_k10``).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

if os.environ.get("_MFCD_COMPILE_PROF_CHILD") != "1":
    # Re-exec with a throwaway cache dir set before any jax/mfcd import.
    env = dict(os.environ)
    env["MFCD_JAX_CACHE_DIR"] = tempfile.mkdtemp(prefix="mfcd_freshcache_")
    env["_MFCD_COMPILE_PROF_CHILD"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import mfcd_tpu  # noqa: F401  (cache -> throwaway dir, matmul precision)
import jax
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, fn, results):
    # Measures trace + compile + enqueue: on axon, block_until_ready is a
    # no-op, and that is FINE here — this profiler isolates compile cost,
    # and execution (fractions of a second per stage at B=2 x R=4) would
    # only blur it.  Steady-state execution is measured separately below
    # with a forced host transfer.
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    dt = time.time() - t0
    results.append((name, dt))
    log(f"{name:34s} {dt:9.1f}s")
    return out


def main():
    strategy = "random"
    if "--strategy" in sys.argv:
        strategy = sys.argv[sys.argv.index("--strategy") + 1]

    from mfcd_tpu.core import rng
    from mfcd_tpu.core.config import RunConfig
    from mfcd_tpu.sampling.dedup import _next_pow2
    from mfcd_tpu.sweep import engine as eng

    cfg = RunConfig(
        n=1000, m=1000, d=2, p=0.2, s=5.0, lr=1e-3, weight_decay=5e-6,
        num_epochs=30, reps=4, K=1, strategy=strategy, generation="base",
    )
    b = 2
    log(f"cache dir: {os.environ['MFCD_JAX_CACHE_DIR']}")
    log(f"device: {jax.devices()[0]}  strategy={strategy}")

    base = jax.random.key(123)
    cfg_keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        np.arange(b, dtype=np.int32))
    s = np.full((b,), 5.0, np.float32)
    lr = np.full((b,), 1e-3, np.float32)
    wd = np.full((b,), 5e-6, np.float32)
    r = cfg.reps
    rep_keys2d = jax.vmap(lambda ck: rng.rep_keys(ck, r))(cfg_keys)

    sh = cfg.shapes()
    caps = eng.compile_caps(cfg)
    t_cap, extra_cap = caps
    sk = eng.SampleStatics(
        n=cfg.n, m=cfg.m, d=cfg.d, t_cap=t_cap, extra_cap=extra_cap,
        strategy=cfg.strategy, popularity_method=cfg.popularity_method,
        alpha=cfg.alpha, generation=cfg.generation,
    )
    budgets = np.full((b,), sh.num_triplets, np.int32)
    extra_budgets = np.full((b,), sh.extra_test_triplets, np.int32)
    if (np.all(budgets == t_cap) and np.all(extra_budgets == extra_cap)):
        budgets = extra_budgets = None

    results = []
    t_all = time.time()
    x, params, splits, streams = timed(
        "sample (fresh)", lambda: eng._sample_bucket(
            sk, rep_keys2d, budgets, extra_budgets), results)

    from mfcd_tpu.ops.shuffle import default_reshuffle_period

    period = default_reshuffle_period()
    train, val, test = timed(
        "label (fresh)", lambda: eng._label_bucket(
            x, splits, streams, s, K=cfg.K, soft_label=cfg.soft_label),
        results)

    train = timed("pad train (fresh)", lambda: eng._pad_rows(
        train, _next_pow2(train.u.shape[-1])), results)
    val = eng._pad_rows(val, _next_pow2(val.u.shape[-1]))
    test = eng._pad_rows(test, _next_pow2(test.u.shape[-1]))

    use_pallas = eng.default_use_pallas(cfg)
    log(f"use_pallas={use_pallas}")
    if use_pallas:
        params2, tl, vl = timed(
            "train pallas (fresh)", lambda: eng._train_bucket_pallas(
                params, train, val, streams["epochs"], lr, wd,
                batch_size=cfg.batch_size, num_epochs=cfg.num_epochs,
                label_denom=cfg.K if cfg.soft_label else 1,
                reshuffle_period=period), results)
    else:
        params2, tl, vl = timed(
            "train jnp (fresh)", lambda: eng._train_bucket_jnp(
                params, train, val, streams["epochs"], lr, wd,
                batch_size=cfg.batch_size, num_epochs=cfg.num_epochs,
                reshuffle_period=period), results)

    metrics = timed(
        "metrics (fresh)", lambda: eng._metrics_bucket(
            params2, x, s, test, streams["sample_rows"],
            splits.sample.count, tl, vl, batch_size=cfg.batch_size),
        results)
    total_fresh = time.time() - t_all
    del metrics

    # Steady pass over the same stages (all cached in-process now).
    # Forced by device_get, NOT block_until_ready: on the axon platform
    # block_until_ready is a no-op (measured round 5: 0.000 s vs 6.997 s
    # device_get on an identical ~7 s program), so only a host transfer
    # actually waits for execution.
    t0 = time.time()
    out = eng._run_bucket_device(
        eng._shape_only(cfg), cfg_keys, s, lr, wd, use_pallas=use_pallas,
        caps=caps, budgets=None, extra_budgets=None)
    jax.device_get(out)
    steady = time.time() - t0

    payload = {
        "strategy": strategy,
        "stages_fresh_s": {k: round(v, 1) for k, v in results},
        "total_fresh_s": round(total_fresh, 1),
        "steady_bucket_s": round(steady, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(payload))
    outp = os.path.join("/root/repo/docs/device_r5",
                        f"compile_stages_{strategy}.json")
    os.makedirs(os.path.dirname(outp), exist_ok=True)
    with open(outp, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
