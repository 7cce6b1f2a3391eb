"""Validate the periodic-reshuffle carried stream on the real chip.

Two checks at the canonical bench config (n=m=1000, d=2, p=0.2, 30
epochs):

1. Statistics: final accuracy / gt_accuracy / pearson distributions with
   MFCD_RESHUFFLE_PERIOD=4 (periodic PRP + cheap mixing epochs) must match
   PERIOD=1 (fresh PRP every epoch) within overlapping 95% CIs over
   ``--reps`` seeds.  Both realize different permutations, so this is the
   same distribution-level bar the torch parity suite applies.
2. Timing: steady-state s/run for each period.

Usage: python scripts/validate_reshuffle.py [--reps 16] [--periods 1,4]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_period(period: int, reps: int, seed: int):
    import os

    # The engine resolves the period per call (outside every jit), so the
    # env var is honored without any cache clearing.
    os.environ["MFCD_RESHUFFLE_PERIOD"] = str(period)

    from mfcd_tpu.core.config import RunConfig
    from mfcd_tpu.sweep.batched import run_bucket

    cfg = RunConfig(n=1000, m=1000, d=2, p=0.2, s=5.0, lr=1e-3,
                    weight_decay=5e-6, num_epochs=30, reps=reps, K=1)
    rows = [{"s": 5.0, "lr": 1e-3, "weight_decay": 5e-6}]
    out = run_bucket(cfg, rows, [0], seed=seed)            # compile+run
    t0 = time.time()
    out = run_bucket(cfg, rows, [0], seed=seed + 1)
    dt = (time.time() - t0) / reps
    return out[0], dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--periods", default="1,4")
    args = ap.parse_args()

    import numpy as np

    import mfcd_tpu  # noqa: F401
    from mfcd_tpu.cache import ensure_cache_healthy

    ensure_cache_healthy()

    summary = {}
    for period in [int(p) for p in args.periods.split(",")]:
        res, dt = run_period(period, args.reps, seed=777)
        stats = {}
        for key in ("accuracy", "gt_accuracy", "pearson_corr"):
            v = np.asarray(res[key], dtype=np.float64)
            mean = float(v.mean())
            half = float(1.96 * v.std(ddof=1) / np.sqrt(len(v)))
            stats[key] = {"mean": round(mean, 4), "ci95": round(half, 4)}
        summary[period] = {"stats": stats, "s_per_run": round(dt, 4)}
        log(f"period={period}: {stats} {dt:.3f}s/run")

    # CI overlap check for every metric between every period pair.
    periods = sorted(summary)
    ok = True
    for key in ("accuracy", "gt_accuracy", "pearson_corr"):
        for a in periods:
            for b in periods:
                if a >= b:
                    continue
                sa, sb = summary[a]["stats"][key], summary[b]["stats"][key]
                gap = abs(sa["mean"] - sb["mean"])
                bound = sa["ci95"] + sb["ci95"]
                if gap > bound:
                    ok = False
                    log(f"MISMATCH {key}: period {a} vs {b}: "
                        f"|{sa['mean']}-{sb['mean']}|={gap:.4f} > {bound:.4f}")

    print(json.dumps({"ok": ok, "summary": summary}))


if __name__ == "__main__":
    main()
