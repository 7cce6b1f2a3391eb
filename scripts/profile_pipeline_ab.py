"""A/B timing of the 1-deep bucket pipeline (MFCD_PIPELINE) on device.

Runs the bench --sweep grid (20 s-values x 2 weight decays x 3 reps on the
canonical n=m=1000 config) through ``parameter_scan_fast`` with the real
pickle protocol, pipeline OFF and ON (warm compile both sides, two timed
passes each, interleaved), and reports s/run.  The pipeline hides the
host-side device_get/export/pickle (~7.7 ms/run export at this bucket,
NOTES_ROUND3.md) behind device compute.

Decision rule (VERDICT r3 item 3): accept (flip default on) only on a
clear measured win; otherwise keep default off or delete.

Run standalone (single TPU process):
    python scripts/profile_pipeline_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import mfcd_tpu  # noqa: F401 — enables the persistent compile cache


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_once(pipeline: bool, save_path: str, seed: int) -> float:
    from mfcd_tpu.sweep.batched import parameter_scan_fast

    os.environ["MFCD_PIPELINE"] = "1" if pipeline else "0"
    t0 = time.time()
    parameter_scan_fast(
        n=1000, m=1000, d=2, p=0.2, s=list(np.logspace(-1, 1, 20)),
        weight_decay=[5e-6, 5e-4], num_epochs=30, reps=3,
        save_path=save_path, save_every=4, seed=seed,
    )
    return time.time() - t0


def main():
    from mfcd_tpu.cache import ensure_cache_healthy

    ensure_cache_healthy()
    total_runs = 20 * 2 * 3
    # Warmup (compiles + executable upload through the tunnel).
    warm = run_once(False, "/tmp/pipe_ab_warm.pkl", seed=7)
    log(f"warmup: {warm:.1f}s")
    times = {False: [], True: []}
    for rep in range(2):
        for pipeline in (False, True):
            dt = run_once(pipeline, f"/tmp/pipe_ab_{pipeline}_{rep}.pkl",
                          seed=100 + rep)
            times[pipeline].append(dt)
            log(f"pipeline={pipeline} pass {rep}: {dt:.2f}s "
                f"({dt / total_runs * 1000:.1f} ms/run)")
    off = min(times[False])
    on = min(times[True])
    speedup = off / on
    log(f"best: off {off:.2f}s, on {on:.2f}s "
        f"-> speedup {speedup:.3f}x "
        f"({(off - on) / total_runs * 1000:.2f} ms/run hidden)")
    print(f"PIPELINE_AB off={off:.3f} on={on:.3f} speedup={speedup:.4f}")

    # Acceptance: a clear measured win (>= 2%) flips the committed
    # default via the decision artifact (core/decisions.py); anything
    # less keeps the conservative off default.  Recorded only when the
    # measurement ran on the real chip.
    from mfcd_tpu.core.decisions import record_decision

    path = record_decision(
        "pipeline", speedup >= 1.02,
        {"off_s": round(off, 3), "on_s": round(on, 3),
         "speedup": round(speedup, 4), "rule": "enable iff speedup>=1.02",
         "grid": "bench --sweep (20 s x 2 wd x 3 reps, n=m=1000)"})
    log(f"decision recorded: {path}" if path
        else "decision NOT recorded (cpu backend)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
