"""A/B timing of the fused label->pad->train stage (MFCD_FUSE_LABEL).

Times steady-state ``run_bucket`` at the bench configuration with the
separate-stage path vs the fused program (both warm), interleaved twice.
The fusion saves two dispatches and the unpadded-splits HBM round trip;
round 3 measured the label stage at 7.4 ms/run against a ~3-4 ms gather
floor, so the expected win is the ~3-4 ms/run dispatch remainder
(NOTES_ROUND3.md candidate #2).

Decision rule (VERDICT r3 item 3): accept (flip default on) on a clear
win; otherwise keep off or delete.  NB this script times ONE capacity
bucket; fusion embeds a trainer compile per capacity bucket (the
separate-stage trainer is shared across buckets via pow2 padding — see
engine._label_train_bucket), so acceptance additionally requires the
steady-state saving to beat (trainer compile time) x (distinct capacity
buckets) over a realistic sweep, e.g. the Runs.ipynb p-sweeps' ~6
capacity buckets.

Run standalone (single TPU process):
    python scripts/profile_fuse_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import mfcd_tpu  # noqa: F401 — enables the persistent compile cache


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from mfcd_tpu.cache import ensure_cache_healthy
    from mfcd_tpu.core.config import RunConfig
    from mfcd_tpu.sweep.batched import run_bucket

    ensure_cache_healthy()
    cfg = RunConfig(n=1000, m=1000, d=2, p=0.2, s=5.0, lr=1e-3,
                    weight_decay=5e-6, num_epochs=30, reps=4, K=1)
    rows = [{"s": 5.0 + k, "lr": 1e-3, "weight_decay": 5e-6}
            for k in range(2)]
    total_runs = len(rows) * cfg.reps

    def timed(fuse, seed):
        os.environ["MFCD_FUSE_LABEL"] = "1" if fuse else "0"
        t0 = time.time()
        out = run_bucket(cfg, rows, [0, 1], seed=seed)
        dt = time.time() - t0
        return dt, [round(float(a), 4) for a in out[0]["accuracy"]]

    # Warmup both programs (compile + executable upload).
    for fuse in (False, True):
        dt, _ = timed(fuse, seed=9)
        log(f"warmup fuse={fuse}: {dt:.1f}s")

    times = {False: [], True: []}
    for rep in range(3):
        for fuse in (False, True):
            dt, acc = timed(fuse, seed=100 + rep)
            times[fuse].append(dt)
            log(f"fuse={fuse} pass {rep}: {dt:.3f}s "
                f"({dt / total_runs * 1000:.1f} ms/run) acc={acc}")
    off, on = min(times[False]), min(times[True])
    speedup = off / on
    log(f"best: off {off:.3f}s, on {on:.3f}s -> "
        f"{(off - on) / total_runs * 1000:.2f} ms/run saved, "
        f"speedup {speedup:.4f}x")
    print(f"FUSE_AB off={off:.4f} on={on:.4f} speedup={speedup:.4f}")
    os.environ.pop("MFCD_FUSE_LABEL", None)

    # Acceptance: fusion embeds a full trainer compile per capacity
    # bucket (the separate-stage trainer is SHARED across buckets via
    # pow2 padding), so a steady-state win must clear a higher bar
    # (>= 5%) to pay for the compile-cache fragmentation it causes.
    # Recorded only when the measurement ran on the real chip.
    from mfcd_tpu.core.decisions import record_decision

    path = record_decision(
        "fuse_label", speedup >= 1.05,
        {"off_s": round(off, 4), "on_s": round(on, 4),
         "speedup": round(speedup, 4),
         "rule": "enable iff speedup>=1.05 (compile fragmentation tax)",
         "bucket": "bench bucket (2 cfg x 4 reps, n=m=1000, 30 epochs)"})
    log(f"decision recorded: {path}" if path
        else "decision NOT recorded (cpu backend)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
