"""Validate the multi-epoch window kernel on the real chip.

Three checks at the canonical bench config (n=m=1000, d=2, p=0.2, 30
epochs, reshuffle period 4):

1. Statistics: final accuracy / gt_accuracy / pearson distributions with
   MFCD_MULTIEPOCH=1 (window kernel: in-kernel lane-shear cheap epochs +
   fused val pass) must match MFCD_MULTIEPOCH=0 (per-epoch kernel +
   mix_stream rotation/tile-PRP) within overlapping 95% CIs over
   ``--reps`` seeds — the same distribution-level bar the torch parity
   suite applies (both paths realize different permutations).
2. Timing: steady-state s/run for each mode.
3. Loss sanity: per-epoch train/val curves finite and decreasing overall.

Usage: python scripts/validate_multiepoch.py [--reps 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_mode(multiepoch: int, reps: int, seed: int):
    # train_runs_pallas resolves MFCD_MULTIEPOCH per call (outside every
    # jit), so toggling the env var is honored without cache clearing.
    os.environ["MFCD_MULTIEPOCH"] = str(multiepoch)

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
    args = ap.parse_args()

    import numpy as np

    import mfcd_tpu  # noqa: F401
    from mfcd_tpu.cache import ensure_cache_healthy

    ensure_cache_healthy()

    summary = {}
    curves_ok = True
    for mode in (0, 1):
        res, dt = run_mode(mode, args.reps, seed=777)
        stats = {}
        for key in ("accuracy", "gt_accuracy", "pearson_corr"):
            v = np.asarray(res[key], dtype=np.float64)
            mean = float(v.mean())
            half = float(1.96 * v.std(ddof=1) / np.sqrt(len(v)))
            stats[key] = {"mean": round(mean, 4), "ci95": round(half, 4)}
        tl = np.asarray(res["train_losses"], dtype=np.float64)
        vl = np.asarray(res["val_losses"], dtype=np.float64)
        finite = bool(np.isfinite(tl).all() and np.isfinite(vl).all())
        decreasing = bool((tl[:, -1] < tl[:, 0]).all())
        curves_ok &= finite and decreasing
        summary[mode] = {"stats": stats, "s_per_run": round(dt, 4),
                         "curves_finite": finite,
                         "train_loss_decreased": decreasing}
        log(f"multiepoch={mode}: {stats} {dt:.3f}s/run "
            f"finite={finite} decreasing={decreasing}")

    ok = curves_ok
    for key in ("accuracy", "gt_accuracy", "pearson_corr"):
        sa, sb = summary[0]["stats"][key], summary[1]["stats"][key]
        gap = abs(sa["mean"] - sb["mean"])
        bound = sa["ci95"] + sb["ci95"]
        if gap > bound:
            ok = False
            log(f"MISMATCH {key}: |{sa['mean']}-{sb['mean']}|"
                f"={gap:.4f} > {bound:.4f}")

    # Acceptance (VERDICT r3 item 2): the window kernel's committed
    # default flips on only if the CI-overlap bar passes AND it measures
    # faster than the per-epoch kernel at the canonical config.
    # Recorded only when the measurement ran on the real chip.
    enable = ok and summary[1]["s_per_run"] < summary[0]["s_per_run"]
    from mfcd_tpu.core.decisions import record_decision

    path = record_decision(
        "multiepoch", enable,
        {"summary": {str(k): v for k, v in summary.items()},
         "rule": "enable iff CI-overlap ok and on-path s/run < off-path"})
    log(f"decision recorded: {path}" if path
        else "decision NOT recorded (cpu backend)")

    print(json.dumps({"ok": ok, "enable": enable,
                      "summary": {str(k): v for k, v in summary.items()}}))


if __name__ == "__main__":
    main()