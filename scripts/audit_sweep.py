"""Post-sweep anomaly audit: flag runs that look corrupted, not just hard.

Motivated by a real incident (round 2): a sick TPU worker, minutes before
OOM-crashing, silently produced garbage training rows for one shape
bucket — every K=10 config of the cell-5 sweep "trained" to exactly
ln(2) loss with chance accuracy while its GT oracle sat at 0.99.  Results
were schema-valid; only cross-checking trained accuracy against the
config's own oracle exposed them.

The CORRUPT tier flags an experiment when, for any repetition:
  - gt_accuracy says the task is clearly learnable (> gt_thresh), AND
  - trained accuracy is at chance (within chance_band of 0.5), AND
  - the ENTIRE train-loss curve sits within ln2_tol of ln(2) — the model
    saw signal-free inputs from the very first step.  Legitimately hard
    or over-regularized configs start above ln(2) (random-init loss on
    informative labels) and only decay toward it, so they do not match;
    weak configs (tiny s or p) fail the gt_accuracy clause because the
    oracle itself is at chance there.

Usage:
    python scripts/audit_sweep.py Data_final/*.pkl
Exit code 1 when anything is CORRUPT (cron/pipeline friendly).
"""

from __future__ import annotations

import glob
import math
import pickle
import sys

import numpy as np

_LN2 = math.log(2.0)


def audit_results(results, gt_thresh=0.7, chance_band=0.05, ln2_tol=2e-3):
    """Return a list of (index, params, detail) corruption anomalies."""
    flagged = []
    for idx, exp in enumerate(results):
        res = exp.get("results", {})
        gt = res.get("gt_accuracy")
        acc = res.get("accuracy")
        tl = res.get("train_losses")
        if not gt or not acc or not tl:
            continue
        for rep, (g, a, curve) in enumerate(zip(gt, acc, tl)):
            if not curve:
                continue
            pinned = max(abs(v - _LN2) for v in curve) < ln2_tol
            if g > gt_thresh and abs(a - 0.5) < chance_band and pinned:
                flagged.append((
                    idx, exp.get("params", {}),
                    f"rep {rep}: gt={g:.3f} acc={a:.3f} "
                    f"loss pinned at ln2 "
                    f"({curve[0]:.5f}->{curve[-1]:.5f})",
                ))
                break
    return flagged


def main(argv=None):
    paths = []
    for pat in (argv or sys.argv[1:]):
        paths.extend(sorted(glob.glob(pat)))
    if not paths:
        print("usage: audit_sweep.py <pickle glob> [...]")
        return 2
    total = 0
    for path in paths:
        with open(path, "rb") as f:
            results = pickle.load(f)
        flagged = audit_results(results)
        marker = "❌" if flagged else "✅"
        print(f"{marker} {path}: {len(results)} experiments, "
              f"{len(flagged)} flagged")
        for idx, params, detail in flagged[:10]:
            keys = {k: params.get(k) for k in ("s", "p", "K", "d",
                                               "weight_decay", "strategy")}
            print(f"   [{idx}] {keys}: {detail}")
        if len(flagged) > 10:
            print(f"   ... and {len(flagged) - 10} more")
        total += len(flagged)
    return 1 if total else 0


if __name__ == "__main__":
    sys.exit(main())
