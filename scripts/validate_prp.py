"""Engine-level distribution validation of the PRP sampler fast paths.

For each PRP-eligible strategy, runs the FULL engine (sample -> label ->
train -> metrics) twice — MFCD_PRP_SAMPLER=1 (PRP prefix / PRP-distinct
proposals) vs 0 (legacy overdraw + hash dedup) — over ``--reps`` seeds,
and asserts the final accuracy / gt_accuracy / pearson distributions
match within overlapping 95% CIs.  Both modes target the identical
sampling distribution (the triplet-level chi-square suites pin that);
this is the end-to-end corroboration at the metric level, the same bar
``scripts/validate_reshuffle.py`` applied to the shuffle rework.

The kill switch is read at trace time, so each mode runs in its own
subprocess (fresh jit caches).  CPU-sized by default; pass --n/--m to
run production shapes on the chip.

Usage: python scripts/validate_prp.py [--reps 16] [--n 120] [--m 120]
Prints one JSON line {"ok": bool, per-strategy stats}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

STRATEGIES = ("random", "proximity", "top_k", "svd", "margin")

_WORKER = r"""
import json, os, sys
import numpy as np
from mfcd_tpu.core.config import RunConfig
from mfcd_tpu.sweep.batched import run_bucket

strategy, reps, n, m = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
cfg = RunConfig(n=n, m=m, d=2, p=0.3, s=5.0, lr=2e-2, weight_decay=5e-6,
                num_epochs=20, reps=reps, K=1, strategy=strategy)
rows = [{"s": 5.0, "lr": 2e-2, "weight_decay": 5e-6}]
out = run_bucket(cfg, rows, [0], seed=4242)[0]
stats = {}
for key in ("accuracy", "gt_accuracy", "pearson_corr"):
    v = np.asarray(out[key], dtype=np.float64)
    stats[key] = {"mean": float(v.mean()),
                  "ci95": float(1.96 * v.std(ddof=1) / np.sqrt(len(v)))}
print(json.dumps(stats))
"""


def run_mode(strategy: str, prp: int, reps: int, n: int, m: int) -> dict:
    env = dict(os.environ, MFCD_PRP_SAMPLER=str(prp))
    r = subprocess.run(
        [sys.executable, "-c", _WORKER, strategy, str(reps), str(n),
         str(m)],
        capture_output=True, text=True, timeout=3600, env=env,
        cwd="/root/repo")
    if r.returncode != 0:
        raise RuntimeError(f"{strategy} prp={prp}: {r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--n", type=int, default=120)
    ap.add_argument("--m", type=int, default=120)
    ap.add_argument("--strategies", nargs="*", default=list(STRATEGIES))
    args = ap.parse_args()

    ok = True
    summary = {}
    for strategy in args.strategies:
        a = run_mode(strategy, 1, args.reps, args.n, args.m)
        b = run_mode(strategy, 0, args.reps, args.n, args.m)
        entry = {"prp": a, "legacy": b, "mismatches": []}
        for key in ("accuracy", "gt_accuracy", "pearson_corr"):
            gap = abs(a[key]["mean"] - b[key]["mean"])
            bound = a[key]["ci95"] + b[key]["ci95"]
            if gap > bound:
                ok = False
                entry["mismatches"].append(
                    f"{key}: |{a[key]['mean']:.4f}-{b[key]['mean']:.4f}|"
                    f"={gap:.4f} > {bound:.4f}")
        summary[strategy] = entry
        print(f"{strategy}: prp acc {a['accuracy']['mean']:.4f}"
              f"±{a['accuracy']['ci95']:.4f}  legacy "
              f"{b['accuracy']['mean']:.4f}±{b['accuracy']['ci95']:.4f}"
              f"  {'OK' if not entry['mismatches'] else 'MISMATCH'}",
              file=sys.stderr, flush=True)
    print(json.dumps({"ok": ok, "summary": summary}))


if __name__ == "__main__":
    main()
