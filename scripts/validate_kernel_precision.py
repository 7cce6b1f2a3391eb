"""On-device validation of the epoch kernel's split-3 one-hot matmuls.

The kernel computes its two dot_generals as three 1-pass
(DEFAULT-precision) dots over an exact 3-term bf16-representable split
of the value operand (``ops/kernels.py::_dot3``) — value-exact, ~27%
faster per step than one 6-pass HIGHEST dot.  Scatter sums over
duplicate rows are value-exact but ORDER-differ from HIGHEST by ~1 ulp,
which chaotic SGD amplifies over 37,500 steps — so the on-device
pallas-vs-jnp check is statistical + allclose-on-losses, not bitwise:

1. run_bucket(pallas) vs run_bucket(jnp) at the bench bucket: train/val
   loss curves must track within the interpret-mode equivalence bar
   (rtol 2e-3), and final metrics must sit within a per-metric window
   consistent with the per-rep spread;
2. steady-state timing of both paths (the split-3 win shows in pallas).

Usage (single TPU process; serialize with the session flock):
    python scripts/validate_kernel_precision.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import mfcd_tpu  # noqa: F401
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from mfcd_tpu.core.config import RunConfig
    from mfcd_tpu.sweep.batched import run_bucket

    cfg = RunConfig(n=1000, m=1000, d=2, p=0.2, s=5.0, lr=1e-3,
                    weight_decay=5e-6, num_epochs=30, reps=4, K=1)
    rows = [{"s": 5.0 + k, "lr": 1e-3, "weight_decay": 5e-6}
            for k in range(2)]
    idx = [0, 1]

    outs = {}
    times = {}
    for use_pallas in (True, False):
        run_bucket(cfg, rows, idx, seed=99, use_pallas=use_pallas)  # compile
        t0 = time.time()
        outs[use_pallas] = run_bucket(cfg, rows, idx, seed=99,
                                      use_pallas=use_pallas)
        times[use_pallas] = time.time() - t0
        log(f"use_pallas={use_pallas}: {times[use_pallas]:.3f}s steady "
            f"({times[use_pallas] / (len(rows) * cfg.reps) * 1e3:.1f} "
            f"ms/run)")

    problems = []
    # Loss curves: identical data/init/shuffles, so per-epoch losses
    # differ only by the summation-order ulps (amplified along the
    # trajectory); the first epochs must agree tightly and the whole
    # curve loosely.
    for ci, (a, b) in enumerate(zip(outs[True], outs[False])):
        for k in ("train_losses", "val_losses"):
            pa = np.asarray(a[k], np.float64)
            pb = np.asarray(b[k], np.float64)
            if not np.allclose(pa[:, 0], pb[:, 0], rtol=2e-3, atol=1e-4):
                problems.append(f"{k}[cfg {ci}] epoch0 diverged: "
                                f"{pa[:, 0]} vs {pb[:, 0]}")
            if not np.allclose(pa, pb, rtol=0.15, atol=5e-3):
                problems.append(f"{k}[cfg {ci}] curve outside 15%")
    # Final metrics: same-seed pallas vs jnp must sit within a window
    # consistent with the per-rep spread (trajectory-level agreement).
    for key, tol in (("accuracy", 0.02), ("gt_accuracy", 1e-6),
                     ("pearson_corr", 0.05),
                     ("reconstruction_errors", 0.05)):
        for ci, (a, b) in enumerate(zip(outs[True], outs[False])):
            pa = np.asarray(a[key], np.float64)
            pb = np.asarray(b[key], np.float64)
            if np.max(np.abs(pa - pb)) > tol:
                problems.append(
                    f"{key}[cfg {ci}]: |delta| {np.max(np.abs(pa - pb))}"
                    f" > {tol} ({pa} vs {pb})")
    ok = not problems
    for p in problems:
        log("PROBLEM:", p)
    log(f"pallas(split3) ~= jnp(HIGHEST) within windows: {ok}")
    print(json.dumps({
        "ok": ok,
        "problems": problems[:10],
        "s_per_run_pallas": round(times[True] / (len(rows) * cfg.reps), 4),
        "s_per_run_jnp": round(times[False] / (len(rows) * cfg.reps), 4),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
