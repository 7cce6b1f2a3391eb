"""Scale demo: one full experiment far beyond the reference's canonical size.

The reference tops out at n = m = 1000 (``Runs.ipynb``; eager torch with
python-set sampling would take hours beyond that).  This driver runs the
complete pipeline — generate X*, sample triplets, BTL-label, split,
30-epoch Adam training, full 23-metric evaluation — at n = m = 10,000
(100x the canonical matrix, 1M triplets at p = 0.02) as compiled XLA
programs on one chip, and prints one JSON line with the wall-clock.

Usage:
    python scripts/scale_demo.py [--n 10000] [--p 0.02] [--epochs 30]
    python scripts/scale_demo.py --smoke    # tiny CPU-safe shapes
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--p", type=float, default=0.02)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--strategy", default="random")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes (CI / CPU)")
    args = ap.parse_args(argv)
    if args.smoke:
        args.n, args.p, args.epochs = 128, 0.05, 2

    from mfcd_tpu.core.config import RunConfig
    from mfcd_tpu.sweep.engine import run_config

    cfg = RunConfig(
        n=args.n, m=args.n, d=2, p=args.p, s=5.0, lr=1e-3,
        weight_decay=1e-5, num_epochs=args.epochs, reps=1,
        strategy=args.strategy,
    )
    sh = cfg.shapes()
    print(f"n=m={args.n} p={args.p}: {cfg.num_triplets:,} triplets, "
          f"{sh.train_rows:,} train rows, {args.epochs} epochs",
          file=sys.stderr, flush=True)

    t0 = time.time()
    res = run_config(cfg, seed=11)
    compile_and_run = time.time() - t0

    t0 = time.time()
    res = run_config(cfg, seed=12)
    steady = time.time() - t0

    print(json.dumps({
        "metric": f"scale_demo_full_run_seconds_{args.n}x{args.n}",
        "value": round(steady, 2),
        "unit": "s/run (steady state)",
        "first_call_s": round(compile_and_run, 2),
        "accuracy": res["accuracy"],
        "gt_accuracy": res["gt_accuracy"],
        "reconstruction_error_scaled": res["reconstruction_error_scaled"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
