"""Scripted equivalents of every ``Runs.ipynb`` sweep cell.

Each function reproduces one canonical experiment grid of the reference
notebook (cells 3-23), parameterized by ``scale`` so CI can run miniature
versions of the same sweeps.  ``fast=True`` routes through the bucketed,
mesh-shardable engine (``parameter_scan_fast``); the default is the
sequential-compatible ``parameter_scan``.

Usage:
    python -m experiments.runs s_p_sweep --out Data_final/s_p.pkl
    python -m experiments.runs --list
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from mfcd_tpu.sweep.engine import parameter_scan
from mfcd_tpu.sweep.batched import parameter_scan_fast
from mfcd_tpu.sweep.ground_truth import parameter_scan_ground_truth


def _scan(fast, **kw):
    if fast:
        kw.pop("device", None)
        return parameter_scan_fast(**kw)
    return parameter_scan(**kw)


def s_p_sweep(out=None, save_every=10, fast=False, scale=1.0):
    """Runs.ipynb cell 3: s x p (x weight_decay) at K=1, soft labels."""
    n = m = int(1000 * scale) or 10
    s_values = np.concatenate([
        np.logspace(-1, 1, 20), [1e-4, 1e-3, 1e-2], np.logspace(1, 2, 10)
    ])
    return _scan(
        fast, n=n, m=m, d=2,
        p=[0.1, 0.2, 0.3, 0.4, 0.5],
        s=list(s_values),
        weight_decay=[5e-6, 5e-3],
        num_epochs=30, reps=5, K=1, soft_label=True,
        save_path=out, save_every=save_every,
    )


def s_k_sweep(out=None, save_every=10, fast=False, scale=1.0):
    """Runs.ipynb cell 5: s x K (x weight_decay) at p=0.2."""
    n = m = int(1000 * scale) or 10
    return _scan(
        fast, n=n, m=m, d=2, p=0.2,
        s=list(np.logspace(-1, 1, 20)),
        K=[1, 2, 4, 10, 50],
        weight_decay=[1e-6, 1e-5, 5e-5, 1e-4, 5e-4, 1e-3, 5e-3],
        num_epochs=30, reps=5,
        save_path=out, save_every=save_every,
    )


def pk_const_sweep(out=None, save_every=10, fast=False, scale=1.0):
    """Runs.ipynb cell 7: p*K held constant (linear scan); the derived
    ``pxK`` parameter is patched into the saved params post-hoc, exactly as
    the notebook does."""
    n = m = int(1000 * scale) or 10
    p_list, k_list, s_list, px_list = [], [], [], []
    for const in [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.8, 1.0]:
        for k in [1, 2, 4, 5, 10]:
            p = const / k
            if p <= 1.0:
                for s in [1, 3, 5, 8]:
                    p_list.append(round(p, 6))
                    k_list.append(k)
                    s_list.append(float(s))
                    px_list.append(const)
    results = _scan(
        fast, n=n, m=m, d=2, p=p_list, K=k_list, s=s_list, linear=True,
        num_epochs=30, reps=3,
        save_path=out, save_every=save_every,
    )
    for exp, px in zip(results, px_list):
        exp["params"]["pxK"] = px
    return results


def p_k_sweep(out=None, save_every=10, fast=False, scale=1.0):
    """Runs.ipynb cell 9: p x K at s=5."""
    n = m = int(1000 * scale) or 10
    p_values = list(np.logspace(-2, np.log10(0.2), 20)) + [0.3, 0.4, 0.5]
    return _scan(
        fast, n=n, m=m, d=2, p=p_values, K=[1, 2, 3, 5, 10], s=5.0,
        num_epochs=30, reps=3,
        save_path=out, save_every=save_every,
    )


def ps_const_sweep(out=None, save_every=10, fast=False, scale=1.0):
    """Runs.ipynb cell 11: p*s held constant (linear scan)."""
    n = m = int(1000 * scale) or 10
    p_list, s_list = [], []
    for target in [0.12, 0.2, 0.3, 0.4, 0.5]:
        for p in np.round(np.linspace(0.05, 0.5, 10), 3):
            s = round(target / p, 3)
            if 0.1 <= s <= 100:
                p_list.append(float(p))
                s_list.append(s)
    results = _scan(
        fast, n=n, m=m, d=2, p=p_list, s=s_list, linear=True,
        num_epochs=30, reps=3,
        save_path=out, save_every=save_every,
    )
    for exp in results:
        exp["params"]["p*s"] = round(
            exp["params"]["p"] * exp["params"]["s"], 4)
    return results


def p_d_sweep(out=None, save_every=10, fast=False, scale=1.0):
    """Runs.ipynb cell 13: p x d at s=5."""
    n = m = int(1000 * scale) or 10
    return _scan(
        fast, n=n, m=m, s=5.0,
        p=[0.1, 0.2, 0.5, 0.8, 1.0],
        d=[2, 4, 6, 8, 10],
        num_epochs=30, reps=3,
        save_path=out, save_every=save_every,
    )


STRATEGIES_SWEPT = (
    "random", "proximity", "margin", "variance", "popularity", "top_k", "svd",
)


def strategies_s_sweep(out=None, save_every=5, fast=False, scale=1.0):
    """Runs.ipynb cell 16: 7 strategies x s (x wd), per-strategy results.

    The notebook writes one pickle per strategy; with ``out`` set, this
    writes ``{out}_{strategy}.pkl`` files the same way.
    """
    n = m = int(1000 * scale) or 10
    all_results = {}
    for strategy in STRATEGIES_SWEPT:
        path = f"{out}_{strategy}.pkl" if out else None
        all_results[strategy] = _scan(
            fast, n=n, m=m, d=2, p=0.2,
            s=list(np.logspace(-1, 1, 10)),
            weight_decay=[5e-6, 5e-4],
            strategy=strategy, num_epochs=30, reps=3,
            save_path=path, save_every=save_every,
        )
    return all_results


def strategies_p_sweep(out=None, save_every=5, fast=False, scale=1.0):
    """Runs.ipynb cell 18: 7 strategies x p at s=5."""
    n = m = int(1000 * scale) or 10
    p_values = list(np.logspace(-2, np.log10(0.2), 20))
    all_results = {}
    for strategy in STRATEGIES_SWEPT:
        path = f"{out}_{strategy}.pkl" if out else None
        all_results[strategy] = _scan(
            fast, n=n, m=m, d=2, p=p_values, s=5.0,
            strategy=strategy, num_epochs=30, reps=3,
            save_path=path, save_every=save_every,
        )
    return all_results


def gt_p_k_sweep(out=None, fast=False, scale=1.0, reps=3):
    """Runs.ipynb cell 21: ground-truth-only p x K scan."""
    n = m = int(1000 * scale) or 10
    results = parameter_scan_ground_truth(
        n=n, m=m, d=2, s=5.0,
        p=list(np.logspace(-4, 0, 30)), K=[10, 1], reps=reps,
    )
    if out:
        import pickle

        with open(out, "wb") as f:
            pickle.dump(results, f)
    return results


def gt_d_s_sweep(out=None, fast=False, scale=1.0, reps=3):
    """Runs.ipynb cell 23: ground-truth-only d x s scan."""
    n = m = int(1000 * scale) or 10
    results = parameter_scan_ground_truth(
        n=n, m=m, p=0.2, d=[1, 2, 3, 4, 5, 6, 7], s=[1.0, 3.0, 9.0],
        K=1, reps=reps,
    )
    if out:
        import pickle

        with open(out, "wb") as f:
            pickle.dump(results, f)
    return results


ALL = {
    fn.__name__: fn
    for fn in (
        s_p_sweep, s_k_sweep, pk_const_sweep, p_k_sweep, ps_const_sweep,
        p_d_sweep, strategies_s_sweep, strategies_p_sweep,
        gt_p_k_sweep, gt_d_s_sweep,
    )
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sweep", nargs="?", choices=sorted(ALL), default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--fast", action="store_true",
                    help="bucketed/mesh-shardable engine")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="matrix-size scale factor (1.0 = n=m=1000)")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args(argv)
    if args.list or not args.sweep:
        for name, fn in sorted(ALL.items()):
            print(f"{name:24s} {fn.__doc__.splitlines()[0]}")
        return 0
    ALL[args.sweep](out=args.out, fast=args.fast, scale=args.scale)
    return 0


if __name__ == "__main__":
    sys.exit(main())
