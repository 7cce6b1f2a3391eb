"""experiments/plots.py — every scripted Plots.ipynb figure cell renders.

Synthesizes schema-compatible sweep pickles (no device work; the viz layer
is numpy/matplotlib-only) and drives each figure function the way
``scripts/make_all_figures.sh`` does.
"""

import pickle

import numpy as np
import pytest

import experiments.plots as plots

REPS, EPOCHS, N, M = 2, 3, 12, 10


def _results(rng):
    n_kept = N - 1  # exporter drops masked rows
    return {
        "reconstruction_errors": list(rng.uniform(0.2, 1.0, REPS)),
        "log_likelihoods": list(-rng.uniform(0.4, 0.8, REPS)),
        "accuracy": list(rng.uniform(0.5, 1.0, REPS)),
        "gt_log_likelihoods": list(-rng.uniform(0.1, 0.3, REPS)),
        "gt_accuracy": list(rng.uniform(0.6, 0.9, REPS)),
        "train_losses": [list(rng.uniform(0.3, 0.7, EPOCHS)) for _ in range(REPS)],
        "val_losses": [list(rng.uniform(0.3, 0.7, EPOCHS)) for _ in range(REPS)],
        "alpha": list(rng.uniform(0.1, 1.0, REPS)),
        "norm_X": list(rng.uniform(50, 60, REPS)),
        "norm_ratio": list(rng.uniform(0.5, 2.0, REPS)),
        "reconstruction_error_scaled": list(rng.uniform(0.1, 1.0, REPS)),
        "pearson_corr": list(rng.uniform(0.0, 1.0, REPS)),
        "pearson_std": list(rng.uniform(0.0, 0.2, REPS)),
        "spearman_corr": list(rng.uniform(0.0, 1.0, REPS)),
        "spearman_std": list(rng.uniform(0.0, 0.2, REPS)),
        "svd_error_scaled": list(rng.uniform(0.0, 1.0, REPS)),
        "slopes": [list(rng.uniform(0.0, 1.5, n_kept)) for _ in range(REPS)],
        "pearson_corr_matrix": [list(rng.uniform(0, 1, n_kept)) for _ in range(REPS)],
        "spearman_corr_matrix": [list(rng.uniform(0, 1, n_kept)) for _ in range(REPS)],
        "reconstruction_error_scaled_per_row": list(rng.uniform(0.1, 1.0, REPS)),
        "alpha_per_row": [list(rng.uniform(0.0, 1.5, n_kept)) for _ in range(REPS)],
        "sampled_UVT_rows": [rng.normal(size=(2, M)).tolist() for _ in range(REPS)],
        "sampled_X_rows": [rng.normal(size=(2, M)).tolist() for _ in range(REPS)],
    }


def _params(**over):
    base = dict(n=N, m=M, d=2, p=0.3, lr=1e-3, weight_decay=1e-5,
                num_epochs=EPOCHS, reps=REPS, s=5.0, K=1, d1=None,
                strategy="random", popularity_method="zipf", alpha=1.5,
                soft_label=False, generation="base")
    base.update(over)
    return base


def _dump(tmp_path, name, param_grid):
    rng = np.random.default_rng(0)
    data = [{"params": _params(**over), "results": _results(rng)}
            for over in param_grid]
    path = tmp_path / name
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return str(path)


@pytest.fixture()
def outdir(tmp_path):
    return str(tmp_path / "figs")


def test_s_sweep_figures_by_p(tmp_path, outdir):
    pkl = _dump(tmp_path, "s_p.pkl",
                [dict(s=s, p=p, weight_decay=wd)
                 for s in (0.5, 5.0) for p in (0.2, 0.4) for wd in (1e-5, 1e-3)])
    plots.s_sweep_figures(pkl, outdir=outdir)


def test_s_sweep_figures_by_k(tmp_path, outdir):
    pkl = _dump(tmp_path, "s_k.pkl",
                [dict(s=s, K=k) for s in (0.5, 5.0) for k in (1, 10)])
    plots.s_sweep_figures(pkl, outdir=outdir)


def test_per_row_diagnostics(tmp_path, outdir):
    pkl = _dump(tmp_path, "s.pkl", [dict(s=s) for s in (0.1, 5.0, 100.0)])
    plots.per_row_diagnostics(pkl, outdir=outdir)


def test_p_sweep_figures_with_derived(tmp_path, outdir):
    grid = [dict(p=p, K=k) for p in (0.05, 0.2) for k in (1, 5)]
    pkl = _dump(tmp_path, "p_k.pkl", grid)
    plots.p_sweep_figures(pkl, outdir=outdir)
    # Derived-axis variant (cell 17 patches pxK into the pickle post-hoc).
    data = pickle.load(open(pkl, "rb"))
    for e in data:
        e["params"]["pxK"] = round(e["params"]["p"] * e["params"]["K"], 4)
    with open(pkl, "wb") as f:
        pickle.dump(data, f)
    plots.p_sweep_figures(pkl, outdir=outdir)


def test_p_sweep_figures_derives_and_tags(tmp_path, outdir):
    """The derived= patching and tag= suffixing used for the
    constant-product pickles (reference Plots cells 17 / 21)."""
    import os

    grid = [dict(p=p, s=s) for p, s in ((0.05, 10.0), (0.1, 5.0),
                                        (0.25, 2.0), (0.5, 1.0))]
    pkl = _dump(tmp_path, "ps_const.pkl", grid)
    plots.p_sweep_figures(pkl, outdir=outdir, derived=("p*s",),
                          tag="ps_const")
    assert os.path.exists(os.path.join(outdir, "accuracy_vs_p_ps_const.png"))
    assert os.path.exists(os.path.join(outdir, "accuracy_vs_pxs.png"))
    # The pickle on disk is untouched (patching is in-memory only).
    data = pickle.load(open(pkl, "rb"))
    assert "p*s" not in data[0]["params"]
    # CLI plumbing.
    rc = plots.main(["p_sweep_figures", "--pickle", pkl,
                     "--outdir", outdir, "--derived", "p*s",
                     "--tag", "cli"])
    assert rc == 0
    assert os.path.exists(os.path.join(outdir, "accuracy_vs_p_cli.png"))


def test_strategy_and_generation_figures(tmp_path, outdir):
    for strat in ("random", "proximity"):
        _dump(tmp_path, f"run_vs_s_K1_{strat}.pkl",
              [dict(s=s, strategy=strat) for s in (0.5, 5.0)])
    plots.strategy_figures(str(tmp_path / "run_vs_s_K1_*.pkl"), outdir=outdir)
    for gen in ("gmm", "clustered"):
        _dump(tmp_path, f"gen_{gen}.pkl",
              [dict(s=s, generation=gen) for s in (0.5, 5.0)])
    plots.generation_figures(str(tmp_path / "gen_*.pkl"), outdir=outdir)


def test_gt_loss_heatmap_figures(tmp_path, outdir):
    gt = [{"params": _params(p=p, K=k),
           "results": {"gt_loss": [0.2] * REPS,
                       "gt_accuracy": list(np.random.default_rng(1).uniform(0.6, 0.9, REPS))}}
          for p in (0.01, 0.1) for k in (1, 10)]
    path = tmp_path / "gt.pkl"
    with open(path, "wb") as f:
        pickle.dump(gt, f)
    plots.gt_figures(str(path), outdir=outdir)

    pkl = _dump(tmp_path, "sp.pkl",
                [dict(s=s, p=p) for s in (0.5, 5.0) for p in (0.2, 0.4)])
    plots.loss_curves(pkl, outdir=outdir)
    plots.heatmaps(pkl, outdir=outdir)
