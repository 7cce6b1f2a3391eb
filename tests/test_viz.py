"""Visualization suite smoke tests over a synthetic results schema."""

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")

from mfcd_tpu.viz import plots as viz


def _fake_results():
    rng = np.random.default_rng(0)
    results = []
    for p in (0.1, 0.2):
        for s in (1.0, 5.0):
            for wd in (1e-5, 1e-3):
                reps = 3
                results.append({
                    "params": {
                        "n": 100, "m": 100, "d": 2, "p": p, "s": s,
                        "lr": 1e-3, "weight_decay": wd, "num_epochs": 4,
                        "reps": reps, "K": 1, "d1": None,
                        "strategy": "random", "popularity_method": "zipf",
                        "alpha": 1.5, "soft_label": False,
                        "generation": "base",
                    },
                    "results": {
                        "accuracy": list(rng.uniform(0.5, 0.9, reps)),
                        "gt_accuracy": list(rng.uniform(0.7, 0.95, reps)),
                        "reconstruction_errors": list(rng.uniform(0.2, 1.0, reps)),
                        "train_losses": [list(np.linspace(0.7, 0.3, 4))] * reps,
                        "val_losses": [list(np.linspace(0.72, 0.4, 4))] * reps,
                        "pearson_corr": list(rng.uniform(0, 1, reps)),
                        "slopes": [list(rng.normal(size=5))] * reps,
                    },
                })
    return results


RESULTS = _fake_results()


def test_format_display_name_aliases():
    assert viz.format_display_name("proximity") == "Max-Min"
    assert viz.format_display_name("margin") == "Close-Call"
    # % is escaped only under usetex (the reference's always-on LaTeX mode).
    assert viz.format_display_name("top_k") == "Top 10%"
    try:
        viz.enable_latex(True)
        assert viz.format_display_name("top_k") == r"Top 10\%"
    finally:
        viz.enable_latex(False)
    assert viz.format_display_name("gt_accuracy") == "GT Accuracy"
    assert viz.format_display_name("some_new_metric") == "Some New Metric"


def test_get_best_params():
    params, idx = viz.get_best_params(RESULTS, "accuracy")
    best = max(
        max(r["results"]["accuracy"]) for r in RESULTS
    )
    assert max(RESULTS[idx]["results"]["accuracy"]) == best
    # loss-like metric minimizes
    params, idx = viz.get_best_params(RESULTS, "reconstruction_errors")
    best = min(min(r["results"]["reconstruction_errors"]) for r in RESULTS)
    assert min(RESULTS[idx]["results"]["reconstruction_errors"]) == best


def test_enrich_params():
    out = viz.enrich_params_with_data_points([
        {"params": {"n": 100, "m": 200, "p": 0.5}}
    ])
    assert out[0]["params"]["num_data_points"] == 100 * 200 * 0.5 * 0.5


def test_plot_functions_render(tmp_path):
    out = str(tmp_path / "fig")
    viz.plot_metrics_vs_param(
        RESULTS, "p", ["accuracy"], group_by="s", split_by="weight_decay",
        save_path=out, show_plot=False,
    )
    assert (tmp_path / "fig.png").exists()

    viz.plot_losses(RESULTS, param_index=0, save_path=str(tmp_path / "l"),
                    show_plot=False)
    assert (tmp_path / "l.png").exists()

    viz.plot_heatmap_best_fixed(
        RESULTS, "p", "s", "accuracy", save_path=str(tmp_path / "hm"),
        show_plot=False,
    )
    assert (tmp_path / "hm.png").exists()

    viz.plot_all_heatmaps(
        RESULTS, "p", "s", "accuracy", save_path=str(tmp_path / "all"),
        show_plot=False,
    )
    assert (tmp_path / "all.png").exists()

    viz.plot_optimal_param_vs_x(
        RESULTS, "s", "weight_decay", "accuracy", group_by="p",
        save_path=str(tmp_path / "opt"), show_plot=False,
    )
    assert (tmp_path / "opt.png").exists()

    viz.plot_histograms_from_results(
        RESULTS, "slopes", group_by="s", save_path=str(tmp_path / "hist"),
        show_plot=False,
    )
    assert (tmp_path / "hist.png").exists()


def test_find_fixed_indices():
    idx = viz.find_fixed_indices(RESULTS, "p", "s")
    assert len(idx) == 2  # one per weight_decay


def test_smart_formatter():
    assert viz.smart_formatter(0) == "0"
    # Reference comma-locale rendering (visualization.py:915): decimal comma,
    # space thousands separator, trailing zeros stripped.
    assert viz.smart_formatter(0.5) == "0,5"
    assert viz.smart_formatter(2.0) == "2"
    assert "10^" in viz.smart_formatter(1e-5)


def test_report_helpers(tmp_path):
    from mfcd_tpu.viz import report

    idx = report.find_closest_index_by_s(RESULTS, 4.9)
    assert RESULTS[idx]["params"]["s"] == 5.0

    rng = np.random.default_rng(0)
    report.plot_sampled_comparison_aligned(
        rng.normal(size=50), rng.normal(size=50),
        save_path=str(tmp_path / "cmp.png"), show_plot=False,
    )
    assert (tmp_path / "cmp.png").exists()

    out = report.plot_outlier_impact(
        save_path=str(tmp_path / "outl"), show_plot=False)
    assert out["spearman_outliers"] > out["pearson_outliers"]

    vals, means, errs = report.aggregate_by_param(RESULTS, "p")
    assert vals == [0.1, 0.2] and len(means) == 2

    # alpha-vs-s overlay needs 'alpha' + K in the schema
    enriched = []
    for r in RESULTS:
        rr = {"params": dict(r["params"]), "results": dict(r["results"])}
        rr["results"]["alpha"] = [1.0 / rr["params"]["s"]] * 3
        enriched.append(rr)
    report.plot_alpha_vs_s(
        enriched, s_min=0.01, s_max=100,
        weight_decays=(1e-5, 1e-3),
        save_path=str(tmp_path / "avs"), show_plot=False,
    )
    assert (tmp_path / "avs.png").exists()
    # Regression guard: the overlay figure must contain actual curves,
    # not a blank canvas (plot_metrics_vs_param must not close the figure
    # before the 1/s overlay is drawn).
    from PIL import Image

    img = np.asarray(Image.open(tmp_path / "avs.png").convert("RGB"))
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 50


def test_plot_3d_scatter_fallback(tmp_path):
    viz.plot_3d_scatter(RESULTS, "p", "s", "weight_decay", "accuracy",
                        use_plotly=False, save_path=str(tmp_path / "sc3d"),
                        show_plot=False)
    assert (tmp_path / "sc3d.png").exists()
