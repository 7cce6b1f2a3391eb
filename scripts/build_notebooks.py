"""Generate notebooks/Runs.ipynb and notebooks/Plots.ipynb.

The reference's user interface is a pair of notebooks (`Runs.ipynb` launches
sweeps into pickles, `Plots.ipynb` turns pickles into report figures —
SURVEY §2.11).  This script emits the native equivalents: same cell
structure and the same literal grids, driving `mfcd_tpu` instead of the
torch code.  Sweep cells ship commented-out, exactly like the reference's
convention (its cell 0 note), because each one is hours of TPU time.

Regenerate with:  python scripts/build_notebooks.py
"""

from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def md(text):
    return {"cell_type": "markdown", "metadata": {},
            "source": text.splitlines(keepends=True)}


def code(text):
    return {"cell_type": "code", "metadata": {}, "execution_count": None,
            "outputs": [], "source": text.splitlines(keepends=True)}


def comment_out(text):
    return "\n".join(
        ("# " + ln if ln.strip() else ln) for ln in text.splitlines())


def notebook(cells):
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3.11"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


# --------------------------------------------------------------------------
# Runs.ipynb
# --------------------------------------------------------------------------

RUNS_INTRO = """\
# Runs — launch the experiment sweeps

Native (`mfcd_tpu`) equivalent of the reference `Runs.ipynb`: every cell
below transcribes one canonical sweep of the reference notebook (its cells
3–23; audit table in `PARITY.md` §2.11) and saves results incrementally to
a pickle in the reference schema.

**All sweep cells are commented out** (the reference notebook ships the
same way): each is minutes-to-hours of TPU time.  Uncomment a block to run
it — one at a time; this environment allows a single TPU process.

Two ways to execute each grid:

- the inline `parameter_scan(...)` call shown in the cell — the
  sequential, reference-compatible engine;
- `parameter_scan_fast(...)` (same signature) — the bucketed engine that
  batches same-shape configs into one XLA program and shards them over the
  device mesh (~10k runs/hour/chip); this is what
  `scripts/run_all_sweeps.sh` uses via `python -m experiments.runs <name>
  --fast`.
"""

RUNS_SETUP = """\
import numpy as np

from mfcd_tpu.sweep.engine import parameter_scan
from mfcd_tpu.sweep.batched import parameter_scan_fast          # fast path
from mfcd_tpu.sweep.ground_truth import parameter_scan_ground_truth
"""

CELL3 = """\
s_values = np.concatenate([
    np.logspace(-1, 1, 20),
    [1e-4, 1e-3, 1e-2],
    np.logspace(1, 2, 10),
])
results = parameter_scan(
    n=1000, m=1000, d=2,
    p=[0.1, 0.15, 0.2, 0.25, 0.35, 0.5],
    K=[1],
    lr=[1e-3],
    s=list(s_values),
    weight_decay=[5e-6, 5e-3],
    num_epochs=30, reps=5, linear=False, soft_label=True,
    save_path="Data_final/scan_K1_fixedLR_varS_varP_full_4.pkl",
    save_every=4,
)
"""

CELL5 = """\
s_values = np.concatenate([
    np.logspace(-1, 1, 20),
    [1e-4, 1e-3, 1e-2],
    np.logspace(1, 3, 10),
])
results = parameter_scan(
    n=1000, m=1000, d=2, p=0.2,
    lr=1e-3,
    s=list(s_values),
    K=[1, 2, 4, 10, 50],
    weight_decay=[1e-6, 5e-6, 1e-5, 5e-5, 1e-4, 5e-4, 1e-3],
    num_epochs=30, reps=5, linear=False, soft_label=True,
    save_path="Data_final/scan_K_logspaceS_wdScan_p0.2_centered_soft_label_True_2.pkl",
    save_every=4,
)
"""

CELL7 = """\
s = [1.0, 3, 5, 8]
target_constants = [0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.5, 1]
possible_K = [1, 2, 3, 4, 5, 7, 10]
p_values, K_values = [], []
for c in target_constants:
    for K in possible_K:
        p = round(c / K, 5)
        if p <= 1:
            p_values.append(p)
            K_values.append(K)
s_values = []
for i in range(len(s)):
    s_values.extend([s[i]] * len(p_values))
p_values = p_values * len(s)
K_values = K_values * len(s)
results = parameter_scan(
    n=1000, m=1000, d=2, p=p_values, K=K_values, s=s_values,
    lr=0.001, weight_decay=1e-5, linear=True,
    num_epochs=30, reps=5, soft_label=True,
    save_path="Data_final/scan_pK_constant_Final_s_wd_sweep.pkl",
    save_every=4,
)

# Post-hoc enrichment: write the derived p*K product into the saved params
# so Plots can use it as an x-axis.
import pickle
path = "Data_final/scan_pK_constant_Final_s_wd_sweep.pkl"
with open(path, "rb") as f:
    results = pickle.load(f)
for exp in results:
    exp["params"]["pxK"] = round(exp["params"]["p"] * exp["params"]["K"], 4)
with open(path, "wb") as f:
    pickle.dump(results, f)
"""

CELL9 = """\
p_values = np.concatenate([
    np.logspace(-2, np.log10(0.2), 20),
    [1e-4, 5e-3, 1e-3, 0.5, 0.8],
])
results = parameter_scan(
    n=1000, m=1000, d=2,
    p=list(p_values),
    K=[1, 2, 3, 5, 10],
    s=5.0, lr=0.001, weight_decay=1e-5,
    num_epochs=30, reps=5, soft_label=True,
    save_path="Data_final/scan_pK_Final.pkl", save_every=4,
)
"""

CELL11 = """\
import torch  # the reference builds these ranges with float32 torch.arange
possible_s = [round(float(v), 3) for v in torch.arange(0.02, 10.1, 0.01)]
possible_p = [round(float(v), 5) for v in torch.arange(0.001, 0.301, 0.001)]
constants = [0.5, 0.35, 0.25, 0.20, 0.12, 0.15]
s_list, p_list = [], []
for c in constants:
    for s in possible_s:
        p = round(c / s, 5)
        if p in possible_p:
            s_list.append(s)
            p_list.append(p)
results = parameter_scan(
    n=1000, m=1000, d=2, p=p_list, s=s_list, K=1,
    lr=[1e-3] * len(p_list), weight_decay=1e-5, linear=True,
    num_epochs=30, reps=5, soft_label=True,
    save_path="Data_final/scan_ps_constant_Final.pkl", save_every=4,
)
"""

CELL13 = """\
results = parameter_scan(
    n=1000, m=1000,
    p=[0.1, 0.2, 0.5, 0.8, 1.0],
    d=list(range(2, 11, 2)),
    s=5, lr=1e-3, weight_decay=1e-5, K=1,
    num_epochs=30, reps=5,
    save_path="Data_final/p_d_1.pkl", save_every=4,
)
"""

CELL16 = """\
s_values = np.concatenate([
    np.logspace(-1, 1, 20),
    [1e-4, 1e-3, 1e-2],
    np.logspace(1, 4, 10),
])
strategies = ["proximity", "margin", "variance", "popularity",
              "top_k", "cluster", "svd"]
for strategy in strategies:
    results = parameter_scan(
        n=1000, m=1000, d=2, p=0.2, K=1,
        s=list(s_values), lr=1e-3,
        weight_decay=[1e-6, 1e-5, 1e-4],
        strategy=strategy,
        num_epochs=30, reps=3,
        save_path=f"Data_strategies/run_vs_s_K1_{strategy}.pkl",
        save_every=5,
    )
"""

CELL18 = """\
p_values = [round(float(p), 4) for p in np.logspace(-2, np.log10(0.2), 20)]
strategies = ["random", "proximity", "margin", "variance", "popularity",
              "top_k", "svd"]
for strategy in strategies:
    results = parameter_scan(
        n=1000, m=1000, d=2, p=p_values, K=1, s=5,
        lr=1e-3, weight_decay=1e-5, strategy=strategy,
        num_epochs=30, reps=3, soft_label=True,
        save_path=f"Data_strategies/run_vs_p_{strategy}.pkl",
        save_every=5,
    )
"""

CELL21 = """\
import pickle
results = parameter_scan_ground_truth(
    n=1000, m=1000, d=2,
    p=list(np.logspace(-4, 0, 30)),
    s=5, K=[10, 1], reps=5, linear=False,
)
with open("Data_final/gt_scan_s5_Ksweep_pSweep_n1000.pkl", "wb") as f:
    pickle.dump(results, f)
"""

CELL23 = """\
import pickle
results = parameter_scan_ground_truth(
    n=1000, m=1000, p=0.5,
    d=list(range(1, 8)),
    s=[1, 3, 9], K=1, reps=3, linear=False,
)
with open("Data_final/scan_d_s_gt.pkl", "wb") as f:
    pickle.dump(results, f)
"""


def runs_notebook():
    cells = [md(RUNS_INTRO), code(RUNS_SETUP)]
    sweeps = [
        ("Cell 3 — s × p (× weight decay)",
         "33 noise scales × 6 sparsities × 2 weight decays, K=1, soft "
         "labels (reference cell 3).  Fast path: `python -m "
         "experiments.runs s_p_sweep --fast --out ...`.", CELL3),
        ("Cell 5 — s × K (× weight decay)",
         "Label redundancy K up to 50 at p=0.2; the heavyweight grid "
         "(reference cell 5).  `experiments.runs s_k_sweep`.", CELL5),
        ("Cell 7 — p·K held constant",
         "Linear (zipped) scan over (p, K) pairs with the same label "
         "budget p·K, repeated for four noise scales; the derived `pxK` "
         "key is patched into the pickle afterwards (reference cell 7).  "
         "`experiments.runs pk_const_sweep`.", CELL7),
        ("Cell 9 — p × K at s=5",
         "Sparsity sweep down to p=1e-4 for five K values (reference "
         "cell 9).  `experiments.runs p_k_sweep`.", CELL9),
        ("Cell 11 — p·s held constant",
         "Linear scan over (p, s) pairs with constant product, pairs "
         "enumerated from rounded arange grids exactly as the reference "
         "builds them (reference cell 11).  `experiments.runs "
         "ps_const_sweep`.", CELL11),
        ("Cell 13 — p × d",
         "Sparsity × embedding dimension (reference cell 13; that cell "
         "passes a `filename=` kwarg `parameter_scan` does not have — a "
         "notebook bug — so the save path goes through `save_path` "
         "here).  `experiments.runs p_d_sweep`.", CELL13),
        ("Cell 16 — sampling strategies × s",
         "Seven strategies (including `cluster`, no `random`), one "
         "pickle per strategy, s up to 10⁴ (reference cell 16).  "
         "`experiments.runs strategies_s_sweep`.", CELL16),
        ("Cell 18 — sampling strategies × p",
         "Seven strategies (including `random`, no `cluster`) across 20 "
         "log-spaced sparsities at s=5, soft labels (reference cell "
         "18).  `experiments.runs strategies_p_sweep`.", CELL18),
        ("Cell 21 — ground-truth oracle: p × K",
         "Model-free BTL oracle accuracy/loss over five decades of p "
         "(reference cell 21).  `experiments.runs gt_p_k_sweep`.",
         CELL21),
        ("Cell 23 — ground-truth oracle: d × s",
         "Oracle over embedding dimension and noise scale (reference "
         "cell 23).  `experiments.runs gt_d_s_sweep`.", CELL23),
    ]
    for title, blurb, src in sweeps:
        cells.append(md(f"## {title}\n\n{blurb}"))
        cells.append(code(comment_out(src)))
    return notebook(cells)


# --------------------------------------------------------------------------
# Plots.ipynb
# --------------------------------------------------------------------------

PLOTS_INTRO = """\
# Plots — report figures from sweep pickles

Native (`mfcd_tpu.viz`) equivalent of the reference `Plots.ipynb`.  Each
section loads one pickle produced by `Runs.ipynb` (or
`scripts/run_all_sweeps.sh`) and renders the corresponding report-figure
group.  All of these are also scriptable: `python -m experiments.plots
<group>` regenerates everything in `Results_final/`.

Figures are rendered with matplotlib's default text engine; call
`mfcd_tpu.viz.enable_latex()` first for the reference's LaTeX styling
(needs a TeX install).
"""

PLOTS_SETUP = """\
import pickle

from mfcd_tpu.viz.plots import (
    enrich_params_with_data_points,
    get_best_params_all_metrics,
    plot_all_heatmaps,
    plot_heatmap_best_fixed,
    plot_losses,
    plot_metrics_vs_param,
    print_results,
)
from mfcd_tpu.viz.report import (
    find_closest_index_by_s,
    plot_alpha_vs_s,
    plot_sampled_comparison_aligned,
)


def load(path):
    with open(path, "rb") as f:
        return pickle.load(f)
"""

PLOTS_S = """\
results = load("Data_final/scan_K1_fixedLR_varS_varP_full_4.pkl")

plot_metrics_vs_param(results, "s", ["accuracy"], group_by="p",
                      log_scale_x=True, sub_plot=True, font_scale=1.5,
                      max_overall=True)
plot_metrics_vs_param(results, "s", ["reconstruction_error_scaled"],
                      group_by="p", log_scale_x=True, sub_plot=True,
                      font_scale=1.5, max_overall=True)
plot_metrics_vs_param(results, "s", ["pearson_corr"], group_by="p",
                      log_scale_x=True, sub_plot=True, font_scale=1.5,
                      max_overall=True, fill_between=True)
plot_metrics_vs_param(results, "s", ["spearman_corr"], group_by="p",
                      log_scale_x=True, sub_plot=True, font_scale=1.5,
                      max_overall=True, fill_between=True)

# alpha tracks 1/s through the learnable regime (overlay drawn by the
# helper).
plot_alpha_vs_s(results, s_min=0.0,
                weight_decays=sorted({e["params"]["weight_decay"]
                                      for e in results}))
"""

PLOTS_LOSSES = """\
results = load("Data_final/scan_K1_fixedLR_varS_varP_full_4.pkl")
plot_losses(results, param_index=0)              # one experiment
plot_losses(results, selected_indices=list(range(8)))  # multi, 4-col legend
"""

PLOTS_ROWS = """\
results = load("Data_final/scan_K1_fixedLR_varS_varP_full_4.pkl")
for s_target in (0.1, 5, 100):
    idx = find_closest_index_by_s(results, s_target)
    uvt = results[idx]["results"]["sampled_UVT_rows"][0]
    x = results[idx]["results"]["sampled_X_rows"][0]
    plot_sampled_comparison_aligned(uvt[0], x[0], title=f"s = {s_target}")

from mfcd_tpu.viz.plots import plot_histograms_from_results
plot_histograms_from_results(results[:4], "alpha_per_row", group_by="s")
"""

PLOTS_P = """\
results = load("Data_final/scan_pK_Final.pkl")
enrich_params_with_data_points(results)   # adds num_data_points = n*m*p/2

plot_metrics_vs_param(results, "p", ["accuracy"], group_by="K",
                      log_scale_x=True, sub_plot=True, font_scale=1.5)
plot_metrics_vs_param(results, "num_data_points",
                      ["reconstruction_error_scaled"], group_by="K",
                      log_scale_x=True, sub_plot=True, font_scale=1.5,
                      max_overall=True)

# Derived-axis variant (pickle written by Runs cell 7).  The pxK product
# is patched into the params post-hoc, as the reference's plot cell does.
pk = load("Data_final/scan_pK_constant_Final_s_wd_sweep.pkl")
for exp in pk:
    exp["params"]["pxK"] = round(exp["params"]["p"] * exp["params"]["K"], 4)
plot_metrics_vs_param(pk, "pxK", ["accuracy"], group_by="s",
                      log_scale_x=True, sub_plot=True, font_scale=1.5)
"""

PLOTS_HEATMAP = """\
results = load("Data_final/p_d_1.pkl")
plot_heatmap_best_fixed(results, "p", "d", "accuracy")
plot_all_heatmaps(results, "p", "d", "accuracy")
plot_all_heatmaps(results, "p", "d", "reconstruction_error_scaled")
get_best_params_all_metrics(results)
"""

PLOTS_STRATEGIES = """\
import glob

merged = []
for path in sorted(glob.glob("Data_strategies/run_vs_s_K1_*.pkl")):
    merged.extend(load(path))

plot_metrics_vs_param(merged, "s", ["accuracy"], group_by="strategy",
                      log_scale_x=True, sub_plot=True, font_scale=1.5,
                      max_overall=True)
plot_metrics_vs_param(merged, "s", ["reconstruction_error_scaled"],
                      group_by="strategy", log_scale_x=True, sub_plot=True,
                      font_scale=1.5, max_overall=True)
"""

PLOTS_GT = """\
gt = load("Data_final/gt_scan_s5_Ksweep_pSweep_n1000.pkl")
plot_metrics_vs_param(gt, "p", ["gt_accuracy"], group_by="K",
                      log_scale_x=True, sub_plot=True, font_scale=1.5)

gt_ds = load("Data_final/scan_d_s_gt.pkl")
plot_metrics_vs_param(gt_ds, "d", ["gt_accuracy"], group_by="s",
                      sub_plot=True, font_scale=1.5)
"""


def plots_notebook():
    cells = [md(PLOTS_INTRO), code(PLOTS_SETUP)]
    groups = [
        ("s-sweep report figures",
         "Reference Plots.ipynb cells 3–8: the flagship metric-vs-noise "
         "curves from the cell-3 pickle.", PLOTS_S),
        ("Loss curves",
         "Reference cells 9–10: train/validation loss trajectories.",
         PLOTS_LOSSES),
        ("Per-row diagnostics",
         "Reference cells 11–15: sampled X-vs-UVᵀ row alignment at "
         "three noise scales and the per-row α histogram.", PLOTS_ROWS),
        ("Sparsity sweeps (p, p·K, p·s)",
         "Reference cells 17–23: accuracy/error vs sparsity and the "
         "derived constant-product axes.", PLOTS_P),
        ("p × d heatmaps",
         "Reference cells 24–25 style heatmaps over the cell-13 grid, "
         "plus the best-config tables.", PLOTS_HEATMAP),
        ("Strategy comparison",
         "Reference cells 26–28: all sampling strategies on one axis "
         "(per-strategy pickles merged; the `strategy` param is the "
         "group key).", PLOTS_STRATEGIES),
        ("Ground-truth oracle overlays",
         "Reference cells 31–33: the model-free BTL ceiling vs p and d.",
         PLOTS_GT),
    ]
    for title, blurb, src in groups:
        cells.append(md(f"## {title}\n\n{blurb}"))
        cells.append(code(src))
    return notebook(cells)


def main():
    outdir = os.path.join(HERE, "notebooks")
    os.makedirs(outdir, exist_ok=True)
    for name, nb in [("Runs.ipynb", runs_notebook()),
                     ("Plots.ipynb", plots_notebook())]:
        path = os.path.join(outdir, name)
        with open(path, "w") as f:
            json.dump(nb, f, indent=1, ensure_ascii=False)
            f.write("\n")
        print("wrote", path)


if __name__ == "__main__":
    main()
