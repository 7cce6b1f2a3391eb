"""The shipped notebooks must stay in sync with the framework.

`notebooks/Runs.ipynb` / `notebooks/Plots.ipynb` are the user-facing
equivalents of the reference's notebook drivers (SURVEY §2.11).  These
tests parse them, syntax-check every code cell (including the
commented-out sweep bodies, after uncommenting), and check the referenced
symbols still exist.
"""

import json
import os

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(HERE, "notebooks", name)
    with open(path) as f:
        return json.load(f)


def _sources(nb):
    return ["".join(c["source"]) for c in nb["cells"]
            if c["cell_type"] == "code"]


def _uncomment(src):
    """Reverse the comment-out applied to sweep cells — but only when the
    whole cell is commented out (real comments inside live code cells must
    stay comments)."""
    lines = src.splitlines()
    if not all(line.startswith("#") or not line.strip() for line in lines):
        return src
    return "\n".join(
        line[2:] if line.startswith("# ") else line for line in lines
    )


@pytest.mark.parametrize("name", ["Runs.ipynb", "Plots.ipynb"])
def test_notebook_is_valid(name):
    nb = _load(name)
    assert nb["nbformat"] == 4
    assert len(nb["cells"]) > 10
    for i, src in enumerate(_sources(nb)):
        compile(_uncomment(src), f"{name}[code cell {i}]", "exec")


def test_runs_setup_cell_imports():
    src = _sources(_load("Runs.ipynb"))[0]
    namespace = {}
    exec(src, namespace)
    assert callable(namespace["parameter_scan"])
    assert callable(namespace["parameter_scan_fast"])
    assert callable(namespace["parameter_scan_ground_truth"])


def test_plots_setup_cell_imports():
    src = _sources(_load("Plots.ipynb"))[0]
    namespace = {}
    exec(src, namespace)
    for fn in ["plot_metrics_vs_param", "plot_losses", "plot_alpha_vs_s",
               "plot_sampled_comparison_aligned", "find_closest_index_by_s",
               "enrich_params_with_data_points", "plot_heatmap_best_fixed",
               "plot_all_heatmaps", "get_best_params_all_metrics",
               "print_results"]:
        assert callable(namespace[fn]), fn


def test_runs_grids_match_scripts():
    """The notebook's sweep literals must match experiments/runs.py (the
    audited transcription) on a few load-bearing constants."""
    cells = _sources(_load("Runs.ipynb"))
    all_src = "\n".join(_uncomment(c) for c in cells)
    for needle in [
        "np.logspace(-1, 1, 20)",
        "[0.1, 0.15, 0.2, 0.25, 0.35, 0.5]",
        "K=[1, 2, 4, 10, 50]",
        '"cluster"',
        "np.logspace(1, 4, 10)",
        "np.logspace(-4, 0, 30)",
        "soft_label=True",
        "weight_decay=[1e-6, 5e-6, 1e-5, 5e-5, 1e-4, 5e-4, 1e-3]",
    ]:
        assert needle in all_src, needle


def test_runs_sweep_cells_expand(tmp_path, monkeypatch):
    """Every (commented-out) Runs.ipynb sweep cell must actually expand
    through the engine's SweepSpec when uncommented — catches grids that
    compile but crash at launch (e.g. unsynchronized linear lists)."""
    from mfcd_tpu.core.config import SweepSpec

    non_grid = {"save_path", "save_every", "device", "seed", "batch_size",
                "open_browser", "resume", "linear"}
    expansions = []

    def fake_scan(**kw):
        params = {k: v for k, v in kw.items() if k not in non_grid}
        spec = SweepSpec(params=params, linear=kw.get("linear", False))
        if kw.get("linear", False):
            assert spec.linear_possible(), sorted(params)
        rows = spec.expand()
        assert rows
        expansions.append(len(rows))
        if kw.get("save_path"):
            import pickle

            with open(kw["save_path"], "wb") as f:
                pickle.dump([], f)
        return []

    monkeypatch.chdir(tmp_path)
    os.makedirs("Data_final")
    os.makedirs("Data_strategies")
    ns = {"parameter_scan": fake_scan,
          "parameter_scan_fast": fake_scan,
          "parameter_scan_ground_truth": fake_scan}
    exec("import numpy as np", ns)
    for i, src in enumerate(_sources(_load("Runs.ipynb"))[1:], 1):
        live = _uncomment(src)
        assert live != src, f"sweep cell {i} is not commented out"
        exec(live, dict(ns))
    assert len(expansions) >= 10
    # Spot-check a few grid sizes against the notebook's own arithmetic.
    assert 396 in expansions          # cell 3: 33 s x 6 p x 2 wd
    assert 1155 in expansions         # cell 5: 33 s x 5 K x 7 wd
    assert 99 in expansions           # cell 11: linear (p, s) pairs
    assert 60 in expansions           # cell 21: 30 p x 2 K


def test_plots_cells_execute(tmp_path, monkeypatch):
    """Every Plots.ipynb cell runs end-to-end against schema-compatible
    synthetic pickles laid out at the paths the notebook loads."""
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    from test_plots_cells import _dump

    monkeypatch.chdir(tmp_path)
    os.makedirs("Data_final")
    os.makedirs("Data_strategies")
    _dump(tmp_path / "Data_final", "scan_K1_fixedLR_varS_varP_full_4.pkl",
          [dict(s=s, p=p, weight_decay=wd)
           for s in (0.1, 5.0, 100.0) for p in (0.2, 0.4)
           for wd in (5e-6, 5e-3)])
    _dump(tmp_path / "Data_final", "scan_pK_Final.pkl",
          [dict(p=p, K=k) for p in (0.05, 0.2) for k in (1, 5)])
    _dump(tmp_path / "Data_final", "scan_pK_constant_Final_s_wd_sweep.pkl",
          [dict(p=p, K=k, s=s) for p, k in ((0.1, 1), (0.05, 2))
           for s in (1.0, 5.0)])
    _dump(tmp_path / "Data_final", "p_d_1.pkl",
          [dict(p=p, d=d) for p in (0.1, 0.5) for d in (2, 4)])
    _dump(tmp_path / "Data_final", "gt_scan_s5_Ksweep_pSweep_n1000.pkl",
          [dict(p=p, K=k) for p in (0.01, 0.1) for k in (1, 10)])
    _dump(tmp_path / "Data_final", "scan_d_s_gt.pkl",
          [dict(d=d, s=s) for d in (1, 2) for s in (1.0, 3.0)])
    for strat in ("random", "proximity"):
        _dump(tmp_path / "Data_strategies", f"run_vs_s_K1_{strat}.pkl",
              [dict(s=s, strategy=strat) for s in (0.5, 5.0)])

    cells = _sources(_load("Plots.ipynb"))
    ns = {}
    exec(cells[0], ns)
    import matplotlib.pyplot as plt

    for i, src in enumerate(cells[1:], 1):
        exec(src, dict(ns))
        plt.close("all")


def test_notebooks_regenerate_cleanly(tmp_path, monkeypatch):
    """scripts/build_notebooks.py output matches what is committed."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "build_notebooks", os.path.join(HERE, "scripts",
                                        "build_notebooks.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for name, builder in [("Runs.ipynb", mod.runs_notebook),
                          ("Plots.ipynb", mod.plots_notebook)]:
        assert builder() == _load(name), name
