"""Canonical sweep definitions (experiments/runs.py vs Runs.ipynb grids)."""

import numpy as np

import experiments.runs as runs


def _capture(monkeypatch):
    calls = []

    def fake_scan(fast, **kw):
        calls.append(kw)
        # Return a stub results list matching the expansion length when the
        # caller patches derived params post-hoc.
        from mfcd_tpu.core.config import SweepSpec

        params = {
            k: v for k, v in kw.items()
            if k in (
                "n", "m", "d", "p", "lr", "weight_decay", "num_epochs",
                "reps", "s", "K", "d1", "strategy", "popularity_method",
                "alpha", "soft_label", "generation",
            )
        }
        spec = SweepSpec(params=params, linear=kw.get("linear", False))
        return [{"params": ps, "results": {}} for ps in spec.expand()]

    monkeypatch.setattr(runs, "_scan", fake_scan)
    return calls


def test_s_p_sweep_grid(monkeypatch):
    calls = _capture(monkeypatch)
    runs.s_p_sweep(scale=0.1)
    kw = calls[0]
    assert kw["n"] == kw["m"] == 100
    assert len(kw["s"]) == 33          # logspace(-1,1,20)+3 extras+logspace(1,2,10)
    assert kw["p"] == [0.1, 0.2, 0.3, 0.4, 0.5]
    assert kw["weight_decay"] == [5e-6, 5e-3]
    assert kw["K"] == 1 and kw["soft_label"] is True
    assert kw["num_epochs"] == 30 and kw["reps"] == 5


def test_s_k_sweep_grid(monkeypatch):
    calls = _capture(monkeypatch)
    runs.s_k_sweep(scale=0.1)
    kw = calls[0]
    assert kw["K"] == [1, 2, 4, 10, 50]
    assert len(kw["weight_decay"]) == 7
    assert kw["p"] == 0.2


def test_pk_const_sweep_linear_and_derived(monkeypatch):
    calls = _capture(monkeypatch)
    out = runs.pk_const_sweep(scale=0.1)
    kw = calls[0]
    assert kw["linear"] is True
    assert len(kw["p"]) == len(kw["K"]) == len(kw["s"])
    # p * K == pxK for every experiment (derived param patched post-hoc).
    for exp in out:
        assert abs(
            exp["params"]["p"] * exp["params"]["K"] - exp["params"]["pxK"]
        ) < 1e-6


def test_ps_const_sweep_derived(monkeypatch):
    calls = _capture(monkeypatch)
    out = runs.ps_const_sweep(scale=0.1)
    for exp in out:
        assert abs(
            exp["params"]["p"] * exp["params"]["s"] - exp["params"]["p*s"]
        ) < 1e-3


def test_p_d_sweep_grid(monkeypatch):
    calls = _capture(monkeypatch)
    runs.p_d_sweep(scale=0.1)
    kw = calls[0]
    assert kw["p"] == [0.1, 0.2, 0.5, 0.8, 1.0]
    assert kw["d"] == [2, 4, 6, 8, 10]


def test_strategy_sweeps_cover_seven(monkeypatch):
    calls = _capture(monkeypatch)
    out = runs.strategies_s_sweep(scale=0.1)
    assert set(out) == {
        "random", "proximity", "margin", "variance", "popularity",
        "top_k", "svd",
    }
    assert len(calls) == 7


def test_main_list(capsys):
    assert runs.main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "s_p_sweep" in out and "gt_d_s_sweep" in out
