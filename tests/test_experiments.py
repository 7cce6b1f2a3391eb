"""Canonical sweep definitions (experiments/runs.py vs Runs.ipynb grids).

Each test asserts the notebook's *literal* parameters (the acceptance
grids, VERDICT round-1 item 3) — any drift from ``Runs.ipynb`` cells
3-23 fails here.
"""

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
    """Runs.ipynb cell 3 literals."""
    calls = _capture(monkeypatch)
    runs.s_p_sweep(scale=0.1)
    kw = calls[0]
    assert kw["n"] == kw["m"] == 100
    expect_s = np.concatenate([
        np.logspace(-1, 1, 20), [1e-4, 1e-3, 1e-2], np.logspace(1, 2, 10)])
    assert np.allclose(kw["s"], expect_s)
    assert kw["p"] == [0.1, 0.15, 0.2, 0.25, 0.35, 0.5]
    assert kw["K"] == [1]
    assert kw["lr"] == [1e-3]
    assert kw["weight_decay"] == [5e-6, 5e-3]
    assert kw["soft_label"] is True and kw["linear"] is False
    assert kw["num_epochs"] == 30 and kw["reps"] == 5
    assert kw["save_every"] == 4


def test_s_k_sweep_grid(monkeypatch):
    """Runs.ipynb cell 5 literals."""
    calls = _capture(monkeypatch)
    runs.s_k_sweep(scale=0.1)
    kw = calls[0]
    expect_s = np.concatenate([
        np.logspace(-1, 1, 20), [1e-4, 1e-3, 1e-2], np.logspace(1, 3, 10)])
    assert np.allclose(kw["s"], expect_s)
    assert kw["K"] == [1, 2, 4, 10, 50]
    assert kw["weight_decay"] == [1e-6, 5e-6, 1e-5, 5e-5, 1e-4, 5e-4, 1e-3]
    assert kw["p"] == 0.2 and kw["lr"] == 1e-3
    assert kw["soft_label"] is True and kw["reps"] == 5


def test_pk_const_sweep_linear_and_derived(monkeypatch):
    """Runs.ipynb cell 7 literals (p*K constants, 4 s-blocks)."""
    calls = _capture(monkeypatch)
    out = runs.pk_const_sweep(scale=0.1)
    kw = calls[0]
    assert kw["linear"] is True and kw["soft_label"] is True
    assert len(kw["p"]) == len(kw["K"]) == len(kw["s"])
    # 9 constants x 7 K values (p=c/K <= 1 always) x 4 s blocks.
    assert len(kw["p"]) == 9 * 7 * 4
    assert kw["s"][:63] == [1.0] * 63 and kw["s"][-63:] == [8] * 63
    assert sorted(set(kw["K"])) == [1, 2, 3, 4, 5, 7, 10]
    assert kw["lr"] == 0.001 and kw["weight_decay"] == 1e-5
    assert kw["reps"] == 5
    # p * K == pxK for every experiment (derived param patched post-hoc).
    for exp in out:
        assert abs(
            exp["params"]["p"] * exp["params"]["K"] - exp["params"]["pxK"]
        ) < 1e-4


def test_p_k_sweep_grid(monkeypatch):
    """Runs.ipynb cell 9 literals."""
    calls = _capture(monkeypatch)
    runs.p_k_sweep(scale=0.1)
    kw = calls[0]
    expect_p = np.concatenate([
        np.logspace(-2, np.log10(0.2), 20), [1e-4, 5e-3, 1e-3, 0.5, 0.8]])
    assert np.allclose(kw["p"], expect_p)
    assert kw["K"] == [1, 2, 3, 5, 10] and kw["s"] == 5.0
    assert kw["lr"] == 0.001 and kw["weight_decay"] == 1e-5
    assert kw["soft_label"] is True and kw["reps"] == 5


def test_ps_const_pairs_enumeration():
    """Cell 11's torch.arange pair construction: 99 pairs, all on-target."""
    p_values, s_values = runs.ps_const_pairs()
    assert len(p_values) == len(s_values) == 99
    targets = [0.5, 0.35, 0.25, 0.20, 0.12, 0.15]
    for p, s in zip(p_values, s_values):
        assert min(abs(p * s - c) for c in targets) < 1e-3


def test_pk_const_sweep_resume_keeps_enrichment(monkeypatch, tmp_path):
    """Resuming cell 7 over an already-enriched pickle: the on-disk file
    keeps its pxK enrichment at all times (no in-place rewrite, ADVICE r2)
    — resume matching drops non-grid keys via ``completed_param_sets``
    instead."""
    import pickle

    out = str(tmp_path / "pkc.pkl")
    seen = {}

    def fake_scan(fast, **kw):
        with open(out, "rb") as f:
            seen["params_at_scan"] = pickle.load(f)
        return []

    monkeypatch.setattr(runs, "_scan", fake_scan)
    enriched = [{"params": {"p": 0.1, "K": 1, "pxK": 0.1},
                 "results": {"accuracy": [0.5]}}]
    with open(out, "wb") as f:
        pickle.dump(enriched, f)
    runs.pk_const_sweep(out=out, fast=True, resume=True)
    # The pickle was never stripped mid-flight...
    assert seen["params_at_scan"][0]["params"]["pxK"] == 0.1
    # ... resume matching still recognizes the enriched entry...
    from mfcd_tpu.utils.io import completed_param_sets

    assert all("pxK" not in ps for ps in completed_param_sets(out))
    # ... and the final pickle remains enriched.
    final = pickle.load(open(out, "rb"))
    assert final[0]["params"]["pxK"] == 0.1


def test_ps_const_pairs_match_torch_derivation():
    """The baked literal pairs equal the reference's float32 torch.arange
    enumeration exactly (runs.py has no torch dependency in production)."""
    assert runs.ps_const_pairs() == runs.ps_const_pairs_derived()


def test_ps_const_sweep_grid(monkeypatch):
    """Runs.ipynb cell 11 literals."""
    calls = _capture(monkeypatch)
    runs.ps_const_sweep(scale=0.1)
    kw = calls[0]
    assert kw["linear"] is True and kw["soft_label"] is True
    assert len(kw["p"]) == len(kw["s"]) == len(kw["lr"]) == 99
    assert kw["K"] == 1 and kw["weight_decay"] == 1e-5 and kw["reps"] == 5


def test_p_d_sweep_grid(monkeypatch):
    """Runs.ipynb cell 13 literals."""
    calls = _capture(monkeypatch)
    runs.p_d_sweep(scale=0.1)
    kw = calls[0]
    assert kw["p"] == [0.1, 0.2, 0.5, 0.8, 1.0]
    assert kw["d"] == [2, 4, 6, 8, 10]
    assert kw["s"] == 5 and kw["K"] == 1
    assert kw["lr"] == 1e-3 and kw["weight_decay"] == 1e-5
    assert kw["reps"] == 5


def test_strategies_s_sweep_cell16(monkeypatch):
    """Runs.ipynb cell 16: cluster included, random excluded, hard labels."""
    calls = _capture(monkeypatch)
    out = runs.strategies_s_sweep(scale=0.1)
    assert set(out) == {
        "proximity", "margin", "variance", "popularity", "top_k",
        "cluster", "svd",
    }
    assert len(calls) == 7
    kw = calls[0]
    expect_s = np.concatenate([
        np.logspace(-1, 1, 20), [1e-4, 1e-3, 1e-2], np.logspace(1, 4, 10)])
    assert np.allclose(kw["s"], expect_s)
    assert kw["weight_decay"] == [1e-6, 1e-5, 1e-4]
    assert kw["p"] == 0.2 and kw["K"] == 1 and kw["lr"] == 1e-3
    assert kw["soft_label"] is False and kw["reps"] == 3
    assert kw["save_every"] == 5


def test_strategies_p_sweep_cell18(monkeypatch):
    """Runs.ipynb cell 18: random included, cluster excluded, soft labels."""
    calls = _capture(monkeypatch)
    out = runs.strategies_p_sweep(scale=0.1)
    assert set(out) == {
        "random", "proximity", "margin", "variance", "popularity",
        "top_k", "svd",
    }
    assert len(calls) == 7
    kw = calls[0]
    expect_p = np.round(np.logspace(-2, np.log10(0.2), 20), 4).tolist()
    assert kw["p"] == expect_p
    assert kw["s"] == 5 and kw["weight_decay"] == 1e-5
    assert kw["soft_label"] is True and kw["reps"] == 3


def test_main_list(capsys):
    assert runs.main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "s_p_sweep" in out and "gt_d_s_sweep" in out


def test_generation_s_sweep_grid(monkeypatch):
    """Round-2 validation sweep: non-base generators at production scale."""
    calls = _capture(monkeypatch)
    out = runs.generation_s_sweep(scale=0.1)
    # Every non-"base" generate_x dispatch keyword is swept.
    assert set(out) == {"gmm", "clustered", "low_rank", "structured",
                        "svd", "correlated", "graph", "social",
                        "temporal", "hierarchical"}
    assert len(calls) == 10
    kw = calls[0]
    assert kw["generation"] == "gmm"
    assert len(kw["s"]) == 10 and kw["p"] == 0.2 and kw["reps"] == 3
