"""Sweep-engine tests: schema, persistence protocol, fast-path equivalence."""

import os
import pickle

import numpy as np
import pytest

from mfcd_tpu.core.results import RESULT_KEYS, validate_schema
from mfcd_tpu.sweep.engine import parameter_scan, run_experiment
from mfcd_tpu.sweep.batched import parameter_scan_fast
from mfcd_tpu.sweep.ground_truth import (
    evaluate_ground_truth,
    parameter_scan_ground_truth,
)

CFG = dict(n=24, m=28, d=2, p=0.4, s=3.0, lr=1e-2, weight_decay=1e-5,
           num_epochs=2, reps=2, K=1)


def test_run_experiment_schema_and_sanity():
    res = run_experiment(**CFG)
    assert not validate_schema(res)
    assert len(res["accuracy"]) == 2
    assert len(res["train_losses"][0]) == 2
    assert all(0.0 <= a <= 1.0 for a in res["accuracy"])
    assert all(0.0 <= a <= 1.0 for a in res["gt_accuracy"])
    # GT oracle should be at or above chance on BTL data.
    assert np.mean(res["gt_accuracy"]) > 0.55
    assert res["sampled_X_rows"][0].shape == (2, 28)
    # per-row lists have (up to) n entries
    assert len(res["alpha_per_row"][0]) == 24


def test_parameter_scan_persistence(tmp_path):
    path = str(tmp_path / "out.pkl")
    with open(path, "wb") as f:
        pickle.dump(["sentinel"], f)  # must be cleared at scan start
    out = parameter_scan(
        save_path=path, save_every=1,
        **{**CFG, "s": [1.0, 4.0]},
    )
    assert out == []  # reference quirk: flushed scans return []
    with open(path, "rb") as f:
        results = pickle.load(f)
    assert len(results) == 2
    assert results[0]["params"]["s"] == 1.0
    assert results[1]["params"]["s"] == 4.0
    assert not validate_schema(results[0]["results"])


def test_fast_path_matches_sequential():
    seq = parameter_scan(**{**CFG, "s": [1.0, 4.0]})
    fast = parameter_scan_fast(**{**CFG, "s": [1.0, 4.0]})
    assert len(seq) == len(fast) == 2
    for a, b in zip(seq, fast):
        assert a["params"] == b["params"]
        np.testing.assert_allclose(
            a["results"]["accuracy"], b["results"]["accuracy"], atol=1e-5)
        np.testing.assert_allclose(
            a["results"]["reconstruction_errors"],
            b["results"]["reconstruction_errors"], rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(a["results"]["train_losses"]),
            np.asarray(b["results"]["train_losses"]), rtol=1e-4, atol=1e-5)


def test_ground_truth_paths():
    losses, accs = evaluate_ground_truth(
        n=24, m=28, p=0.4, d=2, s=5.0, K=1, reps=2)
    assert len(losses) == 2 and len(accs) == 2
    assert all(a > 0.6 for a in accs)  # s=5 -> confident labels

    res = parameter_scan_ground_truth(
        n=24, m=28, p=0.4, d=2, s=[1.0, 5.0], K=1, reps=2)
    assert len(res) == 2
    assert set(res[0]["results"]) == {"gt_loss", "gt_accuracy"}
    # Higher scale -> labels closer to deterministic -> higher GT accuracy.
    assert (np.mean(res[1]["results"]["gt_accuracy"])
            > np.mean(res[0]["results"]["gt_accuracy"]) - 0.02)


def test_gt_accuracy_increases_with_scale():
    res_low = run_experiment(**{**CFG, "s": 0.1})
    res_high = run_experiment(**{**CFG, "s": 8.0})
    assert (np.mean(res_high["gt_accuracy"])
            > np.mean(res_low["gt_accuracy"]) + 0.1)


def test_parameter_scan_resume(tmp_path):
    """resume=True keeps the file and skips completed configurations."""
    path = str(tmp_path / "res.pkl")
    parameter_scan(save_path=path, save_every=1, **{**CFG, "s": [1.0]})
    before = pickle.load(open(path, "rb"))
    assert len(before) == 1

    # Resuming a larger grid must keep the done config and add only new ones.
    parameter_scan(save_path=path, save_every=1, resume=True,
                   **{**CFG, "s": [1.0, 4.0]})
    after = pickle.load(open(path, "rb"))
    assert len(after) == 2
    assert after[0]["results"]["accuracy"] == before[0]["results"]["accuracy"]
    assert {e["params"]["s"] for e in after} == {1.0, 4.0}
