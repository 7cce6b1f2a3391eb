"""Utility-layer tests: persistence, checkpoints, observability, debug."""

import json
import os
import pickle

import numpy as np

from mfcd_tpu.models.mf import MFParams
from mfcd_tpu.utils.checkpoint import load_factors, save_factors
from mfcd_tpu.utils.debug import print_return_structure_types
from mfcd_tpu.utils.io import (
    append_results,
    completed_param_sets,
    load_results,
    reset_save_path,
)
from mfcd_tpu.utils.observability import JsonlLogger, ThroughputMeter


def test_incremental_pickle_protocol(tmp_path):
    path = str(tmp_path / "res.pkl")
    append_results(path, [{"params": {"p": 0.1}, "results": {}}])
    append_results(path, [{"params": {"p": 0.2, "pxK": 0.2}, "results": {}}])
    assert [e["params"]["p"] for e in load_results(path)] == [0.1, 0.2]
    # Resume matching drops enrichment keys outside the 16 grid params.
    assert completed_param_sets(path) == [{"p": 0.1}, {"p": 0.2}]
    reset_save_path(path)
    assert load_results(path) == []


def test_factor_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    params = MFParams(
        U=rng.normal(size=(5, 2)).astype(np.float32),
        V=rng.normal(size=(7, 2)).astype(np.float32),
    )
    path = str(tmp_path / "ckpt.npz")
    save_factors(path, params, metadata={"s": 5.0, "rep": 1})
    loaded, meta = load_factors(path)
    np.testing.assert_array_equal(loaded.U, params.U)
    np.testing.assert_array_equal(loaded.V, params.V)
    assert meta == {"s": 5.0, "rep": 1}


def test_jsonl_logger(tmp_path):
    path = str(tmp_path / "log.jsonl")
    logger = JsonlLogger(path)
    logger.log({"n": 10, "s": 2.0}, {"accuracy": [0.5, 0.7],
                                     "train_losses": [[0.5, 0.4]]})
    logger.log({"n": 10, "s": 3.0}, {"accuracy": [0.8]})
    lines = [json.loads(line) for line in open(path)]
    assert len(lines) == 2
    assert lines[0]["metrics"]["accuracy"]["mean"] == 0.6
    assert lines[1]["params"]["s"] == 3.0


def test_throughput_meter():
    meter = ThroughputMeter()
    meter.add(runs=4, triplet_grads=1000)
    s = meter.summary()
    assert s["runs_per_hour"] > 0
    assert s["triplet_grads_per_sec"] > 0


def test_print_return_structure_types(capsys):
    print_return_structure_types(
        {"a": [1, 2], "b": {"c": (1.0, "x")}, "d": np.zeros(3)}
    )
    out = capsys.readouterr().out
    assert "root.a: list[int]" in out
    assert "root.b.c: tuple[mixed]" in out
    assert "root.d: numpy.ndarray" in out
