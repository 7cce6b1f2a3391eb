"""1-deep bucket pipeline (MFCD_PIPELINE) equivalence.

The pipeline overlaps chunk k's host-side collect/export/pickle with
chunk k+1's device execution (NOTES_ROUND3.md candidate #1).  Results and
persistence must be IDENTICAL to the sequential path: same slot order,
same pickle contents, bit-exact values (dispatch order does not enter the
math — per-config RNG keys are folded from global experiment indices).
"""

import os
import pickle

import numpy as np

from mfcd_tpu.sweep.batched import parameter_scan_fast

from result_compare import assert_results_equal


def _scan(tmp_path, name, pipeline):
    os.environ["MFCD_PIPELINE"] = "1" if pipeline else "0"
    try:
        path = str(tmp_path / f"{name}.pkl")
        out = parameter_scan_fast(
            n=24, m=24, d=2, p=0.6, s=[1.0, 2.0, 3.0, 5.0, 8.0],
            weight_decay=[1e-5, 1e-4], num_epochs=4, reps=2,
            max_bucket=3,  # force several chunks so the pipeline engages
            save_path=path, save_every=1,
        )
        assert out == []  # save_path mode returns [] (reference quirk)
        with open(path, "rb") as f:
            return pickle.load(f)
    finally:
        os.environ.pop("MFCD_PIPELINE", None)


def test_pipeline_sharded_matches_sequential_unsharded(tmp_path, monkeypatch):
    """Pipeline x mesh: dispatching chunk k+1 while chunk k collects must
    compose with bucket-axis sharding (the production TPU-slice regime).
    Float keys allow the documented 1-ulp local-shape tiling tolerance."""
    from mfcd_tpu.sweep.batched import make_sweep_mesh

    seq = _scan(tmp_path, "seq_um", pipeline=False)
    monkeypatch.setenv("MFCD_PIPELINE", "1")
    path = str(tmp_path / "pipe_mesh.pkl")
    parameter_scan_fast(
        n=24, m=24, d=2, p=0.6, s=[1.0, 2.0, 3.0, 5.0, 8.0],
        weight_decay=[1e-5, 1e-4], num_epochs=4, reps=2,
        max_bucket=3, mesh=make_sweep_mesh(8),
        save_path=path, save_every=1,
    )
    with open(path, "rb") as f:
        pipe = pickle.load(f)
    assert [r["params"] for r in pipe] == [r["params"] for r in seq]
    for a, b in zip(seq, pipe):
        assert_results_equal(a["results"], b["results"], float_rtol=3e-7)


def test_pipeline_oom_falls_back_to_synchronous_bisect(tmp_path, monkeypatch):
    """A pipelined chunk that OOMs at collect must drain the in-flight
    next chunk, then re-run through the synchronous bisector
    (parameter_scan_fast's pipeline loop) with results and persistence
    identical to the unfaulted sequential scan."""
    from mfcd_tpu.sweep import batched

    def run(name, pipeline, inject):
        state = {"injected": False}
        orig = batched.BucketFuture.collect
        if inject:
            def failing(self):
                if not state["injected"]:
                    state["injected"] = True
                    raise ValueError("RESOURCE_EXHAUSTED: injected OOM")
                return orig(self)
            monkeypatch.setattr(batched.BucketFuture, "collect", failing)
        else:
            monkeypatch.setattr(batched.BucketFuture, "collect", orig)
        monkeypatch.setenv("MFCD_PIPELINE", "1" if pipeline else "0")
        path = str(tmp_path / f"{name}.pkl")
        parameter_scan_fast(
            n=24, m=24, d=2, p=0.6, s=[1.0, 2.0, 3.0], num_epochs=4,
            reps=2, max_bucket=2,  # chunks of 2 + 1: first flush len-2
            save_path=path, save_every=1,
        )
        with open(path, "rb") as f:
            return pickle.load(f), state

    seq, _ = run("seq", pipeline=False, inject=False)
    pipe, state = run("oom", pipeline=True, inject=True)
    assert state["injected"], "fault was never exercised"
    assert [r["params"] for r in pipe] == [r["params"] for r in seq]
    for a, b in zip(seq, pipe):
        assert_results_equal(a["results"], b["results"])


def test_pipeline_matches_sequential(tmp_path):
    seq = _scan(tmp_path, "seq", pipeline=False)
    pipe = _scan(tmp_path, "pipe", pipeline=True)
    assert len(seq) == len(pipe) == 10
    # Same order on disk (chunk flush order is preserved) and bit-exact.
    for a, b in zip(seq, pipe):
        assert a["params"] == b["params"]
        assert_results_equal(a["results"], b["results"])
