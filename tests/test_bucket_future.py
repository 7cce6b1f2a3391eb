"""BucketFuture retry semantics (sweep/batched.py).

The round-4 pipeline refactor moved the transient-retry / poisoned-cache /
OOM logic from run_bucket's inline loop into BucketFuture.collect(); these
tests pin the behaviors long sweeps depend on, without a device:

- transient statuses (UNAVAILABLE, FAILED_PRECONDITION, ...) re-dispatch
  with backoff and eventually succeed;
- deterministic OOM raises immediately (the chunk bisector's contract);
- non-transient errors raise immediately;
- a dispatch failure at construction is deferred into collect()'s retry
  loop (pipelined callers see every error in chunk order).
"""

import numpy as np
import pytest

from mfcd_tpu.sweep import batched


@pytest.fixture(autouse=True)
def _no_sleep(monkeypatch):
    sleeps = []
    import time

    monkeypatch.setattr(time, "sleep", lambda s: sleeps.append(s))
    return sleeps


def _future(outcomes):
    """outcomes: list of exceptions to raise per dispatch, or dict to
    return (device_get passes numpy through unchanged)."""
    calls = {"n": 0}

    def dispatch():
        out = outcomes[min(calls["n"], len(outcomes) - 1)]
        calls["n"] += 1
        if isinstance(out, Exception):
            raise out
        return out

    fut = batched.BucketFuture(dispatch, postprocess=lambda h: h)
    return fut, calls


def test_transient_errors_redispatch_until_success():
    ok = {"a": np.arange(3)}
    fut, calls = _future([ValueError("UNAVAILABLE: tunnel blip"),
                          ValueError("DEADLINE_EXCEEDED"), ok])
    host = fut.collect()
    np.testing.assert_array_equal(host["a"], np.arange(3))
    assert calls["n"] == 3


def test_oom_raises_immediately_for_the_bisector():
    fut, calls = _future([ValueError("RESOURCE_EXHAUSTED: out of memory")])
    with pytest.raises(ValueError, match="RESOURCE_EXHAUSTED"):
        fut.collect()
    assert calls["n"] == 1


def test_non_transient_raises_immediately():
    fut, calls = _future([ValueError("INVALID_ARGUMENT: shape mismatch")])
    with pytest.raises(ValueError, match="INVALID_ARGUMENT"):
        fut.collect()
    assert calls["n"] == 1


def test_construction_failure_defers_to_collect():
    ok = {"a": np.float32(1.0)}
    fut, calls = _future([ValueError("UNAVAILABLE: worker restarting"), ok])
    # __init__ swallowed the first failure; nothing raised yet.
    assert calls["n"] == 1
    assert fut.collect()["a"] == np.float32(1.0)
    assert calls["n"] == 2


def test_retry_budget_exhausts():
    fut, calls = _future([ValueError("UNAVAILABLE: down hard")])
    with pytest.raises(ValueError, match="UNAVAILABLE"):
        fut.collect()
    # 1 at construction (replayed as attempt 0 without re-dispatch) +
    # re-dispatches on attempts 1..5.
    assert calls["n"] == 6
