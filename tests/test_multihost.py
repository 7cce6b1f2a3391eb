"""Multi-host (DCN) integration: two real processes, one coordinated sweep.

SURVEY §5.8: the reference has no distributed backend; the TPU-native
equivalent is ``jax.distributed`` bring-up plus embarrassingly-parallel
grid sharding.  This test launches two OS processes that join one JAX
distributed job (CPU backend, 2 virtual devices each), verifies the global
device view, runs disjoint strided slices of a sweep grid through the real
engine, and merges the pickles — the documented multi-host workflow of
``mfcd_tpu/parallel/multihost.py``.
"""

import os
import pickle
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sweep(tmp_path):
    coordinator = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # Strip the axon sitecustomize: workers must not touch the TPU tunnel.
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = [tmp_path / f"shard{pid}.pkl" for pid in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", coordinator, str(outs[pid])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            logs.append(out.decode(errors="replace"))
            assert p.returncode == 0, logs[-1][-2000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    merged = []
    for path in outs:
        with open(path, "rb") as f:
            merged.extend(pickle.load(f))
    # 4 grid points, strided 2/2, disjoint and complete.
    assert len(merged) == 4
    s_values = sorted(e["params"]["s"] for e in merged)
    assert s_values == [2.0, 5.0, 8.0, 11.0]
    for e in merged:
        assert 0.0 <= e["results"]["accuracy"][0] <= 1.0
