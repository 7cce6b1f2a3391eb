"""Subprocess worker for the two-process multi-host test.

Usage: python _multihost_worker.py <pid> <nproc> <coordinator> <out.pkl>

Brings up the DCN-coordinated JAX distributed runtime via
``mfcd_tpu.parallel.multihost.initialize`` on the CPU backend (2 virtual
local devices per process), claims this process's strided slice of a small
sweep grid, runs it through the real engine, and pickles the slice.
"""

import os
import pickle
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

pid, nproc = int(sys.argv[1]), int(sys.argv[2])
coordinator, out_path = sys.argv[3], sys.argv[4]

from mfcd_tpu.parallel import multihost  # noqa: E402

multihost.initialize(coordinator, nproc, pid)

import jax  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == pid, jax.process_index()
# Global device view: every process sees all hosts' devices.
assert jax.device_count() == 2 * nproc, jax.device_count()
assert len(jax.local_devices()) == 2

from mfcd_tpu.core.config import SweepSpec  # noqa: E402
from mfcd_tpu.sweep.engine import run_experiment  # noqa: E402

spec = SweepSpec(params=dict(
    n=24, m=20, d=2, p=0.4, s=[2.0, 5.0, 8.0, 11.0],
    lr=1e-3, weight_decay=1e-5, num_epochs=1, reps=1, K=1,
))
grid = spec.expand()
mine = multihost.shard_param_sets(grid, pid, nproc)
results = [
    {"params": ps, "results": run_experiment(**ps, seed=7)}
    for ps in mine
]
with open(out_path, "wb") as f:
    pickle.dump(results, f)
print(f"worker {pid}: {len(results)} experiments done", flush=True)
