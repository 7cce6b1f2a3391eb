"""Fused label->pad->train stage (MFCD_FUSE_LABEL) equivalence.

The fused program inlines the exact same jitted sub-stages
(``engine._label_train_bucket``), so results must match the separate-stage
path bit-for-bit across hard/soft labels and K values.
"""

import os

import numpy as np
import pytest

from mfcd_tpu.core.config import RunConfig
from mfcd_tpu.sweep.batched import run_bucket

from result_compare import assert_results_equal


def _bucket(cfg, fuse):
    os.environ["MFCD_FUSE_LABEL"] = "1" if fuse else "0"
    try:
        rows = [{"s": 3.0, "lr": 1e-2, "weight_decay": 1e-5},
                {"s": 6.0, "lr": 1e-2, "weight_decay": 1e-4}]
        return run_bucket(cfg, rows, [0, 1], seed=11)
    finally:
        os.environ.pop("MFCD_FUSE_LABEL", None)


def test_fused_sharded_equals_fused_unsharded():
    """The fused program must stay bit-exact when the bucket axis is
    sharded over the 8-device mesh (the regime it would actually run in
    if the device A/B flips MFCD_FUSE_LABEL on)."""
    from mfcd_tpu.sweep.batched import make_sweep_mesh, run_bucket

    cfg = RunConfig(n=24, m=30, d=2, p=0.5, num_epochs=3, reps=2,
                    K=4, soft_label=True, batch_size=16)
    rows = [{"s": 1.0 + 0.5 * k, "lr": 1e-2, "weight_decay": 1e-5}
            for k in range(8)]
    os.environ["MFCD_FUSE_LABEL"] = "1"
    try:
        plain = run_bucket(cfg, rows, list(range(8)), seed=7)
        sharded = run_bucket(cfg, rows, list(range(8)), seed=7,
                             mesh=make_sweep_mesh(8))
    finally:
        os.environ.pop("MFCD_FUSE_LABEL", None)
    for a, b in zip(plain, sharded):
        assert_results_equal(a, b, float_rtol=3e-7)


@pytest.mark.parametrize("k,soft", [(1, False), (4, True), (3, False)])
def test_fused_equals_separate(k, soft):
    cfg = RunConfig(n=40, m=48, d=2, p=0.5, num_epochs=4, reps=2,
                    K=k, soft_label=soft, batch_size=32)
    sep = _bucket(cfg, fuse=False)
    fused = _bucket(cfg, fuse=True)
    for a, b in zip(sep, fused):
        assert_results_equal(a, b)
