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


def _bucket(cfg, fuse):
    os.environ["MFCD_FUSE_LABEL"] = "1" if fuse else "0"
    try:
        rows = [{"s": 3.0, "lr": 1e-2, "weight_decay": 1e-5},
                {"s": 6.0, "lr": 1e-2, "weight_decay": 1e-4}]
        return run_bucket(cfg, rows, [0, 1], seed=11)
    finally:
        os.environ.pop("MFCD_FUSE_LABEL", None)


@pytest.mark.parametrize("k,soft", [(1, False), (4, True), (3, False)])
def test_fused_equals_separate(k, soft):
    cfg = RunConfig(n=40, m=48, d=2, p=0.5, num_epochs=4, reps=2,
                    K=k, soft_label=soft, batch_size=32)
    sep = _bucket(cfg, fuse=False)
    fused = _bucket(cfg, fuse=True)
    for a, b in zip(sep, fused):
        assert a.keys() == b.keys()
        for key in a:
            av, bv = a[key], b[key]
            if isinstance(av, list) and any(
                    np.shape(x) != np.shape(av[0]) for x in av):
                for ar, br in zip(av, bv):
                    np.testing.assert_array_equal(
                        np.asarray(ar), np.asarray(br), err_msg=key)
            else:
                np.testing.assert_array_equal(
                    np.asarray(av), np.asarray(bv), err_msg=key)
