"""Config / sweep-expansion unit tests (reference ``structure.py:120-255``)."""

import numpy as np
import pytest

from mfcd_tpu.core.config import (
    RunConfig,
    ShapeInfo,
    SweepSpec,
    bucket_by_shape,
    normalize_param,
)


def test_normalize_param_numpy():
    assert normalize_param(np.float64(0.5)) == 0.5
    assert isinstance(normalize_param(np.float64(0.5)), float)
    assert normalize_param(np.int64(3)) == 3
    assert isinstance(normalize_param(np.int64(3)), int)
    out = normalize_param(np.logspace(-1, 1, 3))
    assert isinstance(out, list) and all(isinstance(x, float) for x in out)
    out = normalize_param([np.int32(1), np.float32(2.0), "random"])
    assert out == [1, 2.0, "random"]
    assert isinstance(out[0], int) and isinstance(out[1], float)


def test_grid_expansion_order():
    spec = SweepSpec(params={"p": [0.1, 0.2], "s": [1.0, 3.0], "n": 10, "m": 12})
    combos = spec.expand()
    assert len(combos) == 4
    # Cartesian product in declared key order (n, m, d, p, ...) — p varies
    # slower than s because p precedes s in PARAM_KEYS.
    assert [(c["p"], c["s"]) for c in combos] == [
        (0.1, 1.0), (0.1, 3.0), (0.2, 1.0), (0.2, 3.0)
    ]
    # All 16 reference keys present in each param set.
    assert set(combos[0]) == {
        "n", "m", "d", "p", "lr", "weight_decay", "num_epochs", "reps", "s",
        "K", "d1", "strategy", "popularity_method", "alpha", "soft_label",
        "generation",
    }


def test_linear_expansion():
    spec = SweepSpec(
        params={"p": [0.1, 0.2, 0.3], "K": [1, 2, 3], "s": 5.0},
        linear=True,
    )
    combos = spec.expand()
    assert len(combos) == 3
    assert [(c["p"], c["K"]) for c in combos] == [(0.1, 1), (0.2, 2), (0.3, 3)]
    assert all(c["s"] == 5.0 for c in combos)


def test_linear_mismatch_raises():
    spec = SweepSpec(params={"p": [0.1, 0.2, 0.3], "K": [1, 2]}, linear=True)
    with pytest.raises(ValueError, match="not synchronized"):
        spec.expand()


def test_shape_info_matches_reference_formulas():
    cfg = RunConfig(n=100, m=100, p=0.5, K=1)
    sh = cfg.shapes()
    # num_triplets = int(n*m*p/2)  (structure.py:356)
    assert sh.num_triplets == int(100 * 100 * 0.5 / 2) == 2500
    assert sh.train_triplets == int(0.8 * 2500) == 2000
    assert sh.val_triplets == int(0.1 * 2500) == 250
    assert sh.test_triplets == 2500 - 2000 - 250 == 250
    # 250 * K=1 < 500 labels -> top up to 500 (structure.py:721-730)
    assert sh.extra_test_triplets == 500 - 250 == 250
    assert sh.test_rows == 500

    cfg2 = RunConfig(n=100, m=100, p=0.5, K=4)
    sh2 = cfg2.shapes()
    # 250 * 4 = 1000 >= 500 -> no top-up
    assert sh2.extra_test_triplets == 0
    # hard labels multiply rows by K (structure.py:516-518)
    assert sh2.train_rows == 2000 * 4

    cfg3 = RunConfig(n=100, m=100, p=0.5, K=3)
    sh3 = cfg3.shapes()
    # needed = ceil(500/3) - 250 -> no top-up since 167 < 250
    assert sh3.extra_test_triplets == 0


def test_soft_label_rows():
    cfg = RunConfig(n=100, m=100, p=0.5, K=4, soft_label=True)
    sh = cfg.shapes()
    assert sh.train_rows == sh.train_triplets  # one soft row per triplet
    assert sh.val_rows == sh.val_triplets * 4  # val always hard


def test_bucket_by_shape():
    specs = SweepSpec(
        params={"s": [1.0, 2.0, 3.0], "lr": [1e-3, 1e-2], "n": 20, "m": 20}
    ).configs()
    buckets = bucket_by_shape(specs)
    assert len(buckets) == 1  # s and lr don't change shapes
    specs2 = SweepSpec(params={"p": [0.1, 0.2], "n": 20, "m": 20}).configs()
    assert len(bucket_by_shape(specs2)) == 2  # p changes shapes
