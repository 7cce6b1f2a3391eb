"""Shared result-dict comparison for sharded/pipelined equivalence tests.

One place for the ragged-list handling and the 1-ulp float-tolerance
policy so the allowances can't drift apart between tests (code-review
r4): integer/bool keys are always bitwise; float keys are bitwise by
default, or within ``float_rtol`` when the comparison crosses a sharding
boundary (XLA's matmul/reduction tiling — and hence float summation
order — depends on the LOCAL shard shape; observed differences are a
single ulp, ~6e-8, on svd_error_scaled and val_losses entries).
"""

import numpy as np


def assert_results_equal(a: dict, b: dict, float_rtol: float = 0.0,
                         context: str = ""):
    assert a.keys() == b.keys(), (context, a.keys() ^ b.keys())
    for key in a:
        av, bv = a[key], b[key]
        ragged = isinstance(av, list) and any(
            np.shape(x) != np.shape(av[0]) for x in av)
        pairs = list(zip(av, bv)) if ragged else [(av, bv)]
        for ar, br in pairs:
            ar, br = np.asarray(ar), np.asarray(br)
            label = f"{context}{key}"
            if ar.dtype.kind == "f" and float_rtol:
                np.testing.assert_allclose(ar, br, rtol=float_rtol,
                                           err_msg=label)
            else:
                np.testing.assert_array_equal(ar, br, err_msg=label)
