"""BTL labeling unit tests (reference ``structure.py:465-531``)."""

import jax
import jax.numpy as jnp
import numpy as np

from mfcd_tpu.data.btl import btl_label

KEY = jax.random.key(11)


def _fixed_x():
    x = jnp.zeros((4, 6), dtype=jnp.float32)
    return x.at[1, 2].set(2.0).at[1, 3].set(-1.0)


def test_hard_labels_bernoulli_rate():
    x = _fixed_x()
    trip = jnp.tile(jnp.array([[1, 2, 3]], dtype=jnp.int32), (4000, 1))
    # NB duplicated triplets (labels are iid draws per row)
    out = btl_label(KEY, x, trip, jnp.int32(4000), scale=1.0, K=1)
    p_true = 1.0 / (1.0 + np.exp(-(2.0 - (-1.0))))
    rate = float(jnp.mean(out.z))
    assert abs(rate - p_true) < 0.03


def test_k_multiplies_rows():
    x = _fixed_x()
    trip = jnp.array([[1, 2, 3], [0, 1, 2]], dtype=jnp.int32)
    out = btl_label(KEY, x, trip, jnp.int32(2), scale=1.0, K=5)
    assert out.u.shape == (10,)
    assert int(out.count) == 10
    # Each triplet's rows are contiguous K-blocks.
    np.testing.assert_array_equal(np.asarray(out.u[:5]), 1)
    np.testing.assert_array_equal(np.asarray(out.i[5:]), 1)


def test_soft_labels_fractions():
    x = _fixed_x()
    k = 4
    trip = jnp.tile(jnp.array([[1, 2, 3]], dtype=jnp.int32), (3000, 1))
    out = btl_label(KEY, x, trip, jnp.int32(3000), scale=1.0, K=k,
                    soft_label=True)
    assert out.z.shape == (3000,)  # one row per triplet
    zs = np.asarray(out.z)
    # Labels are means of K bernoulli draws -> multiples of 1/K.
    np.testing.assert_allclose(zs * k, np.round(zs * k), atol=1e-6)
    p_true = 1.0 / (1.0 + np.exp(-3.0))
    assert abs(zs.mean() - p_true) < 0.03


def test_scale_extremes():
    x = _fixed_x()
    trip = jnp.tile(jnp.array([[1, 2, 3]], dtype=jnp.int32), (100, 1))
    out = btl_label(KEY, x, trip, jnp.int32(100), scale=100.0, K=1)
    # X[1,2] - X[1,3] = 3 > 0 with huge scale -> always 1.
    assert float(jnp.min(out.z)) == 1.0
    out0 = btl_label(KEY, x, trip, jnp.int32(100), scale=0.0, K=1)
    assert 0.3 < float(jnp.mean(out0.z)) < 0.7  # p = 0.5


def test_validity_propagates():
    x = _fixed_x()
    trip = jnp.array([[1, 2, 3], [0, 1, 2], [0, 0, 1]], dtype=jnp.int32)
    out = btl_label(KEY, x, trip, jnp.int32(2), scale=1.0, K=3)
    assert int(out.count) == 6
    valid = np.asarray(out.valid)
    assert valid[:6].all() and not valid[6:].any()
