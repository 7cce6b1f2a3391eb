"""Keyed-bijection shuffle tests (mfcd_tpu/ops/shuffle.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mfcd_tpu.ops.shuffle import epoch_permutation


def _perm(key, n_slots, count, k_bits):
    slots = jnp.arange(n_slots, dtype=jnp.int32)
    return np.asarray(epoch_permutation(key, slots, count, k_bits))


def test_bijective_on_valid_prefix():
    count = 1000
    k_bits = 10  # 1024 >= count
    out = _perm(jax.random.key(0), 1024, count, k_bits)
    prefix = out[:count]
    assert len(set(prefix.tolist())) == count       # bijection
    assert prefix.min() >= 0 and prefix.max() < count


def test_bijective_with_padding_and_partial_count():
    # rows padded beyond count; only slots < count matter
    count = 700
    out = _perm(jax.random.key(1), 1024, count, 10)
    prefix = out[:count]
    assert len(set(prefix.tolist())) == count
    assert prefix.max() < count


def test_different_keys_differ_and_mix():
    count = 512
    a = _perm(jax.random.key(2), 512, count, 9)
    b = _perm(jax.random.key(3), 512, count, 9)
    assert not np.array_equal(a, b)
    # Mixing quality: position correlation with identity should be weak.
    ident = np.arange(count)
    corr = abs(np.corrcoef(a[:count], ident)[0, 1])
    assert corr < 0.2


def test_uniformity_chi_square():
    """Each row should land in each batch-of-64 roughly uniformly over keys."""
    count, k_bits = 512, 9
    n_batches = count // 64
    hits = np.zeros((count, n_batches))
    trials = 60
    for t in range(trials):
        perm = _perm(jax.random.key(100 + t), 512, count, k_bits)
        for b in range(n_batches):
            hits[perm[b * 64:(b + 1) * 64], b] += 1
    # Expected hits per (row, batch) = trials / n_batches.
    expected = trials / n_batches
    chi2 = ((hits - expected) ** 2 / expected).sum()
    dof = count * (n_batches - 1)
    # Very loose bound: chi2/dof near 1 for uniform assignment.
    assert chi2 / dof < 1.8
