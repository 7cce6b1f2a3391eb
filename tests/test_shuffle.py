"""Keyed-bijection shuffle tests (mfcd_tpu/ops/shuffle.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mfcd_tpu.ops.shuffle import (epoch_permutation, mix_stream,
                                  stream_tile_width)


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


# ---------------------------------------------------------------------------
# Carried epoch streams (mix_stream)
# ---------------------------------------------------------------------------

def _advance(stream, e, count, k_bits, period, tile_w, seed=42):
    key = jax.random.fold_in(jax.random.key(seed), e)
    return mix_stream(stream, key, jnp.int32(e), jnp.int32(count),
                      k_bits, period=period, tile_w=tile_w)


def test_mix_stream_prefix_bijective_across_epochs():
    """Every epoch's stream holds each valid row exactly once in the
    prefix; padding sentinels never leak in — across PRP and cheap
    epochs of a period-4 schedule."""
    s_len, count, k_bits = 1024, 900, 10
    tile_w = stream_tile_width(s_len)
    base = jnp.arange(s_len, dtype=jnp.int32)
    stream = (jnp.where(base < count, base, -1),)
    prev = None
    for e in range(8):
        stream = _advance(stream, e, count, k_bits, 4, tile_w)
        prefix = np.asarray(stream[0])[:count]
        assert sorted(prefix.tolist()) == list(range(count))
        if prev is not None:
            assert not np.array_equal(prefix, prev)  # every epoch moves
        prev = prefix


def test_mix_stream_moves_all_arrays_identically():
    s_len, count, k_bits = 512, 450, 9
    ids = jnp.arange(s_len, dtype=jnp.int32)
    vals = ids.astype(jnp.float32) * 0.5
    stream = (ids, vals)
    for e in range(5):
        stream = _advance(stream, e, count, k_bits, 3,
                          stream_tile_width(s_len))
        a, b = np.asarray(stream[0]), np.asarray(stream[1])
        np.testing.assert_array_equal(a[:count].astype(np.float32) * 0.5,
                                      b[:count])


def test_mix_stream_period1_is_fresh_prp_each_epoch():
    s_len, count, k_bits = 256, 200, 8
    stream = (jnp.arange(s_len, dtype=jnp.int32),)
    key = jax.random.fold_in(jax.random.key(7), 3)
    out = mix_stream(stream, key, jnp.int32(3), jnp.int32(count),
                     k_bits, period=1, tile_w=stream_tile_width(s_len))
    k_prp = jax.random.split(key, 3)[0]
    sel = epoch_permutation(k_prp, jnp.arange(s_len, dtype=jnp.int32),
                            jnp.int32(count), k_bits)
    np.testing.assert_array_equal(np.asarray(out[0]),
                                  np.asarray(stream[0][sel]))


def test_mix_stream_cheap_epoch_scrambles_batches():
    """A cheap (non-PRP) epoch must still change batch composition:
    rotation + tile permutation move most rows to a different batch."""
    s_len, count, k_bits, bs = 1024, 1000, 10, 64
    base = jnp.arange(s_len, dtype=jnp.int32)
    stream = (base,)
    out = _advance(stream, 1, count, k_bits, 4, stream_tile_width(s_len))
    arr = np.asarray(out[0])[:count]
    same_batch = np.mean((arr // bs) == (np.arange(count) // bs))
    assert same_batch < 0.3


def test_mix_stream_prefix_is_pad_invariant():
    """Padding a stream further must not change which row lands where:
    capacity bucketing and invalid-row masking both rely on it."""
    count, k_bits, bs = 450, 9, 64
    tile_w = stream_tile_width(bs)
    for s_len in (512, 576, 1024):
        stream = (jnp.arange(s_len, dtype=jnp.int32),)
        for e in range(5):
            stream = _advance(stream, e, count, k_bits, 4, tile_w)
        prefix = np.asarray(stream[0])[:count]
        if s_len == 512:
            ref = prefix
        else:
            np.testing.assert_array_equal(prefix, ref)


def test_exact_prefix_permutation_bijective_all_regimes():
    """The unbounded walk is an exact bijection on [0, count) even under
    severe shortfall (count << 2^k), where epoch_permutation's capped walk
    would fall back to a lossy scramble."""
    from mfcd_tpu.ops.shuffle import exact_prefix_permutation

    for count, k_bits in [(7, 17), (1, 10), (1024, 10), (700, 10),
                          (131072, 17), (100000, 17)]:
        n_slots = 1 << k_bits
        slots = jnp.arange(n_slots, dtype=jnp.int32)
        out = np.asarray(exact_prefix_permutation(
            jax.random.key(3), slots, jnp.int32(count), k_bits))
        prefix = out[:count]
        assert sorted(prefix.tolist()) == list(range(count)), (count, k_bits)


def test_exact_prefix_permutation_garbage_lanes_terminate():
    """Lanes with slots >= count (dropped by callers) must not hang the
    walk; they are remapped into the prefix's cycle set."""
    from mfcd_tpu.ops.shuffle import exact_prefix_permutation

    slots = jnp.arange(64, dtype=jnp.int32) + 1000  # all out of prefix
    out = np.asarray(exact_prefix_permutation(
        jax.random.key(4), slots, jnp.int32(16), 10))
    assert out.shape == (64,) and (out >= 0).all() and (out < 16).all()
