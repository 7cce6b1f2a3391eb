"""Generator unit tests (reference ``generation_data.py:341-715``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfcd_tpu.genx import (
    GENERATION_MODES,
    generate_base,
    generate_low_rank,
    generate_x,
    haar_frame,
    kmeans,
    watts_strogatz_adjacency,
)

KEY = jax.random.key(0)


def test_haar_frame_orthonormal():
    q = haar_frame(KEY, 50, 5)
    np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(5), atol=1e-5)


def test_base_singular_values():
    n, m, d = 60, 80, 4
    x = generate_base(KEY, n, m, d)
    s = np.linalg.svd(np.asarray(x), compute_uv=False)
    # X = U S V^T with s_i = sqrt(n*m)/2/sqrt(d) on the first d modes
    # (generation_data.py:361-369), zero after.
    expected = np.sqrt(n * m) / 2 / np.sqrt(d)
    np.testing.assert_allclose(s[:d], expected, rtol=1e-5)
    assert np.all(s[d:] < 1e-3)


def test_low_rank_rank():
    x = generate_low_rank(KEY, 40, 50, d=6, rank=3)
    s = np.linalg.svd(np.asarray(x), compute_uv=False)
    np.testing.assert_allclose(s[:3], 1.0, rtol=1e-5)
    assert np.all(s[3:] < 1e-4)


@pytest.mark.parametrize("mode", GENERATION_MODES)
def test_generate_x_all_modes(mode):
    n, m, d = 32, 40, 3
    x = generate_x(KEY, n, m, d, mode)
    assert x.shape == (n, m)
    assert x.dtype == jnp.float32
    arr = np.asarray(x)
    assert np.all(np.isfinite(arr))
    assert np.std(arr) > 0


def test_generate_x_unknown_mode():
    with pytest.raises(ValueError, match="Unknown generation"):
        generate_x(KEY, 8, 8, 2, "nope")


def test_generate_x_different_keys_differ():
    a = generate_x(jax.random.key(1), 16, 16, 2, "base")
    b = generate_x(jax.random.key(2), 16, 16, 2, "base")
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_kmeans_separates_clear_clusters():
    k1, k2 = jax.random.split(KEY)
    centers = jnp.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
    assign = jax.random.randint(k1, (90,), 0, 3)
    pts = centers[assign] + 0.1 * jax.random.normal(k2, (90, 2))
    labels, fitted = kmeans(jax.random.key(3), pts, 3)
    labels = np.asarray(labels)
    assign = np.asarray(assign)
    # Same partition up to label permutation.
    for c in range(3):
        members = labels[assign == c]
        assert len(set(members.tolist())) == 1
    # Fitted centers near true centers.
    fitted = np.sort(np.asarray(fitted), axis=0)
    true = np.sort(np.asarray(centers), axis=0)
    np.testing.assert_allclose(fitted, true, atol=0.5)


def test_watts_strogatz_structure():
    n = 100
    adj = np.asarray(watts_strogatz_adjacency(jax.random.key(4), n, k=5, p=0.1))
    assert adj.shape == (n, n)
    assert not adj.diagonal().any()          # no self loops
    assert (adj == adj.T).all()              # undirected
    deg = adj.sum(axis=1)
    # k=5 -> k//2=2 neighbors each side -> mean degree ~4 (minus collisions)
    assert 3.0 <= deg.mean() <= 4.2


def test_clustered_reduces_item_dispersion():
    n, m, d = 40, 50, 3
    base = np.asarray(generate_x(KEY, n, m, d, "base"))
    clustered = np.asarray(generate_x(KEY, n, m, d, "clustered"))
    # The soft shift toward centroids shrinks total item-column variance.
    assert clustered.std() < base.std() * 1.05
