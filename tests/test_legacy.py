"""Draft-layer capabilities: pairwise datasets, AltSVM, preference models."""

import jax
import jax.numpy as jnp
import numpy as np

from mfcd_tpu.data.movielens import (
    PairwiseDataset,
    create_pairwise_dataset,
    split_pairwise_dataset,
)
from mfcd_tpu.data.preferences import (
    max_preference,
    sigmoid_preference,
    softmax_preference,
)
from mfcd_tpu.models.altsvm import (
    init_altsvm,
    pairwise_accuracy,
    predict,
    train_altsvm,
)


def test_create_pairwise_dataset_self_join():
    # user 0 rated movies 0,1,2 with ratings 5,3,1; user 1 rated 0,1 with 2,4
    users = np.array([0, 0, 0, 1, 1])
    movies = np.array([0, 1, 2, 0, 1])
    ratings = np.array([5, 3, 1, 2, 4])
    ds = create_pairwise_dataset(users, movies, ratings)
    # user 0: 3*2 ordered distinct pairs; user 1: 2 -> total 8
    assert len(ds) == 8
    # preference +1 iff rating_j > rating_k
    for u, j, k, p in zip(ds.users, ds.movie_j, ds.movie_k, ds.preferences):
        r = {(0, 0): 5, (0, 1): 3, (0, 2): 1, (1, 0): 2, (1, 1): 4}
        assert p == (1 if r[(u, j)] > r[(u, k)] else -1)


def test_split_pairwise_dataset():
    ds = PairwiseDataset(
        users=np.arange(1000) % 7,
        movie_j=np.arange(1000) % 11,
        movie_k=(np.arange(1000) + 1) % 11,
        preferences=np.where(np.arange(1000) % 2 == 0, 1, -1),
    )
    train, test = split_pairwise_dataset(ds, p_test=0.2, seed=1)
    assert len(train) + len(test) == 1000
    assert 100 < len(test) < 300


def test_altsvm_learns_synthetic_preferences():
    rng = np.random.default_rng(0)
    n_users, n_movies, f = 12, 15, 4
    u_true = rng.normal(size=(n_users, f))
    v_true = rng.normal(size=(n_movies, f))
    t = 600
    users = rng.integers(0, n_users, t)
    mj = rng.integers(0, n_movies, t)
    mk = (mj + 1 + rng.integers(0, n_movies - 1, t)) % n_movies
    scores = np.sum(u_true[users] * (v_true[mj] - v_true[mk]), axis=1)
    prefs = np.sign(scores).astype(np.int32)

    state = init_altsvm(jax.random.key(0), n_users, n_movies,
                        num_features=f, num_comparisons=t)
    state = train_altsvm(
        state, jax.random.key(1),
        jnp.asarray(users), jnp.asarray(mj), jnp.asarray(mk),
        jnp.asarray(prefs), num_epochs=8,
    )
    acc = float(pairwise_accuracy(
        state, jnp.asarray(users), jnp.asarray(mj), jnp.asarray(mk),
        jnp.asarray(prefs)))
    assert acc > 0.8
    preds = predict(state, jnp.asarray(users[:5]), jnp.asarray(mj[:5]),
                    jnp.asarray(mk[:5]))
    assert preds.shape == (5,)


def test_preference_functions():
    rng = np.random.default_rng(1)
    u_mat = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32))
    v_mat = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    u = jnp.array([0, 1, 2])
    i = jnp.array([0, 2, 4])
    j = jnp.array([1, 3, 5])
    sig = sigmoid_preference(u_mat, v_mat, u, i, j)
    mx = max_preference(u_mat, v_mat, u, i, j)
    # sigmoid(x) > 0.5 <=> x > 0: the two rules agree.
    np.testing.assert_array_equal(np.asarray(sig), np.asarray(mx))
    sm = softmax_preference(u_mat, v_mat, u, i, j)
    # softmax is monotone in scores: agrees with max rule too.
    np.testing.assert_array_equal(np.asarray(sm), np.asarray(mx))


def test_ratings_split_and_matrix():
    from mfcd_tpu.data.movielens import RatingsDataset, split_dataset, to_matrix

    ds = RatingsDataset(
        movies=np.arange(100) % 7,
        users=np.arange(100) % 11,
        ratings=np.linspace(1, 5, 100),
    )
    train, test = split_dataset(ds, p_test=0.25, seed=3)
    assert len(train) + len(test) == 100
    assert 10 < len(test) < 45
    mat = to_matrix(ds, 7, 11)
    assert mat.shape == (7, 11)
    assert mat[0, 0] == ds.ratings[np.flatnonzero(
        (ds.movies == 0) & (ds.users == 0))[-1]]
