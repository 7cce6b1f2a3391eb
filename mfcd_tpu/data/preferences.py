"""Optional preference label models (reference ``generation_data.py:717-742``).

The reference defines three never-used preference functions alongside the
BTL Bernoulli labeler; they are provided here as vectorized label models so
datasets can be built under alternative decision rules.

Each takes factor matrices U (n x d), V (m x d) and triplet index arrays and
returns {0,1} labels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_preference(u_mat, v_mat, u, i, j, scale: float = 1.0):
    """1 iff sigmoid(scale * U[u].(V[i]-V[j])) > 0.5
    (reference ``generation_data.py:723-727``)."""
    score = jnp.sum(u_mat[u] * (v_mat[i] - v_mat[j]), axis=-1)
    return (jax.nn.sigmoid(scale * score) > 0.5).astype(jnp.int32)


def softmax_preference(u_mat, v_mat, u, i, j, temp: float = 1.0):
    """1 iff softmax over all items puts more mass on i than j for user u
    (reference ``generation_data.py:729-735``)."""
    scores = (v_mat @ u_mat[u].T).T / temp       # [B, m]
    probs = jax.nn.softmax(scores, axis=-1)
    b = jnp.arange(u.shape[0])
    return (probs[b, i] > probs[b, j]).astype(jnp.int32)


def max_preference(u_mat, v_mat, u, i, j):
    """1 iff U[u].(V[i]-V[j]) > 0 (reference ``generation_data.py:737-742``)."""
    score = jnp.sum(u_mat[u] * (v_mat[i] - v_mat[j]), axis=-1)
    return (score > 0).astype(jnp.int32)
