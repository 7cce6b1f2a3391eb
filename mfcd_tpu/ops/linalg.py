"""Randomized low-rank linear algebra (MXU-friendly).

Full iterative SVDs on TPU are expensive in both compile and run time;
every consumer here needs only a leading-rank factorization, which
randomized subspace iteration (Halko et al. 2011) delivers with a handful
of n x m x q matmuls and thin QRs — exactly the shapes the MXU likes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def randomized_svd(
    x: jax.Array, q: int, key: jax.Array, iters: int = 4
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Approximate leading-q SVD: returns (U [n,q], s [q], Vt [q,m]).

    Power/subspace iteration with re-orthonormalization; leading singular
    triplets are accurate to ~1e-4 relative for the matrices used here.
    """
    n, m = x.shape
    g = jax.random.normal(key, (m, q), x.dtype)
    y = x @ g
    for _ in range(iters):
        y, _ = jnp.linalg.qr(y)
        y = x @ (x.T @ y)
    qmat, _ = jnp.linalg.qr(y)          # [n, q]
    b = qmat.T @ x                       # [q, m]
    u_b, s, vt = jnp.linalg.svd(b, full_matrices=False)
    return qmat @ u_b, s, vt


def top_singular_values(
    x: jax.Array, q: int, key: jax.Array, iters: int = 4
) -> jax.Array:
    """Top-q singular values only (skips the final left-vector matmul)."""
    y = x @ jax.random.normal(key, (x.shape[1], q), x.dtype)
    for _ in range(iters):
        y, _ = jnp.linalg.qr(y)
        y = x @ (x.T @ y)
    qmat, _ = jnp.linalg.qr(y)
    return jnp.linalg.svd(qmat.T @ x, compute_uv=False)
