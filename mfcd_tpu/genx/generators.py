"""Ground-truth matrix generators (simple families).

TPU-native re-designs of the reference's torch/scipy generators
(``generation_data.py:341-715``).  Each is a pure function of a PRNG key
with static shapes, jittable and vmappable.  The Haar-orthogonal frames the
reference draws via full ``scipy.stats.ortho_group.rvs`` (O(n^3) for an
n x n matrix of which only d columns are used, ``generation_data.py:365-366``)
are sampled here directly as n x d orthonormal frames via QR of a Gaussian —
the same distribution at O(n d^2) cost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def haar_frame(key: jax.Array, n: int, d: int) -> jax.Array:
    """Random n x d orthonormal frame, Haar-distributed.

    QR of an i.i.d. Gaussian with the R-diagonal sign fix gives the first d
    columns of a Haar orthogonal matrix — distributionally identical to
    ``ortho_group.rvs(dim=n)[:, :d]`` (reference ``generation_data.py:380``).
    """
    g = jax.random.normal(key, (n, d), dtype=jnp.float32)
    q, r = jnp.linalg.qr(g)
    return q * jnp.sign(jnp.diagonal(r))[None, :]


def generate_base(key: jax.Array, n: int, m: int, d: int) -> jax.Array:
    """``generation="base"`` (reference ``generation_data.py:346-370``).

    X = U S V^T with Haar-orthogonal U, V, singular values 1/sqrt(d) on the
    first d modes, scaled by sqrt(n*m)/2.  Only the first d columns of U, V
    touch X, so we sample the frames directly.
    """
    ku, kv = jax.random.split(key)
    u = haar_frame(ku, n, d)
    v = haar_frame(kv, m, d)
    scale = jnp.sqrt(jnp.float32(n * m)) / 2.0 / jnp.sqrt(jnp.float32(d))
    return (u @ v.T) * scale


def generate_low_rank(
    key: jax.Array, n: int, m: int, d: int, rank: int | None = None
) -> jax.Array:
    """``generation="low_rank"`` (reference ``generation_data.py:373-391``
    combined in ``structure.py:614-615``): X = U diag(S) V^T with orthonormal
    n x d / m x d factors and S = [1]*rank + [0]*(d-rank)."""
    if rank is None:
        rank = d
    ku, kv = jax.random.split(key)
    u = haar_frame(ku, n, d)
    v = haar_frame(kv, m, d)
    s = jnp.where(jnp.arange(d) < rank, 1.0, 0.0).astype(jnp.float32)
    return (u * s[None, :]) @ v.T


def generate_structured(
    key: jax.Array, n: int, m: int, d: int,
    num_clusters: int = 5, cluster_std: float = 0.1,
) -> tuple[jax.Array, jax.Array]:
    """``generation="structured"`` (reference ``generation_data.py:437-467``):
    item clusters with Gaussian jitter; users = affinity @ centers."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    centers = jax.random.normal(k1, (num_clusters, d), dtype=jnp.float32)
    assign = jax.random.randint(k2, (m,), 0, num_clusters)
    v = centers[assign] + cluster_std * jax.random.normal(
        k3, (m, d), dtype=jnp.float32)
    affinity = jax.random.normal(k4, (n, num_clusters), dtype=jnp.float32)
    u = affinity @ centers
    return u, v


def generate_svd(
    key: jax.Array, n: int, m: int, d: int, noise_level: float = 0.1
) -> tuple[jax.Array, jax.Array]:
    """``generation="svd"`` (reference ``generation_data.py:470-502``):
    SVD of a random matrix, keep top-d modes scaled by sqrt(S), add noise."""
    k1, k2, k3 = jax.random.split(key, 3)
    scores = jax.random.normal(k1, (n, m), dtype=jnp.float32)
    u_full, s, vt = jnp.linalg.svd(scores, full_matrices=False)
    sq = jnp.sqrt(s[:d])
    u = u_full[:, :d] * sq[None, :]
    v = vt[:d, :].T * sq[None, :]
    u = u + noise_level * jax.random.normal(k2, u.shape, dtype=jnp.float32)
    v = v + noise_level * jax.random.normal(k3, v.shape, dtype=jnp.float32)
    return u, v


def generate_correlated(
    key: jax.Array, n: int, m: int, d: int, correlation_factor: float = 0.8
) -> tuple[jax.Array, jax.Array]:
    """``generation="correlated"`` (reference ``generation_data.py:505-534``):
    multiply i.i.d. embeddings by (1-c) I + c 11^T, then divide by d."""
    k1, k2 = jax.random.split(key)
    u = jax.random.normal(k1, (n, d), dtype=jnp.float32)
    v = jax.random.normal(k2, (m, d), dtype=jnp.float32)
    corr = (
        jnp.eye(d, dtype=jnp.float32) * (1.0 - correlation_factor)
        + correlation_factor * jnp.ones((d, d), dtype=jnp.float32)
    )
    return (u @ corr) / d, (v @ corr) / d


def generate_temporal(
    key: jax.Array, n: int, m: int, d: int, timesteps: int = 5
) -> tuple[jax.Array, jax.Array]:
    """``generation="temporal"`` (reference ``generation_data.py:622-651``):
    base + timesteps * (0.02 * N(0,1)) drift; V scaled by 1/sqrt(d)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = jax.random.normal(k1, (n, d), dtype=jnp.float32)
    v = jax.random.normal(k2, (m, d), dtype=jnp.float32)
    u = u + timesteps * 0.02 * jax.random.normal(k3, (n, d), dtype=jnp.float32)
    v = v + timesteps * 0.02 * jax.random.normal(k4, (m, d), dtype=jnp.float32)
    return u, v / jnp.sqrt(jnp.float32(d))


def generate_hierarchical(
    key: jax.Array, n: int, m: int, d: int, num_groups: int = 5
) -> tuple[jax.Array, jax.Array]:
    """``generation="hierarchical"`` (reference ``generation_data.py:653-683``):
    group centers plus 10x individual noise (the group signal is mostly
    drowned — a reference quirk preserved as-is); V scaled by 1/log(d+1)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    groups = jax.random.normal(k1, (num_groups, d), dtype=jnp.float32)
    assign = jax.random.randint(k2, (n,), 0, num_groups)
    u = groups[assign] + 10.0 * jax.random.normal(k3, (n, d), dtype=jnp.float32)
    v = jax.random.normal(k4, (m, d), dtype=jnp.float32)
    return u, v / jnp.log(jnp.float32(d + 1))
