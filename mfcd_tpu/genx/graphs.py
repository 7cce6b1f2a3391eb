"""Watts–Strogatz social-graph generators, device-side.

The reference builds ``networkx.watts_strogatz_graph(n, k=5, p=0.1)`` and
applies an in-place, sequential friend-mean smoothing of user embeddings
(``generation_data.py:539-619``).  Here the small-world graph is a boolean
adjacency built by masked ring rewiring, and the smoothing is a single
vectorized (Jacobi) step ``U <- (1-w) U + w * (A @ U) / deg``.

Documented divergences from the reference (statistical, not behavioral):
- the reference's per-node loop is Gauss–Seidel (node u sees already-smoothed
  friends f < u); the vectorized step uses the pre-update embeddings,
- rewired edges may collide with existing ones and collapse in the boolean
  adjacency, slightly lowering average degree (networkx redraws instead).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n", "k"))
def watts_strogatz_adjacency(
    key: jax.Array, n: int, k: int = 5, p: float = 0.1
) -> jax.Array:
    """Boolean [n, n] adjacency of a Watts–Strogatz small-world graph.

    Matches networkx semantics: each node connects to ``k // 2`` ring
    neighbors on each side, and each ring edge (u, u+off) is rewired to a
    uniform non-self target with probability ``p``.
    """
    adj = jnp.zeros((n, n), dtype=bool)
    nodes = jnp.arange(n)
    half = k // 2
    for off in range(1, half + 1):
        kk = jax.random.fold_in(key, off)
        kb, kt = jax.random.split(kk)
        rewire = jax.random.bernoulli(kb, p, (n,))
        ring_tgt = (nodes + off) % n
        # Uniform non-self target: draw in [0, n-1) and skip past self.
        raw = jax.random.randint(kt, (n,), 0, n - 1)
        rand_tgt = jnp.where(raw >= nodes, raw + 1, raw)
        tgt = jnp.where(rewire, rand_tgt, ring_tgt)
        adj = adj.at[nodes, tgt].set(True)
        adj = adj.at[tgt, nodes].set(True)
    return adj


def _social_smooth(u: jax.Array, adj: jax.Array, influence: float) -> jax.Array:
    """One smoothing step toward friend means; isolated nodes unchanged
    (reference's ``if friends:`` guard, ``generation_data.py:571-574``)."""
    a = adj.astype(u.dtype)
    deg = jnp.sum(a, axis=1, keepdims=True)
    friend_mean = (a @ u) / jnp.maximum(deg, 1.0)
    smoothed = (1.0 - influence) * u + influence * friend_mean
    return jnp.where(deg > 0, smoothed, u)


def generate_graph(
    key: jax.Array, n: int, m: int, d: int,
    social_influence: float = 0.3, noise: float = 0.1,
) -> tuple[jax.Array, jax.Array]:
    """``generation="graph"`` (reference ``generation_data.py:539-585``):
    2-dim base signal smoothed over a Watts–Strogatz user graph, noise-padded
    to d dims; V scaled by 1/sqrt(d)."""
    d_eff = min(d, 2)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    u_low = jax.random.normal(k1, (n, d_eff), dtype=jnp.float32)
    v_low = jax.random.normal(k2, (m, d_eff), dtype=jnp.float32)
    adj = watts_strogatz_adjacency(k3, n, k=5, p=0.1)
    u_low = _social_smooth(u_low, adj, social_influence)
    u = jnp.concatenate(
        [u_low, noise * jax.random.normal(k4, (n, d - d_eff), dtype=jnp.float32)],
        axis=1,
    )
    v = jnp.concatenate(
        [v_low, noise * jax.random.normal(k5, (m, d - d_eff), dtype=jnp.float32)],
        axis=1,
    )
    return u, v / jnp.sqrt(jnp.float32(d))


def generate_social(
    key: jax.Array, n: int, m: int, d: int, social_influence: float = 0.5
) -> tuple[jax.Array, jax.Array]:
    """``generation="social"`` (reference ``generation_data.py:588-619``):
    full-d embeddings smoothed over a Watts–Strogatz graph; U scaled by
    1/log(d+1)."""
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.normal(k1, (n, d), dtype=jnp.float32)
    v = jax.random.normal(k2, (m, d), dtype=jnp.float32)
    adj = watts_strogatz_adjacency(k3, n, k=5, p=0.1)
    u = _social_smooth(u, adj, social_influence)
    return u / jnp.log(jnp.float32(d + 1)), v
