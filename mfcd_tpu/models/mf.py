"""The matrix-factorization BTL model as a parameter pytree.

Capability match for ``MatrixFactorization`` (reference
``structure.py:746-795``): two embedding tables U (n x d), V (m x d)
initialised N(0, 1)/sqrt(d), predicting
``sigmoid(sum_d U[u] * (V[i] - V[j]))``.

The forward is a row gather + fused dot; its transpose (the gradient) is a
scatter-add into the gathered rows, which XLA lowers to an efficient TPU
scatter — see ``mfcd_tpu.ops.kernels`` for the Pallas fused path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MFParams(NamedTuple):
    U: jax.Array  # [n, d] user embeddings
    V: jax.Array  # [m, d] item embeddings


def init_params(key: jax.Array, n: int, m: int, d: int) -> MFParams:
    """N(0, 1)/sqrt(d) init (reference ``structure.py:770-771``)."""
    ku, kv = jax.random.split(key)
    inv_sqrt_d = 1.0 / jnp.sqrt(jnp.float32(d))
    return MFParams(
        U=jax.random.normal(ku, (n, d), dtype=jnp.float32) * inv_sqrt_d,
        V=jax.random.normal(kv, (m, d), dtype=jnp.float32) * inv_sqrt_d,
    )


def forward_logits(
    params: MFParams, u: jax.Array, i: jax.Array, j: jax.Array
) -> jax.Array:
    """Pre-sigmoid score ``sum_d U[u] * (V[i] - V[j])``
    (reference ``structure.py:787-792``)."""
    eu = params.U[u]
    ev = params.V[i] - params.V[j]
    return jnp.sum(eu * ev, axis=-1)


def forward_prob(
    params: MFParams, u: jax.Array, i: jax.Array, j: jax.Array
) -> jax.Array:
    """Preference probability (reference ``structure.py:795``)."""
    return jax.nn.sigmoid(forward_logits(params, u, i, j))
