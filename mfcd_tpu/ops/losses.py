"""Loss primitives.

The reference computes ``F.binary_cross_entropy(sigmoid(logits), z)``
(reference ``structure.py:849``).  Here BCE is evaluated in the numerically
stable logit form

    bce(x, z) = max(x, 0) - x*z + log(1 + exp(-|x|))

which is exact where torch's post-sigmoid form is representable, and avoids
its -100 log-clamp pathologies in saturation.  Masked means reproduce the
DataLoader batch semantics (partial final batch has its own mean).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Elementwise stable binary cross-entropy on logits."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def masked_batch_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over masked entries; 0 when the mask is empty."""
    s = jnp.sum(jnp.where(mask, values, 0.0))
    c = jnp.sum(mask)
    return jnp.where(c > 0, s / jnp.maximum(c, 1), 0.0)
