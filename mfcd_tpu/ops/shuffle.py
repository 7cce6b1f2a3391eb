"""Sort-free epoch shuffling — a keyed bijection with cycle walking.

``torch.utils.data.DataLoader(shuffle=True)`` draws a fresh uniform
permutation per epoch (reference ``structure.py:738``).  The direct JAX
translation (``argsort`` of random keys) is runtime-cheap but TPU sorts over
~1e5 elements take *minutes of compile time per shape* — untenable when a
sparsity sweep creates dozens of shapes.  Instead, each epoch uses a keyed
pseudorandom permutation computed pointwise:

- an invertible mixing function on ``[0, 2^k)`` (odd-multiplier, xorshift,
  and add rounds — each a bijection mod 2^k, composed over 3 rounds with
  per-epoch random constants, PCG-style),
- restricted to the dynamic valid prefix ``[0, count)`` by cycle walking:
  iterate the bijection until the value lands below ``count``.  Walking a
  bijection's cycles preserves bijectivity on the sub-domain, so slots
  ``t < count`` map 1:1 onto ``[0, count)``.

The walk uses a fixed 48 iterations; since ``count > 2^(k-1)`` by
construction the failure probability per element is below 2^-48 (any
residual failure falls back to row 0 — a <1e-9 per-epoch chance of one
duplicated sample).  Quality is PRP-grade mixing rather than an exactly
uniform permutation — statistically indistinguishable for SGD shuffling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_WALK_ITERS = 48


def _derive_constants(key: jax.Array, rounds: int = 3):
    """Per-epoch odd multipliers and additive constants (uint32)."""
    bits = jax.random.bits(key, (2 * rounds,), dtype=jnp.uint32)
    muls = bits[:rounds] | jnp.uint32(1)          # odd -> invertible mod 2^k
    adds = bits[rounds:]
    return muls, adds


def _mix(x: jax.Array, muls, adds, k_bits: int) -> jax.Array:
    """Invertible mixing on [0, 2^k): rounds of mul-odd, xorshift, add."""
    mask = jnp.uint32((1 << k_bits) - 1)
    shift = jnp.uint32(max(k_bits // 2, 1))
    for r in range(muls.shape[0]):
        x = (x * muls[r]) & mask
        x = x ^ (x >> shift)
        x = (x + adds[r]) & mask
    return x


@partial(jax.jit, static_argnames=("k_bits",))
def epoch_permutation(
    key: jax.Array, slots: jax.Array, count, k_bits: int
) -> jax.Array:
    """Map slot indices [N] -> row indices in [0, count), bijectively on
    the prefix ``slots < count``.

    ``count`` may be traced (dynamic); ``k_bits`` must satisfy
    ``2^k_bits >= N`` and ``count <= 2^k_bits``.
    """
    muls, adds = _derive_constants(key)
    count_u = jnp.uint32(count)
    x = _mix(slots.astype(jnp.uint32), muls, adds, k_bits)

    # Early-exit walk: typical counts satisfy count > 2^(k-1), so almost
    # every element lands within 1-2 iterations and the loop exits after
    # ~4-6 — far cheaper than a fixed unroll at sweep batch sizes.
    def cond(state):
        it, xv = state
        return (it < _WALK_ITERS) & jnp.any(xv >= count_u)

    def body(state):
        it, xv = state
        xv = jnp.where(xv < count_u, xv, _mix(xv, muls, adds, k_bits))
        return it + 1, xv

    _, x = jax.lax.while_loop(cond, body, (jnp.int32(0), x))
    # Residual walk failures (only material under severe sampler shortfall,
    # count << 2^k) degrade to a strided scramble instead of a uniform draw.
    fallback = (slots.astype(jnp.uint32) * muls[0]) % jnp.maximum(
        count_u, jnp.uint32(1))
    x = jnp.where(x < count_u, x, fallback)
    return x.astype(jnp.int32)
