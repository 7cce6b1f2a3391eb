"""Direct sampling-without-replacement for the ``random`` strategy.

The reference's random sampler (``generation_data.py:16-26``) is a
rejection loop: draw (u, i, j) uniformly (u ~ U[n]; i, j ~ U[m], retry
i == j), insert into a set, stop at ``num_triplets`` — i.e. a uniformly
random T-subset of the domain D = [n] x {(i, j) : i != j}, in uniform
order.  A keyed pseudorandom permutation gives that *directly*: the first
T values of a PRP over [0, |D|) are a uniform sample without replacement,
so decoding ``prp(key, arange(T))`` by mixed radix reproduces the
rejection loop's output distribution with

- zero overdraw (the legacy path draws ~1.3x proposals),
- no hash table / scatter-min winner selection (the 2^20-24-slot table
  and its latency-bound scatter+gather vanish),
- no shortfall, ever: ``count == target`` by construction, and
- exclusion-free test top-up: slots [t_cap, t_cap + extra) are distinct
  from the whole main block by bijectivity (the reference's exclude-set
  semantics, ``structure.py:721-730``, for free).  Conditioned on the
  dataset, the continuation block is exchangeable with any uniform
  without-replacement draw from the unseen remainder.

PRP quality (vs a true uniform permutation) is the same 3-round keyed
mixing already trusted for epoch shuffles (``ops/shuffle.py``);
distribution-level parity vs the torch sampler is pinned by the
chi-square suite (tests/test_sampler_parity.py).

Gated by :func:`prp_supported`: the packed domain must fit int32 and the
requested blocks must fit the domain.  ``MFCD_PRP_SAMPLER=0`` is an
emergency kill switch (read at trace time, like MFCD_RESHUFFLE_PERIOD —
set it before the first sampling call in a process).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from mfcd_tpu.ops.shuffle import exact_prefix_permutation


def prp_domain_size(n: int, m: int) -> int:
    """|D| = n * m * (m - 1) ordered (u, i, j) tuples with i != j."""
    return int(n) * int(m) * (int(m) - 1)


def prp_supported(n: int, m: int, *blocks: int) -> bool:
    """Whether the PRP fast path applies for ``sum(blocks)`` slots.

    Requires m >= 2, an int32-packable domain, every slot inside the
    domain, and the trace-time env gate.
    """
    if os.environ.get("MFCD_PRP_SAMPLER", "1") == "0":
        return False
    dom = prp_domain_size(n, m)
    return m >= 2 and dom < 2**31 and sum(int(b) for b in blocks) <= dom


def prp_triplets(key: jax.Array, n: int, m: int,
                 slots: jax.Array) -> jax.Array:
    """Decode PRP(key)[slots] into [T, 3] int32 (u, i, j) rows, i != j.

    ``slots`` must be distinct ints in [0, domain) — distinct slots give
    distinct triplets (bijectivity).  Any disjoint slot blocks under the
    SAME key are disjoint triplet sets (the test top-up continuation).
    """
    dom = prp_domain_size(n, m)
    k_bits = max((dom - 1).bit_length(), 1)
    idx = exact_prefix_permutation(key, slots.astype(jnp.int32), dom, k_bits)
    pairs_per_u = m * (m - 1)
    u = idx // pairs_per_u
    pair = idx - u * pairs_per_u
    i = pair // (m - 1)
    jp = pair - i * (m - 1)
    j = jp + (jp >= i).astype(jnp.int32)
    return jnp.stack([u, i, j], axis=1).astype(jnp.int32)
