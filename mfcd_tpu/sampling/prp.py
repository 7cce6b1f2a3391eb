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

from mfcd_tpu.ops.shuffle import (exact_prefix_permutation,
                                  exact_prefix_permutation_inverse)


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


def prp_splits(
    sample_key: jax.Array,
    split_key: jax.Array,
    n: int,
    m: int,
    t_cap: int,
    train_cap: int,
    val_cap: int,
    test_cap: int,
    count,
    extra_cap: int = 0,
    extra_count=0,
):
    """Assemble the 80/10/10 split buffers by a PURE MAP over output slots.

    The scatter formulation (``dedup.ranks_to_splits``) sends rank ``r``
    to split slot ``y = splitPRP(r)``; since that map is an exact
    bijection, each output slot can instead compute its own source:
    ``r = splitPRP^{-1}(y)`` then ``triplet = decode(tripletPRP(r))`` —
    no scatter, no gather, no materialized candidate array.  Bit-identical
    to scattering ``prp_triplets(sample_key, arange)`` through
    ``ranks_to_splits`` (pinned by tests/test_prp_sampler.py).

    The test top-up is folded into the same map: test slots past the
    dataset's ``test_sz`` read the PRP continuation block at
    ``t_cap + (off - test_sz)`` — the compact concatenation of
    ``sample_and_split`` with zero extra passes.  The returned test
    buffer has ``test_cap + extra_cap`` rows and its count includes the
    top-up.

    Returns a :class:`mfcd_tpu.sampling.dedup.SplitArrays`.
    """
    from mfcd_tpu.core.config import TRAIN_RATIO, VAL_RATIO
    from mfcd_tpu.sampling.dedup import SplitArrays

    count = jnp.asarray(count, jnp.int32)
    extra_count = jnp.asarray(extra_count, jnp.int32)
    train_sz = jnp.floor(TRAIN_RATIO * count).astype(jnp.int32)
    val_sz = jnp.floor(VAL_RATIO * count).astype(jnp.int32)
    test_sz = count - train_sz - val_sz
    # Rows past a region's capacity are dropped, exactly as the scatter
    # formulation drops them (ranks_to_splits' in_* cap bounds).
    test_fit = jnp.minimum(test_sz, test_cap)

    total = train_cap + val_cap + (test_cap + extra_cap)
    o = jnp.arange(total, dtype=jnp.int32)
    in_tr = o < train_cap
    in_va = (o >= train_cap) & (o < train_cap + val_cap)
    off = jnp.where(
        in_tr, o,
        jnp.where(in_va, o - train_cap, o - train_cap - val_cap))
    base = jnp.where(in_tr, 0, jnp.where(in_va, train_sz,
                                         train_sz + val_sz))
    sz = jnp.where(in_tr, train_sz, jnp.where(in_va, val_sz, test_fit))
    is_data = off < sz
    # Top-up continuation: test slots just past the dataset rows.
    is_extra = (~in_tr) & (~in_va) & (off >= test_fit) \
        & (off - test_fit < extra_count)

    y = jnp.where(is_data, base + off, 0)
    k_bits = max((t_cap - 1).bit_length(), 1)
    r = exact_prefix_permutation_inverse(split_key, y, count, k_bits)
    slots = jnp.where(is_extra, t_cap + (off - test_fit), r)
    tri = prp_triplets(sample_key, n, m, slots)
    big = jnp.where((is_data | is_extra)[:, None], tri, 0)

    return SplitArrays(
        train=big[:train_cap],
        train_count=jnp.minimum(train_sz, train_cap),
        val=big[train_cap:train_cap + val_cap],
        val_count=jnp.minimum(val_sz, val_cap),
        test=big[train_cap + val_cap:],
        test_count=jnp.minimum(test_sz, test_cap) + extra_count,
    )
