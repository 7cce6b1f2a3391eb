"""Direct sampling-without-replacement via keyed permutation prefixes.

The reference's ``random`` / ``proximity`` / ``top_k`` / ``svd`` samplers
(``generation_data.py:16-26, 29-43, 189-224, 128-179``) are rejection
loops over a finite proposal domain with uniform proposals: draw, reject
duplicates, stop at ``num_triplets`` — i.e. a uniformly random T-subset
of the domain, in uniform order.  A keyed pseudorandom permutation gives that *directly*:
the first T values of a PRP over [0, |D|) are a uniform sample without
replacement, so decoding ``prp(key, arange(T))`` reproduces the rejection
loop's output distribution with

- zero overdraw (the legacy path draws ~1.3x proposals),
- no hash table / scatter-min winner selection (the 2^20-24-slot table
  and its latency-bound scatter+gather vanish),
- no shortfall, ever: ``count == target`` by construction, and
- exclusion-free test top-up: slots [t_cap, t_cap + extra) are distinct
  from the whole main block by bijectivity (the reference's exclude-set
  semantics, ``structure.py:721-730``, for free).  Conditioned on the
  dataset, the continuation block is exchangeable with any uniform
  without-replacement draw from the unseen remainder.

Domains:

- random: D = [n] x {(i, j) : i != j}, decoded by mixed radix
  (:func:`decode_random`).
- proximity: D = [n] x [kk] x [kk] position tuples mapped through the
  per-user top-kk / bottom-kk index tables (:func:`decode_proximity`).
  The map is injective (top-k indices are distinct per row, so the
  position is recoverable from the item), and when ``m >= 2*kk`` the top
  and bottom index sets are provably disjoint, so ``i != j`` always —
  dedup on positions IS dedup on (u, i, j) and no rejection can occur.
- top_k: D = [n] x {(a, b) in [kk]^2 : a != b} through the per-user
  top-kk table (:func:`decode_top_k`); the reference redraws j until
  j != i inside one user's top set (``generation_data.py:189-224``),
  i.e. uniform over ordered distinct position pairs, and per-row
  distinct indices make position dedup triplet dedup with i != j exact.
- svd: D = [n_top] x {(a, b) in [m_top]^2 : a != b} through the global
  top-user / top-item norm tables (:func:`decode_svd`); the reference
  draws u from ``top_users`` and an ordered distinct item pair from
  ``top_items`` (``generation_data.py:128-179``), both tables have
  distinct entries, so the decode is injective and i != j exact.

``margin`` is uniform proposals filtered by a data-dependent acceptance
window: PRP-DISTINCT proposals (``strategies.propose_margin`` with
``prp_distinct=True``) make acceptance the only selection left — no
dedup pass — with the top-up as the continuation block under the
top-up's own window.  The non-uniform proposals (popularity's
zipf/exponential weights, variance's multinomial, cluster's
size-dependent within-cluster draws) and ``user_similarity`` (whose
position map is non-injective) keep the overdraw -> dedup path.

PRP quality (vs a true uniform permutation) is the same 3-round keyed
mixing already trusted for epoch shuffles (``ops/shuffle.py``);
distribution-level parity vs the torch samplers is pinned by the
chi-square suites (tests/test_prp_sampler.py, tests/test_sampler_parity.py,
tests/test_reference_parity.py).

Gated per strategy (see :func:`fast_path_kind`, the shape-only summary
shared with the sweep's memory model): the packed domain must fit int32
and the requested blocks must fit the domain, plus strategy-specific
conditions documented on each gate.  ``MFCD_PRP_SAMPLER=0`` is an
emergency kill switch (read at trace time, like MFCD_RESHUFFLE_PERIOD —
set it before the first sampling call in a process).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from mfcd_tpu.ops.shuffle import (exact_prefix_permutation,
                                  exact_prefix_permutation_inverse)

PROXIMITY_K = 100  # reference default (generation_data.py:29)


def _env_enabled() -> bool:
    return os.environ.get("MFCD_PRP_SAMPLER", "1") != "0"


def prp_domain_size(n: int, m: int) -> int:
    """|D| = n * m * (m - 1) ordered (u, i, j) tuples with i != j."""
    return int(n) * int(m) * (int(m) - 1)


def prp_supported(n: int, m: int, *blocks: int) -> bool:
    """Random-strategy gate: packable domain, blocks fit, env on."""
    dom = prp_domain_size(n, m)
    return (_env_enabled() and m >= 2 and dom < 2**31
            and sum(int(b) for b in blocks) <= dom)


def proximity_prp_supported(n: int, m: int, *blocks: int,
                            k: int = PROXIMITY_K) -> bool:
    """Proximity-strategy gate.

    Additionally requires ``m >= 2*kk`` so the top/bottom index sets are
    disjoint (an index among the kk largest cannot also be among the kk
    smallest) — then i != j holds for every domain tuple and the
    rejection probability is exactly zero.
    """
    kk = min(int(k), int(m))
    dom = int(n) * kk * kk
    return (_env_enabled() and m >= 2 * kk and dom < 2**31
            and sum(int(b) for b in blocks) <= dom)


def prp_indices(key: jax.Array, slots: jax.Array, dom: int) -> jax.Array:
    """Evaluate the exact domain PRP at ``slots`` (distinct, in [0, dom))."""
    k_bits = max((dom - 1).bit_length(), 1)
    return exact_prefix_permutation(key, slots.astype(jnp.int32), dom,
                                    k_bits)


def _pair_decode(pair: jax.Array, k: int):
    """Decode pair in [0, k(k-1)) into ordered distinct (a, b), a != b."""
    a = pair // (k - 1)
    bp = pair - a * (k - 1)
    b = bp + (bp >= a).astype(jnp.int32)
    return a, b


def decode_random(idx: jax.Array, n: int, m: int) -> jax.Array:
    """Mixed-radix decode of a random-domain index into (u, i, j), i != j."""
    pairs_per_u = m * (m - 1)
    u = idx // pairs_per_u
    i, j = _pair_decode(idx - u * pairs_per_u, m)
    return jnp.stack([u, i, j], axis=1).astype(jnp.int32)


def prp_triplets(key: jax.Array, n: int, m: int,
                 slots: jax.Array) -> jax.Array:
    """Decode PRP(key)[slots] into [T, 3] int32 (u, i, j) rows, i != j.

    ``slots`` must be distinct ints in [0, domain) — distinct slots give
    distinct triplets (bijectivity).  Any disjoint slot blocks under the
    SAME key are disjoint triplet sets (the test top-up continuation).
    """
    return decode_random(prp_indices(key, slots, prp_domain_size(n, m)),
                         n, m)


def proximity_tables(x: jax.Array, k: int = PROXIMITY_K,
                     disjoint: bool = True):
    """Per-user top-kk / bottom-kk item-index tables ([n, kk] int32 each).

    Matches the reference's ``torch.topk(scores)`` / ``torch.topk(-scores)``
    index sets (``generation_data.py:36-37``).  With ``disjoint=True``
    (the PRP path) the bottom table is computed with the top-kk entries
    masked to +inf — a no-op for continuous X with ``m >= 2*kk`` (the
    sets are disjoint anyway, bit-identical tables) that keeps the
    tables STRUCTURALLY disjoint when X has ties (e.g. quantized input),
    so the PRP decode's ``i != j`` and injectivity guarantees hold for
    every input.  The overdraw path uses ``disjoint=False`` + an
    explicit ``i != j`` validity mask, the reference's exact rejection
    semantics under ties.
    """
    kk = min(int(k), x.shape[1])
    top = jax.lax.top_k(x, kk)[1].astype(jnp.int32)
    if disjoint:
        x = jnp.put_along_axis(x, top, jnp.inf, axis=1, inplace=False)
    bot = jax.lax.top_k(-x, kk)[1].astype(jnp.int32)
    return top, bot


def decode_proximity(idx: jax.Array, kk: int, top_idx: jax.Array,
                     bot_idx: jax.Array) -> jax.Array:
    """Decode a proximity-domain index (u, a, b) -> (u, top[u,a], bot[u,b])."""
    per_u = kk * kk
    u = idx // per_u
    rest = idx - u * per_u
    a = rest // kk
    b = rest - a * kk
    return jnp.stack([u, top_idx[u, a], bot_idx[u, b]],
                     axis=1).astype(jnp.int32)


def topk_prp_supported(n: int, m: int, *blocks: int,
                       k: int | None = None) -> bool:
    """top_k-strategy gate: kk >= 2, packable domain, blocks fit, env on.

    ``kk`` defaults to the reference's ``min(m, max(5, 0.1 m))``
    (``generation_data.py:199``, :func:`strategies.top_k_value`).
    """
    from mfcd_tpu.sampling.strategies import top_k_value

    kk = top_k_value(m) if k is None else min(int(k), int(m))
    dom = int(n) * kk * (kk - 1)
    return (_env_enabled() and kk >= 2 and dom < 2**31
            and sum(int(b) for b in blocks) <= dom)


def topk_table(x: jax.Array, k: int | None = None) -> jax.Array:
    """Per-user top-kk item-index table ([n, kk] int32).

    Matches ``torch.topk(scores, k).indices`` (``generation_data.py:207``).
    """
    from mfcd_tpu.sampling.strategies import top_k_value

    kk = top_k_value(x.shape[1]) if k is None else min(int(k), x.shape[1])
    return jax.lax.top_k(x, kk)[1].astype(jnp.int32)


def decode_top_k(idx: jax.Array, kk: int, top_idx: jax.Array) -> jax.Array:
    """Decode a top_k-domain index (u, a, b) -> (u, top[u,a], top[u,b])."""
    per_u = kk * (kk - 1)
    u = idx // per_u
    a, b = _pair_decode(idx - u * per_u, kk)
    return jnp.stack([u, top_idx[u, a], top_idx[u, b]],
                     axis=1).astype(jnp.int32)


def svd_dims(n: int, m: int, top_fraction: float = 0.3):
    """(num_top_users, num_top_items) (``generation_data.py:156-157``)."""
    return (max(1, int(top_fraction * n)), max(2, int(top_fraction * m)))


def svd_prp_supported(n: int, m: int, *blocks: int,
                      top_fraction: float = 0.3) -> bool:
    """svd-strategy gate: packable top-set domain, blocks fit, env on."""
    nu, mt = svd_dims(n, m, top_fraction)
    dom = nu * mt * (mt - 1)
    return (_env_enabled() and mt >= 2 and dom < 2**31
            and sum(int(b) for b in blocks) <= dom)


def decode_svd(idx: jax.Array, mt: int, top_users: jax.Array,
               top_items: jax.Array) -> jax.Array:
    """Decode an svd-domain index (us, a, b) ->
    (top_users[us], top_items[a], top_items[b])."""
    per_u = mt * (mt - 1)
    us = idx // per_u
    a, b = _pair_decode(idx - us * per_u, mt)
    return jnp.stack([top_users[us], top_items[a], top_items[b]],
                     axis=1).astype(jnp.int32)


def margin_prp_supported(n: int, m: int, t_cap: int,
                         extra_cap: int = 0) -> bool:
    """Margin PRP-distinct gate (shape-only).

    Proposal blocks are the strategy's overdraw plans; additionally
    requires ``2 * extra_cap <= t_cap`` so the top-up's acceptance
    window (scaling with the exact budgets; pow-2 capacity bucketing
    keeps budget > t_cap / 2) is provably a SUBSET of the main window —
    a wider top-up window could reach elements stranded in main-block
    slots, a bias the reference (which excludes just the kept dataset)
    does not have.
    """
    from mfcd_tpu.sampling.strategies import plan_overdraw

    md = plan_overdraw("margin", t_cap, n, m)
    extra_draw = (plan_overdraw("margin", extra_cap, n, m)
                  if extra_cap > 0 else 0)
    return (prp_supported(n, m, md + extra_draw)
            and 2 * extra_cap <= t_cap)


def fast_path_kind(strategy: str, n: int, m: int, t_cap: int,
                   extra_cap: int = 0):
    """Which sampler working set ``sample_and_split`` will allocate.

    'prefix' — pure PRP map, NO candidate array (random / proximity /
    top_k / svd); 'distinct' — PRP-distinct candidates + acceptance, no
    hash table (margin); None — full overdraw + dedup.  Shape-only, so
    the sweep's memory model (``sweep.batched.default_max_bucket``) can
    share the exact gate logic.
    """
    blocks = (t_cap, extra_cap)
    if strategy == "random" and prp_supported(n, m, *blocks):
        return "prefix"
    if strategy == "proximity" and proximity_prp_supported(n, m, *blocks):
        return "prefix"
    if strategy == "top_k" and topk_prp_supported(n, m, *blocks):
        return "prefix"
    if strategy == "svd" and svd_prp_supported(n, m, *blocks):
        return "prefix"
    if strategy == "margin" and margin_prp_supported(n, m, t_cap,
                                                     extra_cap):
        return "distinct"
    return None


def uniform_domain(strategy: str, x: jax.Array, *blocks: int,
                   key: jax.Array | None = None,
                   svd_num_triplets: int | None = None,
                   svd_budget=None):
    """Resolve a uniform-proposal strategy to its PRP fast path.

    Returns ``(dom, decode, key)`` — the packed domain size, a
    [T]-indices -> [T, 3]-triplets decoder closure, and the key the
    caller must evaluate the PRP with (split off the input ``key`` for
    svd, whose table decomposition consumes randomness; unchanged
    otherwise) — or ``None`` when the strategy/shape is not
    PRP-eligible.  The single dispatch shared by ``sample_triplets``
    and ``data.btl.sample_and_split``.
    """
    n, m = x.shape
    if strategy == "random" and prp_supported(n, m, *blocks):
        return (prp_domain_size(n, m),
                lambda idx: decode_random(idx, n, m), key)
    if strategy == "proximity" and proximity_prp_supported(n, m, *blocks):
        kk = min(PROXIMITY_K, m)
        top_idx, bot_idx = proximity_tables(x)
        return (n * kk * kk,
                lambda idx: decode_proximity(idx, kk, top_idx, bot_idx),
                key)
    if strategy == "top_k" and topk_prp_supported(n, m, *blocks):
        top_idx = topk_table(x)
        kk = top_idx.shape[1]
        return (n * kk * (kk - 1),
                lambda idx: decode_top_k(idx, kk, top_idx), key)
    if strategy == "svd" and svd_prp_supported(n, m, *blocks):
        from mfcd_tpu.sampling.strategies import svd_tables

        k_tbl, key = jax.random.split(key)
        tu, ti = svd_tables(k_tbl, x, svd_num_triplets, budget=svd_budget)
        nu, mt = tu.shape[0], ti.shape[0]
        return (nu * mt * (mt - 1),
                lambda idx: decode_svd(idx, mt, tu, ti), key)
    return None


def prp_splits(
    sample_key: jax.Array,
    split_key: jax.Array,
    dom: int,
    decode,
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
    ``r = splitPRP^{-1}(y)`` then ``triplet = decode(domPRP(r))`` —
    no scatter, no gather, no materialized candidate array.  Bit-identical
    to scattering the forward rows through ``ranks_to_splits`` (pinned by
    tests/test_prp_sampler.py).

    The test top-up is folded into the same map: test slots past the
    dataset's ``test_sz`` read the PRP continuation block at
    ``t_cap + (off - test_sz)`` — the compact concatenation of
    ``sample_and_split`` with zero extra passes.  The returned test
    buffer has ``test_cap + extra_cap`` rows and its count includes the
    top-up.

    ``decode`` maps [T] domain indices to [T, 3] triplets
    (:func:`decode_random` / :func:`decode_proximity` partials).

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
    tri = decode(prp_indices(sample_key, slots, dom))
    big = jnp.where((is_data | is_extra)[:, None], tri, 0)

    return SplitArrays(
        train=big[:train_cap],
        train_count=jnp.minimum(train_sz, train_cap),
        val=big[train_cap:train_cap + val_cap],
        val_count=jnp.minimum(val_sz, val_cap),
        test=big[train_cap + val_cap:],
        test_count=jnp.minimum(test_sz, test_cap) + extra_count,
    )
