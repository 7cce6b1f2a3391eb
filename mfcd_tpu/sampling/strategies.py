"""Triplet proposal distributions — the 9 reference sampling strategies.

Each reference strategy (``generation_data.py:11-338``) is re-designed as a
static-shape proposal function ``(key, x, m_draw) -> (cands [M,3], valid [M])``
feeding the sort-based unique selection in ``mfcd_tpu.sampling.dedup``.
Python rejection loops become overdrawn vectorized draws; weighted
without-replacement pair sampling uses exact inverse-CDF conditioning
instead of per-candidate Gumbel matrices (O(M log m), no [M, m] blowup).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from mfcd_tpu.genx.clusters import kmeans
from mfcd_tpu.ops.linalg import randomized_svd


def _categorical_pair_from_cdf(
    key: jax.Array, cdf: jax.Array, probs: jax.Array, m_draw: int
) -> Tuple[jax.Array, jax.Array]:
    """Exact sampling of (i, j), i != j, i ~ p and j ~ p | j != i.

    j is drawn from the renormalized distribution excluding i by shrinking
    the uniform variate to total mass (1 - p_i) and skipping i's CDF span —
    equivalent to ``np.random.choice(size=2, replace=False, p=probs)``
    (reference ``generation_data.py:124``) / ``torch.multinomial(...,
    replacement=False)`` (reference ``generation_data.py:95``).
    """
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (m_draw,))
    i = jnp.searchsorted(cdf, u1 * cdf[-1], side="right").astype(jnp.int32)
    i = jnp.minimum(i, cdf.shape[0] - 1)
    p_i = probs[i]
    cdf_left = cdf[i] - p_i
    u2 = jax.random.uniform(k2, (m_draw,)) * jnp.maximum(cdf[-1] - p_i, 1e-30)
    u2 = jnp.where(u2 >= cdf_left, u2 + p_i, u2)
    j = jnp.searchsorted(cdf, u2, side="right").astype(jnp.int32)
    j = jnp.minimum(j, cdf.shape[0] - 1)
    return i, j


def _distinct_pos(key: jax.Array, m_draw: int, k: int) -> Tuple[jax.Array, jax.Array]:
    """Uniform distinct pair of positions in [0, k)."""
    k1, k2 = jax.random.split(key)
    a = jax.random.randint(k1, (m_draw,), 0, k)
    b = jax.random.randint(k2, (m_draw,), 0, max(k - 1, 1))
    b = jnp.where(b >= a, b + 1, b) if k > 1 else b
    return a, b


# === RANDOM (reference ``generation_data.py:16-26``) =====================

def propose_random(key, x, m_draw):
    n, m = x.shape
    ku, kij = jax.random.split(key)
    u = jax.random.randint(ku, (m_draw,), 0, n)
    ij = jax.random.randint(kij, (m_draw, 2), 0, m)
    cands = jnp.stack([u, ij[:, 0], ij[:, 1]], axis=1)
    return cands, ij[:, 0] != ij[:, 1]


# === PROXIMITY aka Max-Min (reference ``generation_data.py:29-43``) ======

def propose_proximity(key, x, m_draw, k: int = 100):
    from mfcd_tpu.sampling.prp import proximity_tables

    n, m = x.shape
    kk = min(k, m)
    # Unmasked tables + the i != j validity mask below: the reference's
    # exact rejection semantics (the PRP path uses disjoint=True instead).
    top_idx, bot_idx = proximity_tables(x, k=kk, disjoint=False)
    ku, ki, kj = jax.random.split(key, 3)
    u = jax.random.randint(ku, (m_draw,), 0, n)
    i = top_idx[u, jax.random.randint(ki, (m_draw,), 0, kk)]
    j = bot_idx[u, jax.random.randint(kj, (m_draw,), 0, kk)]
    cands = jnp.stack([u, i, j], axis=1)
    return cands, i != j


# === MARGIN aka Close-Call (reference ``generation_data.py:46-84``) ======

def margin_window(x, num_triplets):
    """Adaptive margin from the first min(10, n) rows
    (reference ``generation_data.py:56-57``); ``num_triplets`` may be
    traced (the exact budget under capacity bucketing)."""
    n, m = x.shape
    sample = x[: min(10, n)]
    margin = jnp.mean(jnp.max(sample, axis=1) - jnp.min(sample, axis=1))
    return margin * (num_triplets / (n * m))


def propose_margin(key, x, m_draw, num_triplets: int,
                   prp_distinct: bool = False, slot_offset: int = 0):
    """Margin proposals: uniform (u, i, j) filtered by the score window.

    ``prp_distinct=True`` draws the proposals as a keyed-PRP prefix over
    the full (u, i, j) domain (``sampling/prp.py``) starting at
    ``slot_offset`` — pairwise-distinct by bijectivity, so acceptance
    filtering is the ONLY selection left (no dedup hash table), and a
    continuation block at a later offset is disjoint from the main block
    (the test top-up's exclude semantics for free).  The margin sampler
    is uniform proposals + a data-dependent acceptance region D', so the
    accepted prefix is a uniform without-replacement stream of D' —
    the reference rejection loop's distribution
    (``generation_data.py:46-84``)."""
    n, m = x.shape
    margin = margin_window(x, num_triplets)
    if prp_distinct:
        from mfcd_tpu.sampling import prp as _prp

        idx = _prp.prp_indices(
            key, slot_offset + jnp.arange(m_draw, dtype=jnp.int32),
            _prp.prp_domain_size(n, m))
        cands = _prp.decode_random(idx, n, m)
        u, i, j = cands[:, 0], cands[:, 1], cands[:, 2]
        return cands, jnp.abs(x[u, i] - x[u, j]) <= margin  # i != j built in
    ku, ki, kj = jax.random.split(key, 3)
    u = jax.random.randint(ku, (m_draw,), 0, n)
    i = jax.random.randint(ki, (m_draw,), 0, m)
    j = jax.random.randint(kj, (m_draw,), 0, m)
    accept = jnp.abs(x[u, i] - x[u, j]) <= margin
    cands = jnp.stack([u, i, j], axis=1)
    return cands, (i != j) & accept


# === VARIANCE (reference ``generation_data.py:87-99``) ===================

def propose_variance(key, x, m_draw):
    n, m = x.shape
    variances = jnp.var(x, axis=0, ddof=1)  # torch.var default is unbiased
    probs = variances / jnp.sum(variances)
    cdf = jnp.cumsum(probs)
    ku, kij = jax.random.split(key)
    u = jax.random.randint(ku, (m_draw,), 0, n)
    i, j = _categorical_pair_from_cdf(kij, cdf, probs, m_draw)
    cands = jnp.stack([u, i, j], axis=1)
    return cands, i != j


# === POPULARITY (reference ``generation_data.py:103-128``) ===============

def popularity_probs(m: int, method: str = "zipf", alpha: float = 1.5):
    """Item-index popularity distribution.  NB the reference applies the
    law over raw item *indices*, not score ranks
    (``generation_data.py:111-117``) — preserved."""
    idx = jnp.arange(1, m + 1, dtype=jnp.float32)
    if method == "zipf":
        probs = 1.0 / idx**alpha
    elif method == "exponential":
        probs = jnp.exp(-alpha * (idx - 1.0))
    elif method == "uniform":
        probs = jnp.ones((m,), dtype=jnp.float32)
    else:
        raise ValueError(f"Unknown popularity method: {method}")
    return probs / jnp.sum(probs)


def propose_popularity(key, x, m_draw, method: str = "zipf", alpha: float = 1.5):
    n, m = x.shape
    probs = popularity_probs(m, method, alpha)
    cdf = jnp.cumsum(probs)
    ku, kij = jax.random.split(key)
    u = jax.random.randint(ku, (m_draw,), 0, n)
    i, j = _categorical_pair_from_cdf(kij, cdf, probs, m_draw)
    cands = jnp.stack([u, i, j], axis=1)
    return cands, i != j


# === TOP-K aka Top 10% (reference ``generation_data.py:189-224``) ========

def top_k_value(m: int) -> int:
    """k = min(m, max(5, 0.1 m)) (reference ``generation_data.py:199``)."""
    return min(m, max(5, int(0.1 * m)))


def estimate_k(num_triplets: int) -> int:
    """Smallest k whose top-k set yields >= num_triplets ordered-distinct
    pairs, k(k-1)/2 >= T (reference ``generation_data.py:186-187``; only
    referenced from a commented-out alternative there — kept for API
    completeness)."""
    import math

    return math.ceil((1 + math.sqrt(1 + 8 * num_triplets)) / 2)


def propose_top_k(key, x, m_draw, k: int | None = None):
    from mfcd_tpu.sampling.prp import topk_table

    n, m = x.shape
    top_idx = topk_table(x, k=k)
    kk = top_idx.shape[1]
    ku, kp = jax.random.split(key)
    u = jax.random.randint(ku, (m_draw,), 0, n)
    pa, pb = _distinct_pos(kp, m_draw, kk)
    i = top_idx[u, pa]
    j = top_idx[u, pb]
    cands = jnp.stack([u, i, j], axis=1)
    return cands, i != j


# === CLUSTER (reference ``generation_data.py:229-247``) ==================

def propose_cluster(key, x, m_draw, n_clusters: int = 10):
    """Items KMeans-clustered on their column vectors; i and j drawn from
    two distinct uniformly-chosen clusters."""
    n, m = x.shape
    kc, ku, kcl, kii, kjj = jax.random.split(key, 5)
    labels, _ = kmeans(kc, x.T, n_clusters)
    order = jnp.argsort(labels)                  # items grouped by cluster
    counts = jnp.bincount(labels, length=n_clusters)
    offsets = jnp.cumsum(counts) - counts

    u = jax.random.randint(ku, (m_draw,), 0, n)
    c1, c2 = _distinct_pos(kcl, m_draw, n_clusters)
    u1 = jax.random.uniform(kii, (m_draw,))
    u2 = jax.random.uniform(kjj, (m_draw,))
    i = order[offsets[c1] + jnp.floor(u1 * counts[c1]).astype(jnp.int32)]
    j = order[offsets[c2] + jnp.floor(u2 * counts[c2]).astype(jnp.int32)]
    valid = (counts[c1] > 0) & (counts[c2] > 0) & (i != j)
    cands = jnp.stack([u, i, j], axis=1)
    return cands, valid


# === SVD projection (reference ``generation_data.py:131-179``) ===========

def svd_rank(num_triplets: int, n: int, m: int) -> int:
    """Budget-derived rank, overriding the nominal ``rank`` argument
    (reference ``generation_data.py:144``)."""
    return max(1, int(num_triplets / (n * m) * max(n, m)))


def svd_tables(key, x, num_triplets: int, top_fraction: float = 0.3,
               budget=None):
    """Top-user / top-item index tables by latent-projection norm.

    ``num_triplets`` (static) sizes the truncated decomposition; the
    optional traced ``budget`` masks the active rank down to the exact
    budget's ``svd_rank`` so one compiled program serves a capacity
    bucket of sparsities (components beyond the exact rank are zeroed
    before the norm/top-fraction selection).  Shared by the overdraw
    proposal path and the PRP prefix path (``prp.decode_svd``)."""
    n, m = x.shape
    rank = min(svd_rank(num_triplets, n, m), min(n, m))
    # Truncated SVD via randomized subspace iteration (the reference uses
    # scipy's Lanczos svds, ``generation_data.py:149``); only the leading
    # ``rank`` projection norms matter for the top-fraction selection.
    q = min(rank + 8, min(n, m))
    u_full, s, vt = randomized_svd(x, q, key)
    if budget is None:
        rank_mask = jnp.ones((rank,), jnp.float32)
    else:
        # Integer arithmetic: T/(n*m)*max(n,m) == T/min(n,m) exactly, and
        # f32 rounding floors one short of the reference at exact-integer
        # boundaries (e.g. T=251000, n=m=1000: f32 gives 250, ref 251).
        rank_exact = jnp.asarray(budget, jnp.int32) // min(n, m)
        rank_exact = jnp.clip(rank_exact, 1, rank)
        rank_mask = (jnp.arange(rank) < rank_exact).astype(jnp.float32)
    u_proj = u_full[:, :rank] * (s[:rank] * rank_mask)[None, :]
    v_proj = vt[:rank, :].T * (s[:rank] * rank_mask)[None, :]
    user_norms = jnp.linalg.norm(u_proj, axis=1)
    item_norms = jnp.linalg.norm(v_proj, axis=1)
    from mfcd_tpu.sampling.prp import svd_dims

    # Single source of truth with the PRP gate's domain arithmetic
    # (prp.svd_prp_supported): a size drift between the two would make
    # the gate approve blocks against the wrong domain.
    num_top_users, num_top_items = svd_dims(n, m, top_fraction)
    _, top_users = jax.lax.top_k(user_norms, num_top_users)
    _, top_items = jax.lax.top_k(item_norms, num_top_items)
    return top_users.astype(jnp.int32), top_items.astype(jnp.int32)


def propose_svd(key, x, m_draw, num_triplets: int, top_fraction: float = 0.3,
                budget=None):
    """Overdraw proposals from the :func:`svd_tables` top sets."""
    n, m = x.shape
    kp, key = jax.random.split(key)
    top_users, top_items = svd_tables(
        kp, x, num_triplets, top_fraction=top_fraction, budget=budget)
    num_top_users, num_top_items = top_users.shape[0], top_items.shape[0]

    ku, kp = jax.random.split(key)
    u = top_users[jax.random.randint(ku, (m_draw,), 0, num_top_users)]
    pa, pb = _distinct_pos(kp, m_draw, num_top_items)
    i = top_items[pa]
    j = top_items[pb]
    cands = jnp.stack([u, i, j], axis=1)
    return cands, i != j


# === USER SIMILARITY (reference ``generation_data.py:251-338``) ==========

# Candidate rows per streamed chunk of the user_similarity sampler; the
# live top-set masks are [_US_CHUNK, m] (~40MB of bools at m=10k).
_US_CHUNK = 4096

def propose_user_similarity(key, x, m_draw, num_triplets: int):
    """Cosine-similar users' divergent top items.

    Per candidate: a random user u, one of its most-similar users v, then
    i uniform from top(u) \\ top(v) and j from top(v) \\ top(u), falling
    back to a distinct pair from top(u) when either difference is empty —
    the reference's per-neighbor scan collapsed to one sampled neighbor.
    """
    n, m = x.shape
    num_neighbors = min(20, max(3, num_triplets // n))
    top_k_items = max(3, min(m // 10, 10 + num_triplets // (5 * n)))
    top_k_items = min(top_k_items, m)

    norms = jnp.linalg.norm(x, axis=1, keepdims=True)
    xn = x / jnp.maximum(norms, 1e-12)
    sims = xn @ xn.T
    sims = sims - 2.0 * jnp.eye(n)  # exclude self (reference fills diag -1)
    _, neighbors = jax.lax.top_k(sims, num_neighbors)          # [n, nb]
    _, topk_idx = jax.lax.top_k(x, top_k_items)                # [n, tk]
    topk_mask = jnp.zeros((n, m), dtype=bool)
    topk_mask = topk_mask.at[
        jnp.arange(n)[:, None], topk_idx
    ].set(True)

    ku, kv, ki, kj, kf = jax.random.split(key, 5)
    u = jax.random.randint(ku, (m_draw,), 0, n)
    v = neighbors[u, jax.random.randint(kv, (m_draw,), 0, num_neighbors)]

    def masked_uniform(kk, mask):
        logits = jnp.where(mask, 0.0, -1e30)
        return jax.random.categorical(kk, logits, axis=-1).astype(jnp.int32)

    # The top-set membership masks are [chunk, m], not [M, m]: the M axis
    # is streamed through lax.map so live memory is O(chunk*m), which keeps
    # the sampler viable at 10k+ items (M can be millions of candidates).
    chunk = min(_US_CHUNK, m_draw)
    pad = (-m_draw) % chunk
    nchunks = (m_draw + pad) // chunk
    u_p = jnp.pad(u, (0, pad)) if pad else u
    v_p = jnp.pad(v, (0, pad)) if pad else v

    def body(args):
        kki, kkj, u_c, v_c = args
        mask_u = topk_mask[u_c]                                # [chunk, m]
        mask_v = topk_mask[v_c]
        only_u = mask_u & ~mask_v
        only_v = mask_v & ~mask_u
        have = jnp.any(only_u, axis=1) & jnp.any(only_v, axis=1)
        return masked_uniform(kki, only_u), masked_uniform(kkj, only_v), have

    i_diff, j_diff, have_diff = jax.lax.map(
        body,
        (jax.random.split(ki, nchunks), jax.random.split(kj, nchunks),
         u_p.reshape(nchunks, chunk), v_p.reshape(nchunks, chunk)))
    i_diff = i_diff.reshape(-1)[:m_draw]
    j_diff = j_diff.reshape(-1)[:m_draw]
    have_diff = have_diff.reshape(-1)[:m_draw]
    # Fallback: distinct pair from top(u).
    pa, pb = _distinct_pos(kf, m_draw, top_k_items)
    i_fb = topk_idx[u, pa]
    j_fb = topk_idx[u, pb]
    i = jnp.where(have_diff, i_diff, i_fb)
    j = jnp.where(have_diff, j_diff, j_fb)
    cands = jnp.stack([u, i, j], axis=1)
    return cands, i != j


# === Overdraw planning (host-side, static) ================================

def _expected_unique_inverse(target: int, population: float) -> float:
    frac = min(target / max(population, 1.0), 0.999)
    return -max(population, 1.0) * math.log1p(-frac)


def plan_overdraw(
    strategy: str,
    num_triplets: int,
    n: int,
    m: int,
    popularity_method: str = "zipf",
    alpha: float = 1.5,
) -> int:
    """Static proposal count M for a strategy/budget/shape combination.

    Caps reproduce the reference's attempt limits where it has them:
    margin 5e6 (``generation_data.py:46``), top_k 3x (``:205``),
    svd 5x (``:167``).
    """
    t = num_triplets

    def generic(population, p_valid=1.0, safety=1.3, cap=None):
        mm = _expected_unique_inverse(t, population) / max(p_valid, 1e-6)
        mm = int(math.ceil(mm * safety)) + 512
        mm = max(mm, t)
        return min(mm, cap) if cap else mm

    if strategy == "random":
        return generic(n * m * (m - 1), p_valid=(m - 1) / m)
    if strategy == "proximity":
        k = min(100, m)
        return generic(n * k * k, safety=1.5)
    if strategy == "margin":
        # Acceptance rate is roughly proportional to T/(n*m); the required
        # M is therefore O(n*m) regardless of T (see margin analysis).
        return min(5_000_000, max(4 * t, (n * m) // 2 + 4 * t))
    if strategy == "variance":
        return generic(n * m * (m - 1) / 4.0, safety=1.6)
    if strategy == "popularity":
        import numpy as np

        idx = np.arange(1, m + 1, dtype=np.float64)
        if popularity_method == "zipf":
            p = 1.0 / idx**alpha
        elif popularity_method == "exponential":
            p = np.exp(-alpha * (idx - 1.0))
        else:
            p = np.ones(m)
        p /= p.sum()
        eff_items = 1.0 / float((p**2).sum())  # inverse Simpson index
        population = n * eff_items * max(eff_items - 1.0, 1.0)
        return generic(population, safety=2.0, cap=20_000_000)
    if strategy == "top_k":
        return 3 * t  # reference over-generation cap
    if strategy == "cluster":
        c = 10
        return generic(n * m * m * (1.0 - 1.0 / c) / 2.0, safety=1.5)
    if strategy == "user_similarity":
        # The proposal is a mixture of concentrated difference-set draws
        # (~68% at the canonical n=m=1000, T=1e5 config) and top(u)
        # distinct-pair fallbacks over an ~n*tk*(tk-1) pool; measured
        # unique yield at that config is ~69k/2T, ~124k/4T, so 5T fills
        # the 100k budget with ~45% margin (NOTES_ROUND4.md).  The
        # reference's own sampler caps at 10k attempts total
        # (generation_data.py:251-295) and returns <=10% of this budget.
        return max(5 * t, 10_000)
    if strategy == "svd":
        return 5 * t  # reference over-generation cap
    raise ValueError(f"Unknown triplet sampling strategy: {strategy}")
