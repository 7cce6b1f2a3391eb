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

# Element budget for the per-rank [blk, tk, tk] equality tensors; the
# attempt axis is processed in BLOCKS whose sequential loop EARLY-EXITS
# once the triplet budget is filled (exact: cascade wins for attempt a
# depend only on attempts < a, so skipped trailing blocks cannot change
# the accepted prefix).  _US_BLOCK_MIN floors the block size so the
# block count stays bounded for huge tk.  At the canonical n=m=1000
# config (tk=30) blocks are 4,096 attempts: the on-chip block-size sweep
# (docs/device_r5/us_blocksize.json) measured 0.299 s at blk=4096 vs
# 0.421 s at blk=32768 — the early-exit overshoot (ceil(budget/blk)*blk
# attempts processed) dominates, and per-block loop overhead only starts
# to bite below ~4k.
_US_BLOCK_ELEMS = 4096 * 30 * 30
_US_BLOCK_MIN = 1024

def propose_user_similarity(key, x, m_draw, num_triplets: int,
                            exclude=None, exclude_valid=None):
    """Cosine-similar users' divergent top items, with the reference's
    per-attempt neighbor CASCADE resolved in-sampler.

    The reference (``generation_data.py:294-316``) walks each attempt's
    neighbor list in DESCENDING similarity order and accepts the first
    candidate not already in the triplet set: for neighbor v, i uniform
    from top(u) \\ top(v) and j from top(v) \\ top(u) when both are
    non-empty, else a distinct pair from top(u); a duplicate moves on to
    the next neighbor with fresh randomness.  The accepted mixture is
    therefore rank-1-dominated early and shifts to deeper ranks as the
    shallow ranks' supports exhaust — a uniformly-sampled neighbor (the
    pre-round-4 design) is a measurably different mixture (P12 high-rep
    parity caught it at r=100: Welch z=4.08 on alpha).

    This sampler generates a candidate per (attempt, rank) — ``m_draw``
    counts ATTEMPTS — and resolves the cascade to the exact sequential
    fixpoint (:func:`_cascade_fixpoint`, oracle-pinned via
    :func:`cascade_resolve`).  Returned rows are each attempt's accepted
    candidate (already globally unique and exclude-free), so the
    downstream dedup pass is an order-preserving no-op.  ``exclude``
    pre-seeds the cascade's hash table so an excluded candidate CASCADES
    to the next neighbor exactly like the reference's
    ``t not in exclude`` check (``generation_data.py:313``) — this
    matters for the 500-label test top-up, where at small p the top-up
    dominates the test split and an attempt-killing exclude would skew
    it toward shallow-rank (similar-neighbor, close-call) triplets
    (caught by the P12 r=100 certificate: gt_accuracy z=4.6 low before
    this).

    Attempts are processed in BLOCKS (``_US_BLOCK_ELEMS``) in attempt
    order, threading the accepted-key hash table between blocks, and the
    block loop EARLY-EXITS once ``num_triplets`` attempts have resolved.
    This is exact, not approximate: the sequential semantics give attempt
    a's outcome in terms of attempts < a only, so trailing blocks can
    neither steal nor add wins inside the accepted prefix the budget
    keeps (on-chip at the canonical config ~100% of attempts resolve, so
    roughly half the 2x-overdraw attempt stream is never materialized).
    Single-block shapes (every parity/test point) take the direct path,
    whose RNG stream matches the pre-blocking design.
    """
    n, m = x.shape
    num_neighbors = min(20, max(3, num_triplets // n))
    num_neighbors = min(num_neighbors, n - 1)
    top_k_items = max(3, min(m // 10, 10 + num_triplets // (5 * n)))
    top_k_items = min(top_k_items, m)

    norms = jnp.linalg.norm(x, axis=1, keepdims=True)
    xn = x / jnp.maximum(norms, 1e-12)
    sims = xn @ xn.T
    sims = sims - 2.0 * jnp.eye(n)  # exclude self (reference fills diag -1)
    _, neighbors = jax.lax.top_k(sims, num_neighbors)          # [n, nb]
    _, topk_idx = jax.lax.top_k(x, top_k_items)                # [n, tk]

    ku, kc = jax.random.split(key)
    a = m_draw  # attempts
    u = jax.random.randint(ku, (a,), 0, n)

    def masked_uniform_pos(kk, mask):
        """Uniform position among the True entries of ``mask`` [rows, tk]."""
        logits = jnp.where(mask, 0.0, -1e30)
        return jax.random.categorical(kk, logits, axis=-1).astype(jnp.int32)

    # Candidate generation: [nb, blk] per-rank i/j, entirely in TOP-SET
    # INDEX space.  top(u) \ top(v) is enumerated as "positions of tk_u
    # whose item is not a member of top(v)" via a [rows, tk, tk] equality
    # compare — regular VPU compare work; the gather-based formulation it
    # replaces ran the membership bits on the TPU's scalar gather path
    # (4.05 s vs 0.67 s for the candidate stage at the canonical config,
    # docs/device_r5/user_similarity_split.json, cand_masks_identical:
    # true).  Uniform over positions == uniform over the difference set
    # because tk_u enumerates top(u) exactly, so the accepted mixture is
    # unchanged.  The rank axis is streamed through lax.map.
    def block_candidates(kk_b, u_c):
        tk_u = topk_idx[u_c]                                   # [blk, tk]

        def rank_body(rargs):
            kk_r, r = rargs
            kki, kkj, kkf = jax.random.split(kk_r, 3)
            v_c = neighbors[u_c, r]                            # [blk]
            tk_v = topk_idx[v_c]                               # [blk, tk]
            eq = tk_u[:, :, None] == tk_v[:, None, :]          # [blk,tk,tk]
            only_u = ~jnp.any(eq, axis=2)                      # [blk, tk]
            only_v = ~jnp.any(eq, axis=1)
            have = jnp.any(only_u, axis=1) & jnp.any(only_v, axis=1)
            pi = masked_uniform_pos(kki, only_u)
            pj = masked_uniform_pos(kkj, only_v)
            i_diff = jnp.take_along_axis(tk_u, pi[:, None], axis=1)[:, 0]
            j_diff = jnp.take_along_axis(tk_v, pj[:, None], axis=1)[:, 0]
            pa, pb = _distinct_pos(kkf, u_c.shape[0], top_k_items)
            i_fb = jnp.take_along_axis(tk_u, pa[:, None], axis=1)[:, 0]
            j_fb = jnp.take_along_axis(tk_u, pb[:, None], axis=1)[:, 0]
            i_r = jnp.where(have, i_diff, i_fb)
            j_r = jnp.where(have, j_diff, j_fb)
            return i_r, j_r

        return jax.lax.map(
            rank_body,
            (jax.random.split(kk_b, num_neighbors),
             jnp.arange(num_neighbors, dtype=jnp.int32)))

    blk = min(a, max(_US_BLOCK_MIN,
                     _US_BLOCK_ELEMS // max(top_k_items * top_k_items, 1)))
    pad = (-a) % blk
    nblk = (a + pad) // blk

    if nblk == 1:
        # Direct path (every parity/test point): RNG stream identical to
        # the pre-blocking design.
        i_all, j_all = block_candidates(kc, u)                 # [nb, A]
        wins = cascade_resolve(u, i_all, j_all, m,
                               exclude=exclude, exclude_valid=exclude_valid)
        resolved = jnp.any(wins, axis=0)
        # Each attempt's accepted candidate (rank where win fired; <=1
        # per attempt by the participation gating).
        i = jnp.sum(jnp.where(wins, i_all, 0), axis=0).astype(jnp.int32)
        j = jnp.sum(jnp.where(wins, j_all, 0), axis=0).astype(jnp.int32)
        return jnp.stack([u, i, j], axis=1), resolved

    # Blocked path with budget early-exit.  The accepted-key table is
    # threaded between blocks (winners' tags only — matching the
    # reference's seen-set, which grows by ACCEPTED triplets); tags stay
    # globally attempt-major so the per-block fixpoints compose to
    # exactly the full sequential solution (later tags can never displace
    # an earlier block's winner).
    nb = num_neighbors
    u_p = jnp.pad(u, (0, pad)) if pad else u
    bkeys = jax.random.split(kc, nblk)
    ex_rows = 0 if exclude is None else int(exclude.shape[0])
    bits = _cascade_bits(a, ex_rows)
    h = 1 << bits
    table0 = _cascade_base_table(
        h, bits, exclude=exclude, exclude_valid=exclude_valid)
    arange_blk = jnp.arange(blk, dtype=jnp.int32)
    tags_local = (arange_blk[None, :] * nb
                  + jnp.arange(nb, dtype=jnp.int32)[:, None])

    def cond(carry):
        _, _, _, _, wins_n, k = carry
        return (k < nblk) & (wins_n < num_triplets)

    def body(carry):
        table, i_out, j_out, res_out, wins_n, k = carry
        u_blk = jax.lax.dynamic_slice(u_p, (k * blk,), (blk,))
        i_all, j_all = block_candidates(bkeys[k], u_blk)       # [nb, blk]
        in_range = (k * blk + arange_blk) < a                  # kill pad rows
        valid = (i_all != j_all) & in_range[None, :]
        slot_all = _cascade_slot(u_blk[None, :], i_all, j_all, bits)
        tags = tags_local + k * (blk * nb)
        win, table = _cascade_fixpoint(
            slot_all, valid, tags, table, h, cap=blk)
        res = jnp.any(win, axis=0)
        i_b = jnp.sum(jnp.where(win, i_all, 0), axis=0).astype(jnp.int32)
        j_b = jnp.sum(jnp.where(win, j_all, 0), axis=0).astype(jnp.int32)
        i_out = jax.lax.dynamic_update_slice(i_out, i_b, (k * blk,))
        j_out = jax.lax.dynamic_update_slice(j_out, j_b, (k * blk,))
        res_out = jax.lax.dynamic_update_slice(res_out, res, (k * blk,))
        return (table, i_out, j_out, res_out,
                wins_n + jnp.sum(res, dtype=jnp.int32), k + 1)

    p_total = nblk * blk
    _, i_out, j_out, res_out, _, _ = jax.lax.while_loop(
        cond, body,
        (table0, jnp.zeros((p_total,), jnp.int32),
         jnp.zeros((p_total,), jnp.int32), jnp.zeros((p_total,), bool),
         jnp.int32(0), jnp.int32(0)))
    cands = jnp.stack([u, i_out[:a], j_out[:a]], axis=1)
    return cands, res_out[:a]


def cascade_resolve(u, i_all, j_all, m: int,
                    exclude=None, exclude_valid=None, max_passes=None):
    """Resolve the neighbor cascade exactly as the reference's sequential
    loop would: for each attempt in order, the FIRST rank whose (u, i, j)
    is not already accepted wins (``generation_data.py:294-316``).

    ``u`` is [A]; ``i_all``/``j_all`` are [nb, A] per-rank candidates.
    Returns a [nb, A] win mask with at most one True per attempt.

    The sequential semantics are the fixpoint of two coupled conditions
    under ATTEMPT-major order tags ``tag(a, r) = a * nb + r`` (attempt
    a's whole cascade runs before attempt a+1 starts):

      participate(a, r)  <=>  no win(a, r') for r' < r
      win(a, r)          <=>  participate(a, r) and tag(a, r) is the
                              minimum tag among participating candidates
                              with the same key

    Iterating (participation -> scatter-min table -> wins) from
    all-participate and LOOPING UNTIL STABLE converges to exactly that
    fixpoint: an attempt's wins depend only on smaller tags, so once
    attempts < k hold their sequential values one more pass fixes
    attempt k — the frontier advances at least one attempt per pass and
    the stable point is the sequential solution.  A fixed pass count is
    NOT enough: duplicate-overlap CHAINS (attempt k's rank-1 key ==
    attempt k+1's rank-0 key, repeated) propagate corrections only one
    attempt per pass, so the loop runs data-dependently (typically 2-5
    passes; bounded by A).  ``tests/test_sampling.py`` pins equality
    with a sequential oracle, including adversarial chains and exclude
    sets.

    Key identity is approximated by a 32-bit mixed hash of (u, i, j)
    (never unpacked — no n*m*m packing overflow at any scale); distinct
    keys colliding lose their slot, the same documented uniform thinning
    as ``dedup._hashed_winners``, absorbed by the attempt margin.  The
    table is sized by attempts + exclude rows so a large exclude set
    (the 500-label test top-up excludes the whole main draw) cannot
    poison a meaningful slot fraction.  Exclude entries pre-seed the
    table ONCE (tag -1, always winning their slot): an excluded
    candidate cascades to the attempt's next neighbor, mirroring the
    reference's ``t not in exclude`` check.
    """
    nb, a = i_all.shape
    valid = i_all != j_all
    ex_rows = 0 if exclude is None else int(exclude.shape[0])
    bits = _cascade_bits(a, ex_rows)
    h = 1 << bits

    slot_all = _cascade_slot(u[None, :], i_all, j_all, bits)
    tags = (jnp.arange(a, dtype=jnp.int32)[None, :] * nb
            + jnp.arange(nb, dtype=jnp.int32)[:, None])
    base_table = _cascade_base_table(
        h, bits, exclude=exclude, exclude_valid=exclude_valid)
    cap = a if max_passes is None else max_passes
    win, _ = _cascade_fixpoint(slot_all, valid, tags, base_table, h, cap)
    return win


def _cascade_bits(attempts: int, ex_rows: int) -> int:
    """Hash-table size exponent: 16x-load over attempts + exclude rows."""
    return min(max((16 * (attempts + ex_rows) - 1).bit_length(), 20), 25)


def _cascade_slot(uu, ii, jj, bits: int):
    # Multiplicative mix of the triple; only the slot is ever used,
    # so 32-bit wraparound is part of the hash, not an overflow bug.
    s = uu.astype(jnp.uint32) * jnp.uint32(2654435761)
    s = (s ^ ii.astype(jnp.uint32)) * jnp.uint32(2246822519)
    s = (s ^ jj.astype(jnp.uint32)) * jnp.uint32(3266489917)
    return (s >> jnp.uint32(32 - bits)).astype(jnp.int32)


def _cascade_base_table(h: int, bits: int, exclude=None, exclude_valid=None):
    """Fresh table (int32 max sentinel) with exclude keys seeded at -1."""
    base_table = jnp.full((h,), jnp.iinfo(jnp.int32).max, jnp.int32)
    if exclude is not None:
        ex = exclude.astype(jnp.int32)
        ex_slot = _cascade_slot(ex[:, 0], ex[:, 1], ex[:, 2], bits)
        if exclude_valid is not None:
            ex_slot = jnp.where(exclude_valid, ex_slot, h)
        base_table = base_table.at[ex_slot].min(jnp.int32(-1), mode="drop")
    return base_table


def _cascade_any_earlier(win):
    # "Some rank r' < r of the same attempt won": exclusive or-scan
    # down the rank axis.  associative_scan lowers to log2(nb)
    # shifted ORs — NOT the reduce_window a cumsum becomes, which
    # XLA's constant folder ground through at [nb, A] x vmap scale
    # (>1 s/instance alarms in the round-4 dryrun).
    inc = jax.lax.associative_scan(jnp.logical_or, win, axis=0)
    return jnp.concatenate([jnp.zeros_like(win[:1]), inc[:-1]], axis=0)


def _cascade_fixpoint(slot_all, valid, tags, base_table, h: int, cap):
    """Iterate (participation -> scatter-min -> wins) until stable.

    Returns ``(win, table_out)`` where ``table_out`` is ``base_table``
    min-merged with the WINNERS' tags only — the accepted-key set, which
    is what the next block of a blocked resolve (or nothing, for the
    single-shot :func:`cascade_resolve`) must see.  Non-winning
    participants never enter ``table_out``: in the reference's loop only
    accepted triplets join the seen set.
    """
    nb = slot_all.shape[0]

    def one_pass(win):
        participate = valid & ~_cascade_any_earlier(win)
        slot = jnp.where(participate, slot_all, h)
        table = base_table.at[slot.reshape(-1)].min(
            tags.reshape(-1), mode="drop")
        return participate & (table[jnp.minimum(slot, h - 1)] == tags)

    def cond(carry):
        prev, cur, it = carry
        return jnp.any(prev != cur) & (it < cap)

    def body(carry):
        _, cur, it = carry
        return cur, one_pass(cur), it + 1

    # The first pass runs INSIDE the loop (all-True prev forces one
    # iteration): hoisted out, one_pass(zeros) is a compile-time constant
    # and XLA's constant folder executes the whole pass per vmap element
    # at compile time (the round-4 compile-cliff signature).
    win0 = jnp.zeros(slot_all.shape, bool)
    _, win, _ = jax.lax.while_loop(
        cond, body, (jnp.ones(slot_all.shape, bool), win0, jnp.int32(0)))
    # Keep only each attempt's first win (the fixpoint's participation
    # rule; a no-op once converged — pure safety under the pass cap).
    win = win & ~_cascade_any_earlier(win)
    slot_w = jnp.where(win, slot_all, h)
    table_out = base_table.at[slot_w.reshape(-1)].min(
        tags.reshape(-1), mode="drop")
    del nb
    return win, table_out


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
        # ``m_draw`` counts ATTEMPTS (the cascade sampler generates one
        # candidate per neighbor rank per attempt internally).  Each
        # attempt gets up to num_neighbors (<=20) chances at a fresh
        # triplet — per-attempt success stays near 1 until the strategy's
        # support is nearly exhausted (the per-rank fallback pool alone
        # spans ~n*tk*(tk-1) ~ 824k at the canonical config).  The plan
        # is 3T attempts, but the blocked resolver EARLY-EXITS at the
        # budget, so the extra margin costs nothing when per-attempt
        # success is high (the common case: ~budget/blk blocks run) and
        # only executes on genuine support exhaustion (observed: a d=2
        # production X filled 98.8% at a 2T plan — rank-2 user rows make
        # neighbor top-sets nearly identical, shrinking the difference
        # sets).  The reference's own sampler caps at 10k attempts total
        # (generation_data.py:251-295) and returns <=10% of this budget
        # with the same shortfall warning downstream.
        return max(3 * t, 10_000)
    if strategy == "svd":
        return 5 * t  # reference over-generation cap
    raise ValueError(f"Unknown triplet sampling strategy: {strategy}")
