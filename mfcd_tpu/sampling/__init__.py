"""Triplet sampling — jittable ``sample_triplets`` dispatch.

TPU-native capability match for ``get_triplets_from_X`` (reference
``structure.py:533-588``): unique (u, i, j) triplets with i != j, exclude-set
support, and graceful shortfall via validity counts instead of warnings-only.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax

from mfcd_tpu.sampling.dedup import (  # noqa: F401
    SplitArrays,
    TripletSet,
    first_occurrence_winners,
    overdraw_size,
    select_unique,
    split_triplets,
    winners_to_splits,
)
from mfcd_tpu.sampling import prp, strategies
from mfcd_tpu.sampling.strategies import plan_overdraw  # noqa: F401

STRATEGIES = (
    "random", "proximity", "margin", "variance", "popularity",
    "top_k", "cluster", "user_similarity", "svd",
)


@partial(
    jax.jit,
    static_argnames=(
        "num_triplets", "strategy", "m_draw", "popularity_method",
        "alpha", "n_clusters",
    ),
)
def sample_triplets(
    key: jax.Array,
    x: jax.Array,
    num_triplets: int,
    strategy: str = "random",
    exclude: Optional[jax.Array] = None,
    exclude_valid: Optional[jax.Array] = None,
    m_draw: Optional[int] = None,
    popularity_method: str = "zipf",
    alpha: float = 1.5,
    n_clusters: int = 10,
    budget=None,
) -> TripletSet:
    """Sample ``num_triplets`` unique (u, i, j) comparisons from X.

    Returns a :class:`TripletSet` whose ``count`` may fall short of the
    budget for constrained strategies, mirroring the reference's shortfall
    warnings (``generation_data.py:81-82,176-177,221-222``).

    ``alpha`` enters the overdraw plan only for ``popularity``, so it stays a
    static argument here; per-candidate numerics treat it as a constant too
    (it's baked into the probs).  All other numeric inputs may be traced.

    ``budget`` (traced, optional) carries the exact target when
    ``num_triplets`` is a rounded-up *capacity* shared across a compile
    bucket: proposal shapes and the overdraw plan key on the capacity,
    while the kept-triplet count, the margin acceptance window, and the
    svd projection rank honor the exact budget.  ``user_similarity``'s
    neighbor/top-set sizes stay capacity-derived (static shapes).
    """
    n, m = x.shape
    if exclude is None:
        # Uniform without-replacement directly: a PRP prefix over the
        # strategy's proposal domain (sampling/prp.py) — no overdraw, no
        # dedup, count always == budget.
        import jax.numpy as jnp

        dom = prp.uniform_domain(strategy, x, num_triplets, key=key,
                                 svd_num_triplets=num_triplets,
                                 svd_budget=budget)
        if dom is not None:
            dom_sz, decode, key = dom
            tri = decode(prp.prp_indices(
                key, jnp.arange(num_triplets, dtype=jnp.int32), dom_sz))
            eff = num_triplets if budget is None else budget
            return TripletSet(tri, jnp.asarray(eff, jnp.int32))
        if strategy == "margin":
            # PRP-distinct proposals: acceptance filtering is the only
            # selection left — no dedup pass at all.
            md = m_draw if m_draw is not None else plan_overdraw(
                "margin", num_triplets, n, m)
            if prp.prp_supported(n, m, md):
                from mfcd_tpu.sampling.dedup import _compact

                eff = num_triplets if budget is None else budget
                cands, accept = strategies.propose_margin(
                    key, x, md, eff, prp_distinct=True)
                return _compact(cands, accept, num_triplets, budget=budget)
    cands, valid = propose_candidates(
        key, x, num_triplets, strategy,
        m_draw=m_draw, popularity_method=popularity_method, alpha=alpha,
        n_clusters=n_clusters, budget=budget,
        exclude=exclude, exclude_valid=exclude_valid,
    )
    return select_unique(
        cands, valid, num_triplets,
        exclude=exclude, exclude_valid=exclude_valid, nm_shape=(n, m),
        budget=budget,
    )


def propose_candidates(
    key: jax.Array,
    x: jax.Array,
    num_triplets: int,
    strategy: str,
    m_draw: Optional[int] = None,
    popularity_method: str = "zipf",
    alpha: float = 1.5,
    n_clusters: int = 10,
    budget=None,
    exclude: Optional[jax.Array] = None,
    exclude_valid: Optional[jax.Array] = None,
):
    """Strategy dispatch: overdrawn proposals ``(cands [M, 3], valid [M])``.

    The proposal half of :func:`sample_triplets`; draw order is the
    reference's insertion order (first-occurrence winners in draw order
    reproduce the rejection loop's dataset order).  ``exclude`` is only
    consumed by ``user_similarity``, whose in-sampler cascade must treat
    excluded keys as duplicates (cascade to the next neighbor) rather
    than leaving them to the downstream dedup (which would kill the
    attempt); every other strategy ignores it here and relies on the
    downstream exclude pass.
    """
    n, m = x.shape
    eff_budget = num_triplets if budget is None else budget
    if m_draw is None:
        m_draw = plan_overdraw(
            strategy, num_triplets, n, m,
            popularity_method=popularity_method, alpha=alpha,
        )

    if strategy == "random":
        cands, valid = strategies.propose_random(key, x, m_draw)
    elif strategy == "proximity":
        cands, valid = strategies.propose_proximity(key, x, m_draw)
    elif strategy == "margin":
        cands, valid = strategies.propose_margin(
            key, x, m_draw, num_triplets=eff_budget)
    elif strategy == "variance":
        cands, valid = strategies.propose_variance(key, x, m_draw)
    elif strategy == "popularity":
        cands, valid = strategies.propose_popularity(
            key, x, m_draw, method=popularity_method, alpha=alpha)
    elif strategy == "top_k":
        cands, valid = strategies.propose_top_k(key, x, m_draw)
    elif strategy == "cluster":
        cands, valid = strategies.propose_cluster(
            key, x, m_draw, n_clusters=n_clusters)
    elif strategy == "user_similarity":
        cands, valid = strategies.propose_user_similarity(
            key, x, m_draw, num_triplets=num_triplets,
            exclude=exclude, exclude_valid=exclude_valid)
    elif strategy == "svd":
        cands, valid = strategies.propose_svd(
            key, x, m_draw, num_triplets=num_triplets, budget=budget)
    else:
        raise ValueError(f"Unknown triplet sampling strategy: {strategy}")

    return cands, valid
