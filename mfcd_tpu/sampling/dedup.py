"""Fixed-shape unique-triplet selection and masked splits.

The reference's samplers are python ``while`` loops inserting ``(u, i, j)``
tuples into a ``set`` until the budget is met (e.g. ``generation_data.py:
16-26``), with ``exclude``-set support used by the test-set top-up
(``structure.py:721-730``).  Dynamic set growth cannot be traced, so the
TPU design draws a static overdraw of candidates and recovers *exactly* the
sequential-rejection semantics with a sort:

1. candidates are tagged with their draw order,
2. a lexsort over (u, i, j, order) groups duplicates into runs with the
   earliest draw (or an exclude entry, tagged order -1) at the head,
3. only run heads that are valid candidates are kept — i.e. the first
   occurrence of each triplet, never anything in the exclude set,
4. kept rows are compacted (in draw order) into the first ``target`` slots.

The result ``(triplets [target, 3], count)`` matches what the reference's
rejection loop would produce in distribution: the first ``target`` distinct
valid triplets in draw order.  ``count < target`` encodes the reference's
shortfall path (``generation_data.py:81-82, 176-177, 221-222``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# Shared capacity/padding bucket helper (re-exported for existing
# importers: the engine and batched sweep pull it from here).
from mfcd_tpu.core.config import _next_pow2  # noqa: F401

# Sentinel pushing invalid rows past every real (u, i, j) in the sort.
# Plain int (not a jnp scalar): creating a device array at import time
# would initialize the XLA backend, which breaks jax.distributed.initialize
# for multi-host users importing this package first.
_SENT = 2**30


class TripletSet(NamedTuple):
    """A compacted unique triplet sample: rows [T, 3]; first ``count`` valid."""

    triplets: jax.Array  # [T, 3] int32
    count: jax.Array     # scalar int32

    @property
    def valid(self) -> jax.Array:
        return jnp.arange(self.triplets.shape[0]) < self.count




def select_unique(
    cands: jax.Array,
    valid: jax.Array,
    target: int,
    exclude: Optional[jax.Array] = None,
    exclude_valid: Optional[jax.Array] = None,
    nm_shape: Optional[tuple] = None,
    method: str = "auto",
    budget=None,
) -> TripletSet:
    """First-occurrence selection of unique valid triplets.

    Args:
      cands: [M, 3] int32 proposals in draw order.
      valid: [M] bool per-proposal validity (i != j, strategy acceptance...).
      target: static output size T (the array capacity).
      budget: optional *traced* scalar exact target <= ``target``.  When
        given, only the first ``budget`` unique triplets count as valid
        (``count <= budget``) while arrays keep the static ``target``
        capacity — this lets one compiled program serve every sparsity
        value in a capacity bucket.  Defaults to ``target``.
      exclude: optional [E, 3] forbidden triplets (the reference's
        ``exclude`` set), with optional [E] mask ``exclude_valid``.
      nm_shape: optional static (n, m).  When ``n*m*m < 2^31`` the triplet
        packs into one int32, enabling the fast paths.
      method: "hash" (default when packable) — exact-uniqueness scatter-min
        winner selection on a hash table; a ~M/H fraction of *distinct*
        candidates is dropped by slot collisions (uniform thinning of the
        overdraw, covered by its safety margin), but duplicates can never
        both survive.  Compiles in seconds where TPU sorts take minutes.
        "sort" — exact sequential-rejection semantics via one stable sort.
        "auto" — hash when packable, sort otherwise.
    """
    keep = first_occurrence_winners(
        cands, valid, exclude=exclude, exclude_valid=exclude_valid,
        nm_shape=nm_shape, method=method)
    return _compact(cands, keep, target, budget=budget)


def first_occurrence_winners(
    cands: jax.Array,
    valid: jax.Array,
    *,
    exclude: Optional[jax.Array] = None,
    exclude_valid: Optional[jax.Array] = None,
    nm_shape: Optional[tuple] = None,
    method: str = "auto",
) -> jax.Array:
    """[M] mask of first-occurrence unique valid candidates, in place.

    The winner-selection half of :func:`select_unique` (hash or sort),
    without the compaction — callers that consume winners positionally
    (e.g. the fused dataset split) skip the compaction scatter entirely.
    """
    m_cand = cands.shape[0]
    packed_ok = (
        nm_shape is not None
        and int(nm_shape[0]) * int(nm_shape[1]) * int(nm_shape[1]) < 2**31
    )
    if method == "auto":
        method = "hash" if packed_ok else "sort"
    if method == "hash" and not packed_ok:
        raise ValueError("hash dedup requires packable (n, m)")

    if method == "hash":
        return _hashed_winners(
            cands, valid, exclude, exclude_valid, nm_shape)

    rows = jnp.where(valid[:, None], cands.astype(jnp.int32), _SENT)
    order = jnp.arange(m_cand, dtype=jnp.int32)
    is_cand = jnp.ones((m_cand,), dtype=bool)

    if exclude is not None:
        ex = exclude.astype(jnp.int32)
        if exclude_valid is not None:
            ex = jnp.where(exclude_valid[:, None], ex, _SENT)
        # Exclude rows go FIRST so a stable sort puts them at each run head.
        rows = jnp.concatenate([ex, rows], axis=0)
        order = jnp.concatenate(
            [jnp.full((ex.shape[0],), -1, dtype=jnp.int32), order]
        )
        is_cand = jnp.concatenate(
            [jnp.zeros((ex.shape[0],), dtype=bool), is_cand]
        )
        valid = jnp.concatenate(
            [jnp.zeros((ex.shape[0],), dtype=bool), valid]
        )

    if packed_ok:
        n, m = int(nm_shape[0]), int(nm_shape[1])
        sent_mask = rows[:, 0] >= _SENT
        packed = (rows[:, 0] * m + rows[:, 1]) * m + rows[:, 2]
        packed = jnp.where(sent_mask, jnp.int32(2**31 - 1), packed)
        # Stable: equal keys keep array order = exclude first, then draws.
        sort_idx = jnp.argsort(packed, stable=True)
        spacked = packed[sort_idx]
        run_head = jnp.concatenate(
            [jnp.ones((1,), dtype=bool), spacked[1:] != spacked[:-1]]
        )
    else:
        # Primary key u, then i, j, then draw order (exclude rows in-run
        # first via order = -1).
        sort_idx = jnp.lexsort((order, rows[:, 2], rows[:, 1], rows[:, 0]))
        srows = rows[sort_idx]
        run_head = jnp.concatenate(
            [
                jnp.ones((1,), dtype=bool),
                jnp.any(srows[1:] != srows[:-1], axis=1),
            ]
        )
    keep_sorted = run_head & is_cand[sort_idx] & valid[sort_idx]

    # Back to draw order.
    keep = jnp.zeros(rows.shape[0], dtype=bool).at[sort_idx].set(keep_sorted)
    return keep[-m_cand:]


def _compact(
    cands: jax.Array, keep: jax.Array, target: int, budget=None
) -> TripletSet:
    """Scatter kept rows (in draw order) into the first slots.

    ``budget`` (traced, defaults to ``target``) caps the number of kept
    rows below the static capacity so bucketed programs honor each
    configuration's exact triplet target.
    """
    if budget is None:
        budget = target
    pos = jnp.cumsum(keep) - 1
    count = jnp.minimum(jnp.sum(keep), budget).astype(jnp.int32)
    scatter_to = jnp.where(keep & (pos < budget), pos, target)
    out = jnp.zeros((target, 3), dtype=jnp.int32).at[scatter_to].set(
        cands.astype(jnp.int32), mode="drop"
    )
    return TripletSet(out, count)


def _hashed_winners(
    cands, valid, exclude, exclude_valid, nm_shape
) -> jax.Array:
    """Exact-uniqueness winner selection via scatter-min on a hash table.

    Every triplet hashes to one slot; scatter-min of the draw order makes
    the earliest occupant the slot's winner.  Duplicate triplets share a
    slot, so at most one survives (exact uniqueness, first-occurrence).
    Exclude entries carry order -1 and always win their slot, vetoing any
    candidate equal to them.  Distinct triplets that collide lose a slot
    too — a uniform ~M/H thinning absorbed by the overdraw margin — which
    is the one (documented) divergence from sequential-rejection sampling.
    """
    m_cand = cands.shape[0]
    n, m = int(nm_shape[0]), int(nm_shape[1])
    packed = (
        (cands[:, 0].astype(jnp.int32) * m + cands[:, 1]) * m + cands[:, 2]
    )
    order = jnp.arange(m_cand, dtype=jnp.int32)

    if exclude is not None:
        ex = exclude.astype(jnp.int32)
        ex_packed = (ex[:, 0] * m + ex[:, 1]) * m + ex[:, 2]
        ex_valid = (
            exclude_valid if exclude_valid is not None
            else jnp.ones(ex.shape[0], dtype=bool)
        )
        all_packed = jnp.concatenate([ex_packed, packed])
        all_order = jnp.concatenate(
            [jnp.full((ex.shape[0],), -1, jnp.int32), order])
        all_valid = jnp.concatenate([ex_valid, valid])
    else:
        all_packed, all_order, all_valid = packed, order, valid

    bits = min(max((16 * all_packed.shape[0] - 1).bit_length(), 20), 24)
    h = 1 << bits
    slot = (
        (all_packed.astype(jnp.uint32) * jnp.uint32(2654435761))
        >> jnp.uint32(32 - bits)
    ).astype(jnp.int32)
    # Invalid rows never contend for a slot.
    slot = jnp.where(all_valid, slot, h)

    table = jnp.full((h,), jnp.iinfo(jnp.int32).max, jnp.int32)
    table = table.at[slot].min(all_order, mode="drop")
    winner = (table[jnp.minimum(slot, h - 1)] == all_order) & all_valid
    return winner[-m_cand:]


class SplitArrays(NamedTuple):
    """Masked train/val/test triplet arrays with dynamic valid counts."""

    train: jax.Array        # [T_train_cap, 3]
    train_count: jax.Array  # scalar
    val: jax.Array          # [T_val_cap, 3]
    val_count: jax.Array
    test: jax.Array         # [T_test_cap, 3]
    test_count: jax.Array


def split_triplets(
    sample: TripletSet,
    perm: jax.Array,
    train_cap: int,
    val_cap: int,
    test_cap: int,
    train_ratio: float = 0.8,
    val_ratio: float = 0.1,
) -> SplitArrays:
    """Deterministic 80/10/10 split with masked shortfall handling.

    Mirrors ``torch.utils.data.random_split`` under the fixed seed 42
    (reference ``structure.py:704-718``): sizes are computed from the
    *actual* number of unique triplets, a fixed-seed permutation (``perm``,
    see :func:`mfcd_tpu.core.rng.split_permutation`) assigns membership,
    and each split keeps the permuted order.
    """
    t = sample.triplets.shape[0]
    count = sample.count
    permuted = sample.triplets[perm]
    perm_valid = perm < count  # valid rows live in the first `count` slots

    train_sz = jnp.floor(train_ratio * count).astype(jnp.int32)
    val_sz = jnp.floor(val_ratio * count).astype(jnp.int32)
    test_sz = count - train_sz - val_sz

    # Each big 1D scatter/cumsum costs ~1-2 ms at 1e5 rows on TPU, so the
    # three per-split compactions share ONE rank cumsum and ONE scatter
    # into a concatenated [train | val | test] buffer: a valid row's rank
    # among valid rows (in permuted order) determines both its split and
    # its offset within it.  Bit-identical to per-split compaction.
    rank = jnp.cumsum(perm_valid) - 1  # rank among valid, in permuted order
    in_train = perm_valid & (rank < train_sz)
    in_val = perm_valid & (rank >= train_sz) & (rank < train_sz + val_sz)
    in_test = perm_valid & (rank >= train_sz + val_sz)
    total = train_cap + val_cap + test_cap

    pos = jnp.where(
        in_train & (rank < train_cap),
        rank,
        jnp.where(
            in_val & (rank - train_sz < val_cap),
            train_cap + (rank - train_sz),
            jnp.where(
                in_test & (rank - train_sz - val_sz < test_cap),
                train_cap + val_cap + (rank - train_sz - val_sz),
                total,  # dropped
            ),
        ),
    )
    big = jnp.zeros((total, 3), dtype=jnp.int32).at[pos].set(
        permuted, mode="drop"
    )

    return SplitArrays(
        train=big[:train_cap],
        train_count=jnp.minimum(train_sz, train_cap),
        val=big[train_cap:train_cap + val_cap],
        val_count=jnp.minimum(val_sz, val_cap),
        test=big[train_cap + val_cap:],
        test_count=jnp.minimum(test_sz, test_cap),
    )


def winners_to_splits(
    cands: jax.Array,
    win: jax.Array,
    t_cap: int,
    train_cap: int,
    val_cap: int,
    test_cap: int,
    key: jax.Array,
    budget=None,
    train_ratio: float = 0.8,
    val_ratio: float = 0.1,
):
    """Fused compaction + fixed-permutation 80/10/10 split: ONE scatter.

    The classic pipeline (compact winners -> permute -> rank -> split)
    costs three full-length scatters/gathers at ~1e5 rows, each
    latency-bound per index on TPU.  But its net effect is a *fixed
    bijection of winner ranks* given the unique count — exactly the
    structure of the reference's fixed-generator ``random_split``
    (``structure.py:710-713``: a seed-42 permutation, deterministic given
    the dataset size, applied to triplets in first-occurrence draw
    order).  So the split slot is computed pointwise instead: winner rank
    ``r`` (a prefix cumsum) maps through an exact keyed PRP on
    [0, count) (:func:`mfcd_tpu.ops.shuffle.exact_prefix_permutation`,
    fixed key = the split seed), and the PRP value *is* the row's final
    slot — [0, train_sz) lands in train at offset y, [train_sz,
    train_sz + val_sz) in val, the rest in test.  One cumsum + vector ALU
    + one scatter; bijectivity guarantees every slot is written at most
    once.

    Args:
      cands: [M, 3] proposals in draw order.
      win: [M] first-occurrence winner mask
        (:func:`first_occurrence_winners`).
      t_cap: static sample capacity (2^k_bits >= t_cap sizes the PRP
        domain).
      key: PRNG key of the split stream — FIXED across reps/configs,
        mirroring the reference's fixed seed.
      budget: optional traced exact target <= t_cap (capacity bucketing).

    Returns:
      (SplitArrays, count) — count is the unique-triplet count
      (min(#winners, budget)), the same value :func:`select_unique`
      reports.
    """
    if budget is None:
        budget = t_cap
    rank = jnp.cumsum(win) - 1
    count = jnp.minimum(jnp.sum(win), budget).astype(jnp.int32)
    kept = win & (rank < budget)
    return ranks_to_splits(
        cands, kept, rank, count, t_cap, train_cap, val_cap, test_cap,
        key=key, train_ratio=train_ratio, val_ratio=val_ratio,
    ), count


def ranks_to_splits(
    cands: jax.Array,
    kept: jax.Array,
    rank: jax.Array,
    count: jax.Array,
    t_cap: int,
    train_cap: int,
    val_cap: int,
    test_cap: int,
    key: jax.Array,
    train_ratio: float = 0.8,
    val_ratio: float = 0.1,
) -> SplitArrays:
    """Rank-indexed core of :func:`winners_to_splits`.

    ``rank`` assigns each kept row its position in the reference's
    insertion order; callers whose rows are already unique and ordered
    (the PRP random sampler, where ``rank = arange`` and
    ``count = budget``) skip the winner cumsum entirely.  ``kept`` rows
    must have ``rank < count``.
    """
    from mfcd_tpu.ops.shuffle import exact_prefix_permutation

    k_bits = max((t_cap - 1).bit_length(), 1)
    y = exact_prefix_permutation(key, rank, count, k_bits)

    # Same size arithmetic as split_triplets (torch random_split floors).
    train_sz = jnp.floor(train_ratio * count).astype(jnp.int32)
    val_sz = jnp.floor(val_ratio * count).astype(jnp.int32)
    test_sz = count - train_sz - val_sz

    total = train_cap + val_cap + test_cap
    in_train = kept & (y < train_sz) & (y < train_cap)
    in_val = kept & (y >= train_sz) & (y < train_sz + val_sz) \
        & (y - train_sz < val_cap)
    in_test = kept & (y >= train_sz + val_sz) \
        & (y - train_sz - val_sz < test_cap)
    pos = jnp.where(
        in_train,
        y,
        jnp.where(
            in_val,
            train_cap + (y - train_sz),
            jnp.where(
                in_test,
                train_cap + val_cap + (y - train_sz - val_sz),
                total,  # dropped
            ),
        ),
    )
    big = jnp.zeros((total, 3), dtype=jnp.int32).at[pos].set(
        cands.astype(jnp.int32), mode="drop"
    )

    return SplitArrays(
        train=big[:train_cap],
        train_count=jnp.minimum(train_sz, train_cap),
        val=big[train_cap:train_cap + val_cap],
        val_count=jnp.minimum(val_sz, val_cap),
        test=big[train_cap + val_cap:],
        test_count=jnp.minimum(test_sz, test_cap),
    )


def overdraw_size(
    target: int,
    population: float,
    p_valid: float = 1.0,
    safety: float = 1.3,
    slack: int = 512,
    cap: Optional[int] = None,
) -> int:
    """Static overdraw M so that ~target unique valid draws survive.

    Drawing M uniform samples from a population of size N yields about
    ``N (1 - exp(-M/N))`` unique values; inverting gives the M needed for
    ``target`` uniques, inflated by the validity rate and a safety margin.
    """
    import math

    n_eff = max(float(population), 1.0)
    frac = min(float(target) / n_eff, 0.999)
    m_unique = -n_eff * math.log1p(-frac)
    m = int(math.ceil(m_unique / max(p_valid, 1e-6) * safety)) + slack
    m = max(m, target)
    if cap is not None:
        m = min(m, max(cap, 1))
    return m
