"""Bradley–Terry–Luce labeling and dataset assembly, entirely on device.

Capability match for ``BTLPreferenceDataset`` + ``split_dataset_from_triplets``
(reference ``structure.py:465-742``):

- labels follow ``P(u prefers i over j) = sigmoid(scale * (X[u,i] - X[u,j]))``
  (reference ``structure.py:509``),
- hard labels draw K independent Bernoulli votes, each becoming its own
  (u, i, j, label) row — the dataset size multiplies by K
  (reference ``structure.py:516-518``),
- soft labels (train split only, when enabled) average the K votes into one
  row (reference ``structure.py:510-513, 733-735``),
- the 80/10/10 split uses a fixed-seed permutation
  (reference ``structure.py:710-713``),
- the test split is topped up to >= 500 labels with freshly sampled triplets
  excluding everything already seen (reference ``structure.py:721-730``).

Shapes are static; shortfall from constrained samplers propagates as
validity masks rather than smaller arrays.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mfcd_tpu.core import rng
from mfcd_tpu.core.config import RunConfig, ShapeInfo, TRAIN_RATIO, VAL_RATIO
from mfcd_tpu.sampling import sample_triplets
from mfcd_tpu.sampling.dedup import TripletSet


class LabeledSplit(NamedTuple):
    """A labeled comparison split: (u, i, j, z) rows with a validity mask."""

    u: jax.Array      # [N] int32
    i: jax.Array      # [N] int32
    j: jax.Array      # [N] int32
    z: jax.Array      # [N] float32 labels (0/1 hard, fractional soft)
    valid: jax.Array  # [N] bool
    count: jax.Array  # scalar int32 — number of valid rows


def btl_label(
    key: jax.Array,
    x: jax.Array,
    triplets: jax.Array,
    triplet_count: jax.Array,
    scale,
    K: int,
    soft_label: bool = False,
) -> LabeledSplit:
    """Label a [T, 3] triplet array under the BTL model.

    Hard mode returns T*K rows (votes inlined); soft mode returns T rows
    whose labels are the mean of K votes.
    """
    t = triplets.shape[0]
    tvalid = jnp.arange(t) < triplet_count
    u, i, j = triplets[:, 0], triplets[:, 1], triplets[:, 2]
    diff = x[u, i] - x[u, j]
    prob = jax.nn.sigmoid(scale * diff)  # [T]

    if soft_label:
        votes = jax.random.bernoulli(key, prob[:, None], (t, K))
        z = jnp.mean(votes.astype(jnp.float32), axis=1)
        return LabeledSplit(
            u=u, i=i, j=j, z=z, valid=tvalid,
            count=triplet_count.astype(jnp.int32),
        )

    votes = jax.random.bernoulli(key, prob[:, None], (t, K))  # [T, K]
    z = votes.astype(jnp.float32).reshape(-1)                 # [T*K]
    rep = lambda a: jnp.repeat(a, K, axis=0)
    return LabeledSplit(
        u=rep(u), i=rep(i), j=rep(j), z=z, valid=rep(tvalid),
        count=(triplet_count * K).astype(jnp.int32),
    )


class Dataset(NamedTuple):
    train: LabeledSplit
    val: LabeledSplit
    test: LabeledSplit
    sample: TripletSet  # the full unique triplet sample (for diagnostics)


class SampledSplits(NamedTuple):
    """Unlabeled triplet splits (K-free): the output of the sample stage."""

    sample: TripletSet       # the full unique triplet draw
    train: jax.Array         # [train_cap, 3]
    train_count: jax.Array
    val: jax.Array           # [val_cap, 3]
    val_count: jax.Array
    test: jax.Array          # [test_cap + extra_cap, 3] (top-up folded in)
    test_count: jax.Array


def sample_and_split(
    streams: dict,
    x: jax.Array,
    t_cap: int,
    extra_cap: int,
    strategy: str,
    popularity_method: str = "zipf",
    alpha: float = 1.5,
    budget=None,
    extra_budget=None,
    keep_sample: bool = False,
) -> SampledSplits:
    """Sample unique triplets, split 80/10/10, and top up the test split.

    This half of the dataset build is independent of K and soft_label, so
    its compiled program is shared across every labeling scheme.
    ``t_cap`` / ``extra_cap`` are static array capacities; ``budget`` /
    ``extra_budget`` optionally carry *traced* exact triplet targets so one
    executable serves every sparsity value in a capacity bucket (the
    trainer's dynamic trip counts make capacity padding free at runtime).
    Defaults reproduce exact-capacity semantics.

    The dedup -> split pipeline is fused: first-occurrence winners scatter
    straight from the overdrawn proposal array into their final split
    slots through a fixed keyed PRP of winner ranks
    (:func:`mfcd_tpu.sampling.dedup.winners_to_splits`) — same structure
    as the reference's fixed-seed ``random_split`` of the rejection loop's
    insertion-ordered dataset (``structure.py:704-730``), at one scatter
    instead of three scatter/gather passes.  ``keep_sample=True``
    additionally materializes the compacted unique sample
    (``SampledSplits.sample``; diagnostics only — the engine never needs
    it and leaves it empty).
    """
    from mfcd_tpu.sampling import (first_occurrence_winners, prp,
                                   propose_candidates)
    from mfcd_tpu.sampling.dedup import _compact, winners_to_splits

    n, m = x.shape
    train_cap = int(TRAIN_RATIO * t_cap)
    val_cap = int(VAL_RATIO * t_cap)
    test_cap = t_cap - train_cap - val_cap

    # PRP fast path (sampling/prp.py): the sample IS a PRP prefix over the
    # strategy's proposal domain — unique by bijectivity, count == budget,
    # the test top-up continues the same permutation at [t_cap, t_cap +
    # extra_cap) (disjoint from the whole main block: the reference's
    # exclude semantics for free), and the split buffers are assembled by
    # a pure map over output slots through the inverse split-PRP — no
    # scatter, no hash table, no candidate array.
    fast = prp.uniform_domain(strategy, x, t_cap, extra_cap,
                              key=streams["sampling"],
                              svd_num_triplets=t_cap, svd_budget=budget)
    if fast is not None:
        dom, decode, sample_key = fast
        count = jnp.asarray(
            t_cap if budget is None else budget, jnp.int32)
        extra_count = (extra_cap if extra_budget is None
                       else extra_budget) if extra_cap > 0 else 0
        splits = prp.prp_splits(
            sample_key, rng.split_key(), dom, decode,
            t_cap, train_cap, val_cap, test_cap, count,
            extra_cap=extra_cap, extra_count=extra_count,
        )
        sample = TripletSet(
            decode(prp.prp_indices(
                sample_key, jnp.arange(t_cap, dtype=jnp.int32), dom))
            if keep_sample else jnp.zeros((0, 3), jnp.int32), count)
        return SampledSplits(
            sample=sample,
            train=splits.train, train_count=splits.train_count,
            val=splits.val, val_count=splits.val_count,
            test=splits.test, test_count=splits.test_count,
        )

    # Margin PRP-distinct proposals: uniform proposals with a
    # data-dependent acceptance region — drawn as a PRP prefix they are
    # pairwise-distinct, so the dedup hash table disappears and the
    # top-up continuation at slot m_draw is disjoint from the main block
    # (no exclude pass).  See strategies.propose_margin.
    # Gate rationale (subset-window condition): prp.margin_prp_supported.
    # At tiny triplet budgets where the 500-label top-up dominates, this
    # falls back to the overdraw + exclude path.
    margin_prp = (strategy == "margin"
                  and prp.margin_prp_supported(n, m, t_cap, extra_cap))
    if margin_prp:
        from mfcd_tpu.sampling import plan_overdraw
        from mfcd_tpu.sampling.strategies import propose_margin

        md = plan_overdraw("margin", t_cap, n, m)
        extra_draw = (plan_overdraw("margin", extra_cap, n, m)
                      if extra_cap > 0 else 0)
        cands, cvalid = propose_margin(
            streams["sampling"], x, md,
            t_cap if budget is None else budget, prp_distinct=True)
        win = cvalid
    else:
        cands, cvalid = propose_candidates(
            streams["sampling"], x, t_cap,
            strategy=strategy,
            popularity_method=popularity_method,
            alpha=alpha,
            budget=budget,
        )
        win = first_occurrence_winners(cands, cvalid, nm_shape=(n, m))
    splits, count = winners_to_splits(
        cands, win, t_cap, train_cap, val_cap, test_cap,
        key=rng.split_key(), budget=budget,
    )
    sample = TripletSet(
        _compact(cands, win, t_cap, budget=budget).triplets
        if keep_sample else cands[:0], count,
    )

    test_triplets = splits.test
    test_count = splits.test_count
    if extra_cap > 0:
        if margin_prp:
            # Continuation block of the SAME sample-key PRP, filtered by
            # the top-up's own (tighter) margin window — disjoint from
            # every main-block proposal by bijectivity.
            from mfcd_tpu.sampling.dedup import _compact as _compact_fn
            from mfcd_tpu.sampling.strategies import propose_margin

            ec, ea = propose_margin(
                streams["sampling"], x, extra_draw,
                extra_cap if extra_budget is None else extra_budget,
                prp_distinct=True, slot_offset=md)
            extra = _compact_fn(ec, ea, extra_cap, budget=extra_budget)
        else:
            # The exclude set is the *kept* winner rows in place (first
            # `budget` winners, exactly the dataset the reference
            # excludes at ``structure.py:721-730``); the cumsum
            # duplicates winners_to_splits' rank and is CSE'd away
            # inside the same jit.
            kept = win & (jnp.cumsum(win) - 1 <
                          (t_cap if budget is None else budget))
            extra = sample_triplets(
                streams["extra_sampling"], x, extra_cap,
                strategy=strategy,
                popularity_method=popularity_method,
                alpha=alpha,
                exclude=cands,
                exclude_valid=kept,
                budget=extra_budget,
            )
        # Compact concatenation: valid test rows first, then valid extras.
        both = jnp.concatenate([splits.test, extra.triplets], axis=0)
        both_valid = jnp.concatenate(
            [jnp.arange(test_cap) < test_count, extra.valid]
        )
        pos = jnp.cumsum(both_valid) - 1
        cap = test_cap + extra_cap
        to = jnp.where(both_valid, pos, cap)
        test_triplets = jnp.zeros((cap, 3), jnp.int32).at[to].set(
            both, mode="drop")
        test_count = test_count + extra.count

    return SampledSplits(
        sample=sample,
        train=splits.train, train_count=splits.train_count,
        val=splits.val, val_count=splits.val_count,
        test=test_triplets, test_count=test_count,
    )


def label_splits(
    streams: dict,
    x: jax.Array,
    splits: SampledSplits,
    s,
    K: int,
    soft_label: bool,
) -> Tuple[LabeledSplit, LabeledSplit, LabeledSplit]:
    """BTL-label sampled splits: (train, val, test).

    Train follows ``soft_label``; val/test are always hard-labeled
    (reference ``structure.py:733-735``).
    """
    train = btl_label(
        streams["labels_train"], x, splits.train, splits.train_count,
        s, K, soft_label=soft_label,
    )
    val = btl_label(
        streams["labels_val"], x, splits.val, splits.val_count,
        s, K, soft_label=False,
    )
    test = btl_label(
        streams["labels_test"], x, splits.test, splits.test_count,
        s, K, soft_label=False,
    )
    return train, val, test


def build_dataset(
    streams: dict,
    x: jax.Array,
    cfg: RunConfig,
    shapes: ShapeInfo | None = None,
    s=None,
) -> Dataset:
    """Sample triplets, split 80/10/10, top up test, and label — one trace.

    ``streams`` comes from :func:`mfcd_tpu.core.rng.rep_streams`.
    ``s`` optionally overrides ``cfg.s`` with a *traced* scale so one
    compiled program serves a whole s-sweep.
    """
    if shapes is None:
        shapes = cfg.shapes()
    if s is None:
        s = cfg.s

    splits = sample_and_split(
        streams, x,
        t_cap=shapes.num_triplets,
        extra_cap=shapes.extra_test_triplets,
        strategy=cfg.strategy,
        popularity_method=cfg.popularity_method,
        alpha=cfg.alpha,
        keep_sample=True,
    )
    train, val, test = label_splits(
        streams, x, splits, s, cfg.K, cfg.soft_label)
    return Dataset(train=train, val=val, test=test, sample=splits.sample)
