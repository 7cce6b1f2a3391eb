"""Sampler unit tests (reference ``generation_data.py:11-338``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfcd_tpu.genx import generate_x
from mfcd_tpu.core.rng import split_permutation
from mfcd_tpu.sampling import STRATEGIES, sample_triplets, select_unique, split_triplets
from mfcd_tpu.sampling.dedup import TripletSet
from mfcd_tpu.sampling.strategies import top_k_value

KEY = jax.random.key(7)
N, M = 30, 40
X = generate_x(KEY, N, M, 3, "base")


def _as_set(ts: TripletSet):
    cnt = int(ts.count)
    rows = np.asarray(ts.triplets[:cnt])
    return {tuple(r) for r in rows.tolist()}, rows


def test_select_unique_matches_sequential_rejection():
    """The sort-based selection must equal a python first-occurrence scan."""
    rng = np.random.default_rng(0)
    cands = rng.integers(0, 5, size=(200, 3)).astype(np.int32)
    valid = cands[:, 1] != cands[:, 2]
    exclude = np.array([[0, 1, 2], [3, 2, 1], [4, 4, 3]], dtype=np.int32)

    target = 40
    out = select_unique(
        jnp.asarray(cands), jnp.asarray(valid), target, jnp.asarray(exclude)
    )

    # Python oracle: sequential rejection in draw order.
    seen, expected = set(), []
    excl = {tuple(r) for r in exclude.tolist()}
    for c, v in zip(cands.tolist(), valid.tolist()):
        t = tuple(c)
        if v and t not in seen and t not in excl:
            seen.add(t)
            expected.append(t)
            if len(expected) == target:
                break
    cnt = int(out.count)
    got = [tuple(r) for r in np.asarray(out.triplets[:cnt]).tolist()]
    assert got == expected[:target]


def test_select_unique_shortfall():
    cands = jnp.array([[0, 1, 2]] * 50, dtype=jnp.int32)
    out = select_unique(cands, jnp.ones(50, bool), 10)
    assert int(out.count) == 1


def test_hashed_dedup_properties():
    """Hash-table selection: exact uniqueness, exclusion, first-occurrence."""
    rng = np.random.default_rng(1)
    cands = rng.integers(0, 6, size=(400, 3)).astype(np.int32)
    valid = cands[:, 1] != cands[:, 2]
    exclude = np.array([[0, 1, 2], [5, 4, 3]], dtype=np.int32)
    out = select_unique(
        jnp.asarray(cands), jnp.asarray(valid), 100,
        exclude=jnp.asarray(exclude), nm_shape=(6, 6), method="hash",
    )
    cnt = int(out.count)
    rows = np.asarray(out.triplets[:cnt])
    as_set = {tuple(r) for r in rows.tolist()}
    assert len(as_set) == cnt                      # unique
    assert (0, 1, 2) not in as_set and (5, 4, 3) not in as_set
    assert all(r[1] != r[2] for r in rows)         # validity respected
    # First-occurrence: kept rows appear in draw order.
    draw_pos = []
    seen = set()
    for pos, (c, v) in enumerate(zip(cands.tolist(), valid.tolist())):
        t = tuple(c)
        if v and t in as_set and t not in seen:
            seen.add(t)
            draw_pos.append((t, pos))
    order_map = {t: k for k, t in enumerate(map(tuple, rows.tolist()))}
    ordered = sorted(draw_pos, key=lambda tp: tp[1])
    assert [t for t, _ in ordered] == [
        t for t, _ in sorted(draw_pos, key=lambda tp: order_map[tp[0]])
    ]


def test_hashed_vs_sort_dedup_yield():
    """At reference scale the hash path loses only a tiny slice of yield."""
    rng = np.random.default_rng(2)
    m_draw = 20_000
    cands = np.stack([
        rng.integers(0, 100, m_draw),
        rng.integers(0, 100, m_draw),
        rng.integers(0, 100, m_draw),
    ], axis=1).astype(np.int32)
    valid = cands[:, 1] != cands[:, 2]
    t = 15_000
    out_sort = select_unique(jnp.asarray(cands), jnp.asarray(valid), t,
                             nm_shape=(100, 100), method="sort")
    out_hash = select_unique(jnp.asarray(cands), jnp.asarray(valid), t,
                             nm_shape=(100, 100), method="hash")
    assert int(out_hash.count) >= int(out_sort.count) * 0.97


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_strategies_produce_unique_valid_triplets(strategy):
    t = 120
    out = sample_triplets(KEY, X, t, strategy=strategy)
    cnt = int(out.count)
    assert cnt > 0
    uniq, rows = _as_set(out)
    assert len(uniq) == cnt                      # all unique
    assert np.all(rows[:, 0] < N)
    assert np.all(rows[:, 1] < M) and np.all(rows[:, 2] < M)
    assert np.all(rows[:, 1] != rows[:, 2])      # i != j
    if strategy in ("random", "proximity", "variance", "popularity",
                    "top_k", "svd", "cluster"):
        assert cnt == t                          # budget met


def test_exclude_respected():
    t = 100
    first = sample_triplets(KEY, X, t, strategy="random")
    second = sample_triplets(
        jax.random.key(8), X, t, strategy="random",
        exclude=first.triplets, exclude_valid=first.valid,
    )
    s1, _ = _as_set(first)
    s2, _ = _as_set(second)
    assert not (s1 & s2)


def test_proximity_extremes():
    out = sample_triplets(KEY, X, 100, strategy="proximity")
    _, rows = _as_set(out)
    xa = np.asarray(X)
    k = min(100, M)
    for u, i, j in rows[:50]:
        order = np.argsort(xa[u])
        assert i in order[-k:]
        assert j in order[:k]


def test_top_k_membership():
    out = sample_triplets(KEY, X, 100, strategy="top_k")
    _, rows = _as_set(out)
    xa = np.asarray(X)
    k = top_k_value(M)
    for u, i, j in rows[:50]:
        top = set(np.argsort(xa[u])[-k:].tolist())
        assert i in top and j in top


def test_margin_constraint():
    t = 200
    out = sample_triplets(KEY, X, t, strategy="margin")
    cnt = int(out.count)
    xa = np.asarray(X)
    sample = xa[: min(10, N)]
    margin = np.mean(sample.max(axis=1) - sample.min(axis=1)) * t / (N * M)
    _, rows = _as_set(out)
    for u, i, j in rows:
        assert abs(xa[u, i] - xa[u, j]) <= margin + 1e-5


def test_popularity_skew():
    key = jax.random.key(9)
    out = sample_triplets(key, X, 500, strategy="popularity",
                          popularity_method="zipf", alpha=1.5)
    _, rows = _as_set(out)
    items = np.concatenate([rows[:, 1], rows[:, 2]])
    low = np.mean(items < M // 4)
    high = np.mean(items >= 3 * M // 4)
    assert low > high * 2  # zipf over indices favors early items


def test_split_partition():
    t = 200
    sample = sample_triplets(KEY, X, t, strategy="random")
    sh_train, sh_val = int(0.8 * t), int(0.1 * t)
    sh_test = t - sh_train - sh_val
    perm = jnp.asarray(split_permutation(t))
    splits = split_triplets(sample, perm, sh_train, sh_val, sh_test)
    tr = np.asarray(splits.train[: int(splits.train_count)])
    va = np.asarray(splits.val[: int(splits.val_count)])
    te = np.asarray(splits.test[: int(splits.test_count)])
    assert len(tr) == sh_train and len(va) == sh_val and len(te) == sh_test
    all_rows = {tuple(r) for r in np.concatenate([tr, va, te]).tolist()}
    orig, _ = _as_set(sample)
    assert all_rows == orig  # disjoint cover of the sample

    # Deterministic: same split twice.
    splits2 = split_triplets(sample, perm, sh_train, sh_val, sh_test)
    assert np.array_equal(np.asarray(splits.train), np.asarray(splits2.train))


def test_split_with_shortfall():
    t = 100
    sample = sample_triplets(KEY, X, t, strategy="random")
    short = TripletSet(sample.triplets, jnp.int32(57))  # pretend shortfall
    splits = split_triplets(short, jnp.asarray(split_permutation(t)), 80, 10, 10)
    assert int(splits.train_count) == int(0.8 * 57)
    assert int(splits.val_count) == int(0.1 * 57)
    assert (
        int(splits.train_count) + int(splits.val_count)
        + int(splits.test_count) == 57
    )


def test_user_similarity_chunked_10k():
    """10k x 10k smoke test: the chunked top-set masks keep memory at
    O(chunk*m) so the sampler scales past n=m=1000 (VERDICT r1 item 7)."""
    n = m = 10_000
    key = jax.random.key(11)
    x = jax.random.normal(key, (n, m), jnp.float32)
    t = 2000  # m_draw = max(2t, 10k) = 10k -> 3 streamed chunks of 4096
    ts = sample_triplets(jax.random.key(3), x, t, strategy="user_similarity")
    cnt = int(ts.count)
    assert cnt == t
    rows = np.asarray(ts.triplets[:cnt])
    assert rows[:, 0].min() >= 0 and rows[:, 0].max() < n
    assert rows[:, 1:].min() >= 0 and rows[:, 1:].max() < m
    assert (rows[:, 1] != rows[:, 2]).all()
    assert len({tuple(r) for r in rows.tolist()}) == cnt


def test_user_similarity_chunking_same_constraints():
    """The padded multi-block path satisfies the same sampler invariants as
    the single-block path (i in top(u)\\top(v) or fallback pair from top(u));
    per-block RNG keys make the draws themselves differ by design.  With
    the cascade sampler, returned rows are per-attempt RESOLVED candidates:
    valid rows are already globally unique.  The block loop early-exits
    once the budget (100) is filled, so trailing attempts may be
    unresolved — the accepted prefix is still exact (attempt a's outcome
    depends only on attempts < a)."""
    from mfcd_tpu.sampling import strategies as S

    x = generate_x(jax.random.key(5), 60, 80, 3, "base")
    key = jax.random.key(9)
    old = (S._US_BLOCK_MIN, S._US_BLOCK_ELEMS)
    try:
        # Force 3 padded blocks for 300 attempts.
        S._US_BLOCK_MIN, S._US_BLOCK_ELEMS = 128, 1
        cands, valid = S.propose_user_similarity(key, x, 300, 100)
    finally:
        S._US_BLOCK_MIN, S._US_BLOCK_ELEMS = old
    cands = np.asarray(cands)
    valid = np.asarray(valid)
    assert cands.shape == (300, 3) and valid.shape == (300,)
    u, i, j = cands[valid].T
    assert (u >= 0).all() and (u < 60).all()
    assert (i >= 0).all() and (i < 80).all()
    assert (j >= 0).all() and (j < 80).all()
    assert (i != j).all()
    # Resolved rows are already unique (the cascade dedups in-sampler).
    assert len({tuple(r) for r in cands[valid].tolist()}) == valid.sum()
    # Every sampled i must be a top-k item of its user (holds on both the
    # difference-set and fallback branches).
    tk = max(3, min(80 // 10, 10 + 100 // (5 * 60)))
    top = np.asarray(jax.lax.top_k(x, tk)[1])
    assert all(ii in top[uu] for uu, ii in zip(u, i))


def test_estimate_k():
    """k(k-1)/2 >= T at the returned k and not at k-1
    (reference ``generation_data.py:186-187``)."""
    from mfcd_tpu.sampling.strategies import estimate_k

    for t in (1, 2, 3, 10, 45, 46, 1000, 123456):
        k = estimate_k(t)
        assert k * (k - 1) / 2 >= t
        assert (k - 1) * (k - 2) / 2 < t


def test_traced_budget_equals_static_at_capacity():
    """The traced-budget program with budget == capacity must reproduce
    the static program bit-for-bit (the invariant guarding the capacity-
    bucketing plumbing: `budget` only caps counts, never shifts draws)."""
    t = 400
    for strategy in ("random", "margin", "popularity"):
        a = sample_triplets(KEY, X, t, strategy=strategy)
        b = sample_triplets(KEY, X, t, strategy=strategy,
                            budget=jnp.int32(t))
        assert int(a.count) == int(b.count)
        np.testing.assert_array_equal(
            np.asarray(a.triplets), np.asarray(b.triplets), err_msg=strategy)


def _fused_splits(t, strategy="random", budget=None, key=KEY):
    from mfcd_tpu.core import rng
    from mfcd_tpu.sampling import first_occurrence_winners, propose_candidates
    from mfcd_tpu.sampling.dedup import winners_to_splits

    cands, valid = propose_candidates(key, X, t, strategy, budget=budget)
    win = first_occurrence_winners(cands, valid, nm_shape=(N, M))
    tr_cap, va_cap = int(0.8 * t), int(0.1 * t)
    splits, count = winners_to_splits(
        cands, win, t, tr_cap, va_cap, t - tr_cap - va_cap,
        key=rng.split_key(), budget=budget)
    return splits, count, cands, win


def test_winners_to_splits_partition():
    """The fused one-scatter split covers the kept winner set exactly,
    with the reference's floor(0.8/0.1) sizes (structure.py:704-718)."""
    t = 200
    splits, count, cands, win = _fused_splits(t)
    cnt = int(count)
    assert cnt == t
    tr = np.asarray(splits.train[: int(splits.train_count)])
    va = np.asarray(splits.val[: int(splits.val_count)])
    te = np.asarray(splits.test[: int(splits.test_count)])
    assert len(tr) == int(0.8 * t) and len(va) == int(0.1 * t)
    assert len(tr) + len(va) + len(te) == cnt
    got = [tuple(r) for r in np.concatenate([tr, va, te]).tolist()]
    assert len(set(got)) == cnt  # PRP bijectivity: no slot written twice
    kept = np.asarray(cands)[np.asarray(win)][:cnt]
    assert set(got) == {tuple(r) for r in kept.tolist()}


def test_winners_to_splits_budget_and_shortfall():
    """A traced budget below capacity caps count and sizes; at
    budget == capacity the traced program is bit-equal to the static one."""
    t = 256
    s_static, c_static, _, _ = _fused_splits(t)
    s_traced, c_traced, _, _ = _fused_splits(t, budget=jnp.int32(t))
    assert int(c_static) == int(c_traced)
    for a, b in zip(s_static, s_traced):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    s_cap, c_cap, cands, win = _fused_splits(t, budget=jnp.int32(57))
    assert int(c_cap) == 57
    assert int(s_cap.train_count) == int(0.8 * 57)
    assert int(s_cap.val_count) == int(0.1 * 57)
    total = int(s_cap.train_count) + int(s_cap.val_count) + int(
        s_cap.test_count)
    assert total == 57
    # The kept set is the first 57 winners in draw order (reference
    # insertion order), not an arbitrary 57-subset.
    tr = np.asarray(s_cap.train[: int(s_cap.train_count)])
    va = np.asarray(s_cap.val[: int(s_cap.val_count)])
    te = np.asarray(s_cap.test[: int(s_cap.test_count)])
    got = {tuple(r) for r in np.concatenate([tr, va, te]).tolist()}
    first57 = np.asarray(cands)[np.asarray(win)][:57]
    assert got == {tuple(r) for r in first57.tolist()}


def test_sample_and_split_matches_select_unique_count():
    """sample_and_split's count equals select_unique's for the same
    stream/budget (the fused path changes partition, never membership)."""
    from mfcd_tpu.core import rng as rng_mod
    from mfcd_tpu.data.btl import sample_and_split

    streams = rng_mod.rep_streams(jax.random.key(5))
    t = 200
    out = sample_and_split(streams, X, t_cap=t, extra_cap=0,
                           strategy="random", keep_sample=True)
    ref = sample_triplets(streams["sampling"], X, t, strategy="random")
    assert int(out.sample.count) == int(ref.count)
    ref_set, _ = _as_set(ref)
    got_set, _ = _as_set(out.sample)
    assert got_set == ref_set


def test_user_similarity_cascade_matches_sequential_oracle():
    """cascade_resolve == the reference's sequential accept-first-fresh-rank
    loop (generation_data.py:294-316), on duplicate-heavy small domains
    where the fixpoint iteration is hardest (many cross-attempt steals)."""
    from mfcd_tpu.sampling.strategies import cascade_resolve

    def oracle(u, i_all, j_all):
        nb, a = i_all.shape
        accepted = set()
        win = np.zeros((nb, a), bool)
        for at in range(a):
            for r in range(nb):
                if i_all[r, at] == j_all[r, at]:
                    continue
                key = (int(u[at]), int(i_all[r, at]), int(j_all[r, at]))
                if key not in accepted:
                    accepted.add(key)
                    win[r, at] = True
                    break
        return win

    rng = np.random.default_rng(0)
    for _ in range(12):
        a = int(rng.integers(50, 300))
        nb = int(rng.integers(3, 15))
        n = int(rng.integers(5, 25))
        m = int(rng.integers(5, 25))
        u = rng.integers(0, n, a).astype(np.int32)
        i_all = rng.integers(0, m, (nb, a)).astype(np.int32)
        j_all = rng.integers(0, m, (nb, a)).astype(np.int32)
        got = np.asarray(cascade_resolve(
            jnp.asarray(u), jnp.asarray(i_all), jnp.asarray(j_all), m))
        np.testing.assert_array_equal(got, oracle(u, i_all, j_all))


def test_user_similarity_cascade_chained_overlap():
    """Adversarial duplicate-overlap CHAIN: attempt k's rank-1 key equals
    attempt k+1's rank-0 key for 40 consecutive attempts.  Sequentially,
    every attempt accepts at rank 0; a fixed-pass fixpoint iteration
    propagates only ~one attempt per pass along the chain (code-review
    finding, round 4), so the loop must run until stable."""
    from mfcd_tpu.sampling.strategies import cascade_resolve

    a, m = 40, 100
    u = np.zeros(a, np.int32)
    i_all = np.zeros((2, a), np.int32)
    j_all = np.zeros((2, a), np.int32)
    # rank-0 of attempt k: (0, k, k+50); rank-1 of attempt k: rank-0 key
    # of attempt k+1.
    for k in range(a):
        i_all[0, k] = k
        j_all[0, k] = 50 + k if 50 + k < m else 50
        i_all[1, k] = (k + 1) % a
        j_all[1, k] = 50 + ((k + 1) % a) if 50 + ((k + 1) % a) < m else 50
    got = np.asarray(cascade_resolve(
        jnp.asarray(u), jnp.asarray(i_all), jnp.asarray(j_all), m))
    # Every attempt wins at rank 0 (all rank-0 keys distinct).
    assert got[0].all() and not got[1].any()


def test_user_similarity_cascade_exclude_semantics():
    """Excluded keys must CASCADE the attempt to its next rank (the
    reference's ``t not in exclude`` check), never win, and respect
    exclude_valid masking."""
    from mfcd_tpu.sampling.strategies import cascade_resolve

    m = 50
    u = np.array([3, 4, 5], np.int32)
    i_all = np.array([[1, 2, 3],
                      [7, 8, 9]], np.int32)
    j_all = np.array([[11, 12, 13],
                      [17, 18, 19]], np.int32)
    # Exclude attempt 0's rank-0 key and attempt 1's rank-0 key — but the
    # latter's exclude row is masked invalid, so it must still win.
    exclude = np.array([[3, 1, 11], [4, 2, 12], [9, 9, 9]], np.int32)
    exclude_valid = np.array([True, False, True])
    got = np.asarray(cascade_resolve(
        jnp.asarray(u), jnp.asarray(i_all), jnp.asarray(j_all), m,
        exclude=jnp.asarray(exclude),
        exclude_valid=jnp.asarray(exclude_valid)))
    # attempt 0: rank 0 excluded -> wins at rank 1
    # attempt 1: exclude row invalid -> wins at rank 0
    # attempt 2: untouched -> wins at rank 0
    want = np.array([[False, True, True],
                     [True, False, False]])
    np.testing.assert_array_equal(got, want)


def test_user_similarity_cascade_block_composition():
    """Threading the winners' table through per-block fixpoints must
    reproduce the single-shot resolve EXACTLY — the correctness argument
    behind the blocked, budget-early-exiting propose_user_similarity
    (attempt a's outcome depends only on attempts < a, and the threaded
    table carries exactly the accepted keys of earlier blocks)."""
    from mfcd_tpu.sampling import strategies as S

    rng = np.random.default_rng(42)
    for trial in range(6):
        a = int(rng.integers(120, 400))
        nb = int(rng.integers(2, 10))
        m = int(rng.integers(6, 20))
        u = rng.integers(0, 12, a).astype(np.int32)
        i_all = rng.integers(0, m, (nb, a)).astype(np.int32)
        j_all = rng.integers(0, m, (nb, a)).astype(np.int32)
        single = np.asarray(S.cascade_resolve(
            jnp.asarray(u), jnp.asarray(i_all), jnp.asarray(j_all), m))

        # Blocked: split the attempt axis, thread table between blocks,
        # keeping the GLOBAL attempt-major tags.
        bits = S._cascade_bits(a, 0)
        h = 1 << bits
        table = S._cascade_base_table(h, bits)
        cut = a // 2 + int(rng.integers(-20, 20))
        wins = []
        for lo, hi in ((0, cut), (cut, a)):
            ib = jnp.asarray(i_all[:, lo:hi])
            jb = jnp.asarray(j_all[:, lo:hi])
            ub = jnp.asarray(u[lo:hi])
            slot = S._cascade_slot(ub[None, :], ib, jb, bits)
            valid = ib != jb
            tags = (jnp.arange(lo, hi, dtype=jnp.int32)[None, :] * nb
                    + jnp.arange(nb, dtype=jnp.int32)[:, None])
            win, table = S._cascade_fixpoint(
                slot, valid, tags, table, h, cap=hi - lo)
            wins.append(np.asarray(win))
        blocked = np.concatenate(wins, axis=1)
        np.testing.assert_array_equal(blocked, single)
