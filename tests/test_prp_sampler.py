"""PRP random sampler (sampling/prp.py): exactness + parity vs torch.

The ``random`` strategy samples without replacement DIRECTLY — a keyed-PRP
prefix over the packed (u, i, j) domain — instead of overdraw + hash dedup.
These tests pin the load-bearing properties: bijectivity (no duplicates,
ever), domain decode correctness, disjoint test-top-up continuation,
exact traced-budget counts, and two-sample chi-square parity of the
(u, i, j) marginals vs the reference rejection sampler
(``generation_data.py:16-26``).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfcd_tpu.core import rng
from mfcd_tpu.data.btl import sample_and_split
from mfcd_tpu.sampling import sample_triplets
from mfcd_tpu.sampling.prp import (prp_domain_size, prp_supported,
                                   prp_triplets)

N, M = 60, 80


def _pack(tri, m=M):
    return (tri[:, 0].astype(np.int64) * m + tri[:, 1]) * m + tri[:, 2]


def test_unique_in_domain_and_disjoint_continuation():
    t = 20000
    tri = np.asarray(prp_triplets(jax.random.key(0), N, M,
                                  jnp.arange(t, dtype=jnp.int32)))
    assert (tri[:, 1] != tri[:, 2]).all()
    assert tri.min() >= 0
    assert tri[:, 0].max() < N and tri[:, 1:].max() < M
    assert len(np.unique(_pack(tri))) == t
    cont = np.asarray(prp_triplets(jax.random.key(0), N, M,
                                   t + jnp.arange(4096, dtype=jnp.int32)))
    assert len(np.unique(_pack(cont))) == 4096
    assert not np.intersect1d(_pack(tri), _pack(cont)).size


def test_full_domain_is_a_permutation():
    n, m = 7, 9
    dom = prp_domain_size(n, m)
    tri = np.asarray(prp_triplets(jax.random.key(3), n, m,
                                  jnp.arange(dom, dtype=jnp.int32)))
    packed = (tri[:, 0] * m + tri[:, 1]) * m + tri[:, 2]
    assert len(np.unique(packed)) == dom  # covers the whole domain once
    # every decoded tuple is valid
    assert (tri[:, 1] != tri[:, 2]).all()


def test_supported_gates():
    assert prp_supported(1000, 1000, 131072)
    assert not prp_supported(1000, 1, 16)          # m < 2
    assert not prp_supported(3000, 3000, 16)       # domain > int32
    assert not prp_supported(7, 9, 7 * 9 * 8 + 1)  # blocks exceed domain
    assert prp_supported(7, 9, 7 * 9 * 8)


def test_sample_triplets_count_and_budget_parity():
    x = jnp.zeros((N, M))
    cap = 4096
    static = sample_triplets(jax.random.key(1), x, cap, strategy="random")
    assert int(static.count) == cap
    # traced budget == capacity must be bit-identical to the static run
    traced = sample_triplets(jax.random.key(1), x, cap, strategy="random",
                             budget=jnp.int32(cap))
    np.testing.assert_array_equal(np.asarray(static.triplets),
                                  np.asarray(traced.triplets))
    # smaller traced budget: exact count, same leading rows
    small = sample_triplets(jax.random.key(1), x, cap, strategy="random",
                            budget=jnp.int32(1000))
    assert int(small.count) == 1000
    np.testing.assert_array_equal(np.asarray(small.triplets)[:1000],
                                  np.asarray(static.triplets)[:1000])


def test_sample_and_split_prp_exactness():
    """Through the fused split: all split rows + top-up are distinct,
    counts are exact (80/10/10 floors), and the top-up never overlaps."""
    x = jnp.zeros((N, M))
    t_cap, extra_cap = 2048, 512
    streams = rng.rep_streams(jax.random.key(5))
    out = sample_and_split(streams, x, t_cap, extra_cap, "random")

    tr = np.asarray(out.train)[: int(out.train_count)]
    va = np.asarray(out.val)[: int(out.val_count)]
    te = np.asarray(out.test)[: int(out.test_count)]
    assert int(out.train_count) == int(0.8 * t_cap)
    assert int(out.val_count) == int(0.1 * t_cap)
    assert int(out.test_count) == (t_cap - int(0.8 * t_cap)
                                   - int(0.1 * t_cap)) + extra_cap
    allp = np.concatenate([_pack(tr), _pack(va), _pack(te)])
    assert len(np.unique(allp)) == len(allp)
    assert len(allp) == t_cap + extra_cap


@pytest.mark.parametrize("count,extra_count", [
    (2048, 512), (1700, 300), (2048, 0), (1, 1), (2047, 512),
])
def test_direct_assembly_bit_equals_scatter(count, extra_count):
    """prp_splits' inverse-PRP pure-map assembly must be BIT-IDENTICAL to
    scattering the forward PRP rows through ranks_to_splits + the compact
    top-up concatenation (the formulation it replaced)."""
    from mfcd_tpu.core.config import TRAIN_RATIO, VAL_RATIO
    from mfcd_tpu.sampling.dedup import ranks_to_splits
    from mfcd_tpu.sampling.prp import (decode_random, prp_domain_size,
                                       prp_splits)

    t_cap, extra_cap = 2048, 512
    train_cap = int(TRAIN_RATIO * t_cap)
    val_cap = int(VAL_RATIO * t_cap)
    test_cap = t_cap - train_cap - val_cap
    skey = jax.random.key(11)
    fkey = rng.split_key()

    got = prp_splits(skey, fkey, prp_domain_size(N, M),
                     lambda idx: decode_random(idx, N, M),
                     t_cap, train_cap, val_cap, test_cap,
                     jnp.int32(count), extra_cap=extra_cap,
                     extra_count=jnp.int32(extra_count))

    # Oracle: forward rows + scatter split + concat-compact top-up.
    slots = jnp.arange(t_cap, dtype=jnp.int32)
    cands = prp_triplets(skey, N, M, slots)
    ref = ranks_to_splits(cands, slots < count, slots, jnp.int32(count),
                          t_cap, train_cap, val_cap, test_cap, key=fkey)
    ex = prp_triplets(skey, N, M, t_cap + jnp.arange(extra_cap))
    both = jnp.concatenate([ref.test, ex], axis=0)
    both_valid = jnp.concatenate(
        [jnp.arange(test_cap) < ref.test_count,
         jnp.arange(extra_cap) < extra_count])
    pos = jnp.cumsum(both_valid) - 1
    cap = test_cap + extra_cap
    to = jnp.where(both_valid, pos, cap)
    ref_test = jnp.zeros((cap, 3), jnp.int32).at[to].set(both, mode="drop")

    np.testing.assert_array_equal(np.asarray(got.train),
                                  np.asarray(ref.train))
    np.testing.assert_array_equal(np.asarray(got.val), np.asarray(ref.val))
    np.testing.assert_array_equal(np.asarray(got.test), np.asarray(ref_test))
    assert int(got.train_count) == int(ref.train_count)
    assert int(got.val_count) == int(ref.val_count)
    assert int(got.test_count) == int(ref.test_count) + extra_count


def test_proximity_prp_membership_and_uniqueness():
    """Proximity PRP path: every i in u's top set, every j in u's bottom
    set, tuples unique, i != j always (m >= 2*kk makes the sets disjoint)."""
    from mfcd_tpu.sampling.prp import proximity_prp_supported

    n, m, kk = 40, 64, 20
    assert proximity_prp_supported(n, m, 5000, k=kk)
    assert not proximity_prp_supported(n, 30, 100, k=kk)  # m < 2*kk
    x = jnp.asarray(np.random.default_rng(3).normal(size=(n, m)),
                    jnp.float32)
    from mfcd_tpu.sampling.prp import (decode_proximity, prp_indices,
                                       proximity_tables)

    top, bot = proximity_tables(x, k=kk)
    t = 5000
    tri = np.asarray(decode_proximity(
        prp_indices(jax.random.key(4), jnp.arange(t), n * kk * kk),
        kk, top, bot))
    topn, botn = np.asarray(top), np.asarray(bot)
    assert len(np.unique(_pack(tri, m))) == t
    assert (tri[:, 1] != tri[:, 2]).all()
    for col, table in ((1, topn), (2, botn)):
        ok = (table[tri[:, 0]] == tri[:, col][:, None]).any(axis=1)
        assert ok.all()


def test_proximity_engine_fast_path():
    """sample_triplets routes proximity through the PRP path at the
    production shape class and returns exact counts."""
    x = jnp.asarray(np.random.default_rng(5).normal(size=(50, 220)),
                    jnp.float32)
    out = sample_triplets(jax.random.key(6), x, 4096, strategy="proximity")
    assert int(out.count) == 4096
    tri = np.asarray(out.triplets)
    assert len(np.unique(_pack(tri, 220))) == 4096


def test_topk_prp_membership_and_uniqueness():
    """top_k PRP path: i and j both in u's top set, distinct, unique
    tuples; kk follows the reference's min(m, max(5, 0.1m))."""
    from mfcd_tpu.sampling.prp import (decode_top_k, prp_indices,
                                       topk_prp_supported, topk_table)

    n, m = 40, 220                      # kk = 22
    assert topk_prp_supported(n, m, 8000)
    assert not topk_prp_supported(n, m, n * 22 * 21 + 1)  # blocks > domain
    x = jnp.asarray(np.random.default_rng(7).normal(size=(n, m)),
                    jnp.float32)
    top = topk_table(x)
    kk = top.shape[1]
    assert kk == 22
    t = 8000
    tri = np.asarray(decode_top_k(
        prp_indices(jax.random.key(12), jnp.arange(t), n * kk * (kk - 1)),
        kk, top))
    topn = np.asarray(top)
    assert len(np.unique(_pack(tri, m))) == t
    assert (tri[:, 1] != tri[:, 2]).all()
    for col in (1, 2):
        ok = (topn[tri[:, 0]] == tri[:, col][:, None]).any(axis=1)
        assert ok.all()


def test_svd_prp_membership_and_uniqueness():
    """svd PRP path: u from the top-user set, i/j distinct from the
    top-item set, unique tuples; tables shared with the overdraw path."""
    from mfcd_tpu.sampling.prp import (decode_svd, prp_indices, svd_dims,
                                       svd_prp_supported)
    from mfcd_tpu.sampling.strategies import svd_tables

    n, m = 120, 120
    t = 5000
    nu, mt = svd_dims(n, m)
    assert (nu, mt) == (36, 36)
    assert svd_prp_supported(n, m, t)
    x = jnp.asarray(np.random.default_rng(8).normal(size=(n, m)),
                    jnp.float32)
    tu, ti = svd_tables(jax.random.key(13), x, t)
    tri = np.asarray(decode_svd(
        prp_indices(jax.random.key(14), jnp.arange(t), nu * mt * (mt - 1)),
        mt, tu, ti))
    assert len(np.unique(_pack(tri, m))) == t
    assert (tri[:, 1] != tri[:, 2]).all()
    assert set(tri[:, 0].tolist()) <= set(np.asarray(tu).tolist())
    items = set(np.asarray(ti).tolist())
    assert set(tri[:, 1].tolist()) | set(tri[:, 2].tolist()) <= items


@pytest.mark.parametrize("strategy,n,m", [
    ("top_k", 50, 220), ("svd", 120, 120),
])
def test_engine_fast_path_split_wiring(strategy, n, m):
    """sample_and_split routes top_k/svd through the shared PRP split
    assembly: exact counts, all rows + top-up distinct."""
    x = jnp.asarray(np.random.default_rng(15).normal(size=(n, m)),
                    jnp.float32)
    t_cap, extra_cap = 2048, 512
    streams = rng.rep_streams(jax.random.key(16))
    out = sample_and_split(streams, x, t_cap, extra_cap, strategy)
    tr = np.asarray(out.train)[: int(out.train_count)]
    va = np.asarray(out.val)[: int(out.val_count)]
    te = np.asarray(out.test)[: int(out.test_count)]
    assert int(out.train_count) == int(0.8 * t_cap)
    assert int(out.val_count) == int(0.1 * t_cap)
    assert int(out.test_count) == (t_cap - int(0.8 * t_cap)
                                   - int(0.1 * t_cap)) + extra_cap
    allp = np.concatenate([_pack(tr, m), _pack(va, m), _pack(te, m)])
    assert len(np.unique(allp)) == t_cap + extra_cap


def test_proximity_prp_tied_scores_stay_valid():
    """Fully tied X (worst case for top-k index sets): the disjoint
    table construction must keep i != j and uniqueness — the unmasked
    tables would overlap and silently emit i == j rows."""
    n, m = 30, 220
    x = jnp.zeros((n, m), jnp.float32)
    out = sample_triplets(jax.random.key(31), x, 3000,
                          strategy="proximity")
    tri = np.asarray(out.triplets)[: int(out.count)]
    assert int(out.count) == 3000
    assert (tri[:, 1] != tri[:, 2]).all()
    assert len(np.unique(_pack(tri, m))) == 3000
    # disjoint=False reproduces the overlapping reference tables on ties
    from mfcd_tpu.sampling.prp import proximity_tables

    top, bot = proximity_tables(x, k=100, disjoint=False)
    assert np.intersect1d(np.asarray(top[0]), np.asarray(bot[0])).size
    topd, botd = proximity_tables(x, k=100, disjoint=True)
    assert not np.intersect1d(np.asarray(topd[0]), np.asarray(botd[0])).size


def test_margin_wide_topup_window_falls_back():
    """When the 500-label top-up dominates the budget (2*extra_cap >
    t_cap) the continuation argument breaks, so the engine must take
    the overdraw + exclude path — and still produce valid splits."""
    n, m = 60, 80
    x_np = np.random.default_rng(33).normal(size=(n, m)).astype(np.float32)
    x = jnp.asarray(x_np)
    t_cap, extra_cap = 64, 512
    streams = rng.rep_streams(jax.random.key(34))
    out = sample_and_split(streams, x, t_cap, extra_cap, "margin")
    te = np.asarray(out.test)[: int(out.test_count)]
    tr = np.asarray(out.train)[: int(out.train_count)]
    va = np.asarray(out.val)[: int(out.val_count)]
    allp = np.concatenate([_pack(tr, m), _pack(va, m), _pack(te, m)])
    assert len(np.unique(allp)) == len(allp)  # exclude semantics held
    assert (te[:, 1] != te[:, 2]).all()


def test_margin_prp_distinct_and_window():
    """Margin PRP-distinct path: rows unique, inside the adaptive window,
    i != j structural, count exact when acceptance is plentiful."""
    n, m = 60, 80
    x_np = np.random.default_rng(21).normal(size=(n, m)).astype(np.float32)
    x = jnp.asarray(x_np)
    t = 1000  # window accepts ~40% of pairs at this budget
    out = sample_triplets(jax.random.key(22), x, t, strategy="margin")
    assert int(out.count) == t
    tri = np.asarray(out.triplets)[:t]
    assert len(np.unique(_pack(tri, m))) == t
    assert (tri[:, 1] != tri[:, 2]).all()
    win = (np.mean(np.max(x_np[:10], axis=1) - np.min(x_np[:10], axis=1))
           * t / (n * m))
    d = np.abs(x_np[tri[:, 0], tri[:, 1]] - x_np[tri[:, 0], tri[:, 2]])
    assert (d <= win + 1e-6).all()


def test_margin_engine_split_wiring():
    """sample_and_split margin: PRP continuation top-up is disjoint from
    every split row and respects the top-up's own tighter window."""
    n, m = 60, 80
    x_np = np.random.default_rng(23).normal(size=(n, m)).astype(np.float32)
    x = jnp.asarray(x_np)
    t_cap, extra_cap = 1024, 128
    streams = rng.rep_streams(jax.random.key(24))
    out = sample_and_split(streams, x, t_cap, extra_cap, "margin")
    assert int(out.train_count) == int(0.8 * t_cap)
    assert int(out.val_count) == int(0.1 * t_cap)
    test_sz = t_cap - int(0.8 * t_cap) - int(0.1 * t_cap)
    assert int(out.test_count) == test_sz + extra_cap
    tr = np.asarray(out.train)[: int(out.train_count)]
    va = np.asarray(out.val)[: int(out.val_count)]
    te = np.asarray(out.test)[: int(out.test_count)]
    allp = np.concatenate([_pack(tr, m), _pack(va, m), _pack(te, m)])
    assert len(np.unique(allp)) == t_cap + extra_cap
    # main rows respect the wide window; the top-up rows (the tail of the
    # test buffer) the tight one (num_triplets=extra_cap, reference
    # recomputes the margin per call, generation_data.py:56-57)
    rng_ = np.max(x_np[:10], axis=1) - np.min(x_np[:10], axis=1)
    for rows, budget in ((np.concatenate([tr, va, te[:test_sz]]), t_cap),
                         (te[test_sz:], extra_cap)):
        win = np.mean(rng_) * budget / (n * m)
        d = np.abs(x_np[rows[:, 0], rows[:, 1]]
                   - x_np[rows[:, 0], rows[:, 2]])
        assert (d <= win + 1e-6).all()


def test_fast_path_kind_and_memory_model(monkeypatch):
    """fast_path_kind mirrors the sample_and_split gates, and the sweep
    memory model stops charging PRP strategies for overdraw arrays."""
    import mfcd_tpu.sampling.prp as prp_mod
    from mfcd_tpu.core.config import RunConfig
    from mfcd_tpu.sampling.prp import fast_path_kind
    from mfcd_tpu.sweep.batched import default_max_bucket

    n, m, t = 1000, 1000, 131072
    assert fast_path_kind("random", n, m, t) == "prefix"
    assert fast_path_kind("proximity", n, m, t) == "prefix"
    assert fast_path_kind("top_k", n, m, t) == "prefix"
    assert fast_path_kind("svd", n, m, t) == "prefix"
    assert fast_path_kind("margin", n, m, t) == "distinct"
    assert fast_path_kind("margin", n, m, 64, 512) is None  # wide top-up
    assert fast_path_kind("popularity", n, m, t) is None
    assert fast_path_kind("variance", n, m, t) is None
    # a prefix strategy packs at least as many configs per program as a
    # hash-dedup one at the same shapes
    mk = lambda s: RunConfig(n=n, m=m, d=2, p=0.25, s=5.0, lr=1e-3,  # noqa: E731
                             weight_decay=0.0, num_epochs=3, reps=1,
                             K=1, strategy=s)
    assert default_max_bucket(mk("random")) >= default_max_bucket(
        mk("variance"))
    # Differential: the same config must pack MORE runs per program
    # under its fast-path byte model than under the full-overdraw model
    # (gate forced off), for both the prefix and distinct kinds.
    fast = {s: default_max_bucket(mk(s)) for s in ("random", "margin")}
    monkeypatch.setattr(prp_mod, "fast_path_kind",
                        lambda *a, **k: None)
    for s in ("random", "margin"):
        assert fast[s] > default_max_bucket(mk(s)), s


def test_kill_switch_gates(monkeypatch):
    """MFCD_PRP_SAMPLER=0 turns every PRP gate off (trace-time read)."""
    from mfcd_tpu.sampling.prp import (proximity_prp_supported,
                                       svd_prp_supported,
                                       topk_prp_supported)

    monkeypatch.setenv("MFCD_PRP_SAMPLER", "0")
    assert not prp_supported(N, M, 16)
    assert not proximity_prp_supported(40, 220, 16)
    assert not topk_prp_supported(40, 220, 16)
    assert not svd_prp_supported(120, 120, 16)


def test_kill_switch_fallback_end_to_end():
    """With the switch off in a fresh process, sample_triplets falls back
    to the overdraw path and still hits count == target (the pre-PRP
    contract for random at this budget)."""
    import subprocess

    code = (
        "import os; os.environ['MFCD_PRP_SAMPLER']='0';"
        "os.environ['JAX_PLATFORMS']='cpu';"
        "import jax, jax.numpy as jnp, numpy as np;"
        "from mfcd_tpu.sampling import sample_triplets;"
        "out = sample_triplets(jax.random.key(1), jnp.zeros((60, 80)),"
        " 2048, strategy='random');"
        "tri = np.asarray(out.triplets); assert int(out.count) == 2048;"
        "packed = (tri[:,0]*80 + tri[:,1])*80 + tri[:,2];"
        "assert len(np.unique(packed)) == 2048;"
        "assert (tri[:,1] != tri[:,2]).all(); print('OK')"
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "OK" in r.stdout, r.stderr[-2000:]


REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_proximity_marginal_parity_vs_torch():
    """Two-sample chi-square of (u, i, j) marginals vs the reference
    proximity sampler on the same X (generation_data.py:29-43)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("scipy")
    sys.path.insert(0, REF)
    try:
        import generation_data
    finally:
        sys.path.remove(REF)
    from scipy.stats import chi2_contingency

    n, m = 40, 220  # m >= 2 * kk with the reference k=100 -> kk=100
    x_np = np.random.default_rng(9).normal(size=(n, m)).astype(np.float32)
    t = 8000
    torch.manual_seed(1)
    np.random.seed(1)
    theirs = np.asarray(generation_data.choose_items_by_proximity(
        torch.tensor(x_np), t, set()))
    ours = np.asarray(sample_triplets(
        jax.random.key(8), jnp.asarray(x_np), t, strategy="proximity"
    ).triplets)
    for col, bins, name in ((0, n, "u"), (1, m, "i"), (2, m, "j")):
        a = np.bincount(ours[:, col], minlength=bins)
        b = np.bincount(theirs[:, col], minlength=bins)
        keep = (a + b) > 0
        p = chi2_contingency(np.stack([a[keep], b[keep]])).pvalue
        assert p > 1e-3, f"{name}-marginal differs (p={p:.2e})"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_random_marginal_parity_vs_torch():
    torch = pytest.importorskip("torch")
    scipy_stats = pytest.importorskip("scipy.stats")
    sys.path.insert(0, REF)
    try:
        import generation_data
    finally:
        sys.path.remove(REF)

    t = 12000
    torch.manual_seed(0)
    theirs = np.asarray(generation_data.choose_items_random(
        torch.zeros((N, M)), t, set()))
    ours = np.asarray(prp_triplets(jax.random.key(2), N, M,
                                   jnp.arange(t, dtype=jnp.int32)))
    from scipy.stats import chi2_contingency

    for col, bins, name in ((0, N, "u"), (1, M, "i"), (2, M, "j")):
        a = np.bincount(ours[:, col], minlength=bins)
        b = np.bincount(theirs[:, col], minlength=bins)
        keep = (a + b) > 0
        p = chi2_contingency(np.stack([a[keep], b[keep]])).pvalue
        assert p > 1e-3, f"{name}-marginal differs (p={p:.2e})"
    # joint (i, j) pair marginal — catches pair-level decode bias the
    # per-column tests can't see
    a = np.bincount(ours[:, 1] * M + ours[:, 2], minlength=M * M)
    b = np.bincount(theirs[:, 1] * M + theirs[:, 2], minlength=M * M)
    keep = (a + b) > 0
    p = chi2_contingency(np.stack([a[keep], b[keep]])).pvalue
    assert p > 1e-3, f"(i,j)-joint differs (p={p:.2e})"
