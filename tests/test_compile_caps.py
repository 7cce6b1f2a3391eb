"""Compile-capacity bucketing (VERDICT r2 item 2).

A linear sparsity scan must not pay one build-stage compile per distinct
p: array capacities round up to power-of-two buckets while each config's
exact triplet budget flows through as a traced scalar.  These tests pin

1. bit-parity with the unpadded path when the budget is already a power
   of two (the padded program with budget == capacity must be the same
   computation),
2. exact-budget semantics (count == target, split sizes from the exact
   count) when the capacity exceeds the budget,
3. that a cell-7-style (p, K) grid collapses to a handful of sample-stage
   compile keys (the expensive stage; reference sequential loop:
   ``structure.py:160-171``),
4. engine/fast-path equivalence with capping enabled.
"""

import numpy as np
import pytest

from mfcd_tpu.core.config import RunConfig, bucket_by_shape
from mfcd_tpu.sweep.engine import compile_caps, run_config


def _cfg(**kw):
    base = dict(n=64, m=64, d=2, p=0.25, s=2.0, num_epochs=3, reps=2, K=2,
                soft_label=True)
    base.update(kw)
    return RunConfig(**base)


def test_pow2_budget_bit_parity():
    # T = 64*64*0.25/2 = 512 (a power of two): capacity == budget, so the
    # padded and unpadded paths must agree bit-for-bit on every key.
    cfg = _cfg(p=0.25)
    assert compile_caps(cfg)[0] == cfg.num_triplets
    r_pad = run_config(cfg, pad_compiles=True)
    r_exact = run_config(cfg, pad_compiles=False)
    assert set(r_pad) == set(r_exact)
    for k in r_pad:
        np.testing.assert_array_equal(
            np.asarray(r_pad[k]), np.asarray(r_exact[k]), err_msg=k)


def test_padded_budget_respected():
    # T = 409 pads to a 512 capacity; counts and split sizes must follow
    # the exact budget, not the capacity.
    cfg = _cfg(p=0.2, K=1, soft_label=False)
    t_cap, _ = compile_caps(cfg)
    assert t_cap == 512 and cfg.num_triplets == 409
    res = run_config(cfg, pad_compiles=True)
    # train losses finite, accuracy sensible (not the padded-garbage 0/NaN)
    assert np.all(np.isfinite(np.asarray(res["train_losses"])))
    assert np.all(np.asarray(res["accuracy"]) > 0.3)


def test_cell7_grid_compile_key_collapse():
    """The full cell-7 (p, K) pair grid at n=m=1000 must need <= 8 distinct
    sample-stage keys (vs 63 exact budgets)."""
    target_constants = [0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.5, 1]
    possible_K = [1, 2, 3, 4, 5, 7, 10]
    pairs = []
    for c in target_constants:
        for K in possible_K:
            p = round(c / K, 5)
            if p <= 1:
                pairs.append((p, K))
    assert len(pairs) == 63
    caps = {
        compile_caps(RunConfig(n=1000, m=1000, d=2, p=p, K=K,
                               soft_label=True))[0]
        for p, K in pairs
    }
    assert len(caps) <= 8, caps
    exact = {RunConfig(n=1000, m=1000, d=2, p=p, K=K).num_triplets
             for p, K in pairs}
    assert len(exact) > 30  # the collapse is real

    # Capped bucketing groups the whole grid into few run buckets too.
    cfgs = [RunConfig(n=1000, m=1000, d=2, p=p, K=K, soft_label=True)
            for p, K in pairs]
    capped = bucket_by_shape(cfgs, capped=True)
    uncapped = bucket_by_shape(cfgs, capped=False)
    assert len(capped) < len(uncapped)


def test_cell9_and_cell18_grid_compile_key_collapse():
    """The other two p-logspace acceptance grids must collapse the same
    way (their distinct budgets span 1e-4..0.8 over 25 resp. 20 p's)."""
    import numpy as np

    # cell 9: 25 p-values x K in {1,2,3,5,10}, soft labels
    p9 = list(np.logspace(-2, np.log10(0.2), 20)) + [1e-4, 5e-3, 1e-3,
                                                     0.5, 0.8]
    cfg9 = [RunConfig(n=1000, m=1000, d=2, p=float(p), K=K,
                      soft_label=True)
            for p in p9 for K in (1, 2, 3, 5, 10)]
    caps9 = {compile_caps(c)[0] for c in cfg9}
    exact9 = {c.num_triplets for c in cfg9}
    assert len(exact9) >= 20
    assert len(caps9) <= 14, caps9  # pow-2 ladder over 1e-4..0.8

    # cell 18: 20 p-values x 7 strategies (capacity keys are per
    # (t_cap, extra_cap, strategy); here we pin the t_cap ladder)
    p18 = np.round(np.logspace(-2, np.log10(0.2), 20), 4)
    caps18 = {compile_caps(RunConfig(n=1000, m=1000, d=2, p=float(p),
                                     K=1, soft_label=True))[0]
              for p in p18}
    assert len(caps18) <= 6, caps18


def test_cell3_cell11_cell13_grid_compile_key_collapse():
    """The remaining production grids with varying p: cell 3's six
    p-values, cell 11's 99 arange-derived (p, s) pairs (the widest set of
    distinct budgets after cell 7), and cell 13's five p-values must all
    collapse onto the shared pow-2 capacity ladder."""
    from experiments.runs import ps_const_pairs

    # cell 3: p in {0.1, 0.15, 0.2, 0.25, 0.35, 0.5} (s, wd traced)
    caps3 = {compile_caps(RunConfig(n=1000, m=1000, d=2, p=p, K=1,
                                    soft_label=True))[0]
             for p in (0.1, 0.15, 0.2, 0.25, 0.35, 0.5)}
    assert len(caps3) <= 3, caps3

    # cell 11: 99 linear (p, s) pairs, p spans 0.012..0.3
    p_values, s_values = ps_const_pairs()
    assert len(p_values) == 99
    caps11 = {compile_caps(RunConfig(n=1000, m=1000, d=2, p=float(p), K=1,
                                     soft_label=True))[0]
              for p in p_values}
    exact11 = {RunConfig(n=1000, m=1000, d=2, p=float(p)).num_triplets
               for p in p_values}
    assert len(exact11) > 30  # the collapse is real
    assert len(caps11) <= 6, caps11  # pow-2 ladder 8192..262144

    # cell 13: p in {0.1, 0.2, 0.5, 0.8, 1.0} x d (d doesn't touch t_cap)
    caps13 = {compile_caps(RunConfig(n=1000, m=1000, d=d, p=p, K=1))[0]
              for p in (0.1, 0.2, 0.5, 0.8, 1.0) for d in (2, 4, 6, 8, 10)}
    assert len(caps13) <= 4, caps13


def test_fast_path_matches_sequential_with_caps():
    from mfcd_tpu.sweep.batched import parameter_scan_fast
    from mfcd_tpu.sweep.engine import parameter_scan

    kw = dict(n=48, m=48, d=2, p=[0.15, 0.2], s=[1.0, 4.0], K=1,
              num_epochs=2, reps=2, soft_label=True)
    seq = parameter_scan(**kw)
    fast = parameter_scan_fast(**kw)
    assert len(seq) == len(fast) == 4
    for a, b in zip(seq, fast):
        assert a["params"] == b["params"]
        np.testing.assert_allclose(
            np.asarray(a["results"]["accuracy"]),
            np.asarray(b["results"]["accuracy"]), rtol=0, atol=0)
        np.testing.assert_allclose(
            np.asarray(a["results"]["train_losses"]),
            np.asarray(b["results"]["train_losses"]), rtol=1e-6)


@pytest.mark.parametrize("strategy", ["margin", "svd"])
def test_budget_traced_strategies_padded_run(strategy):
    """margin / svd consume the exact budget numerically (acceptance
    window / projection rank); the padded path must still hit its target
    count on an unconstrained budget."""
    cfg = _cfg(p=0.1, K=1, soft_label=False, strategy=strategy,
               num_epochs=2, reps=1)
    res = run_config(cfg, pad_compiles=True)
    assert np.all(np.isfinite(np.asarray(res["accuracy"])))


def test_uncapped_strategies_keep_exact_capacity():
    """svd / user_similarity derive STATIC distribution parameters from
    the exact budget (projection rank; neighbor/top-set sizes, reference
    ``generation_data.py:144, 278-280``); capping would silently shift
    those away from the reference's, so compile_caps must leave them at
    exact capacity — and padded runs must equal unpadded runs exactly."""
    for strategy in ("svd", "user_similarity"):
        cfg = _cfg(p=0.2, K=1, soft_label=False, strategy=strategy,
                   num_epochs=2, reps=1)
        sh = cfg.shapes()
        assert compile_caps(cfg) == (sh.num_triplets,
                                     sh.extra_test_triplets)
        # Capped and exact signatures coincide for these strategies.
        assert (cfg.shape_signature(capped=True)
                == cfg.shape_signature(capped=False))
    # pad on/off are the same program for an uncapped strategy.
    cfg = _cfg(p=0.2, K=1, soft_label=False, strategy="svd",
               num_epochs=2, reps=1)
    r_pad = run_config(cfg, pad_compiles=True)
    r_exact = run_config(cfg, pad_compiles=False)
    for k in r_pad:
        np.testing.assert_array_equal(
            np.asarray(r_pad[k]), np.asarray(r_exact[k]), err_msg=k)


def test_svd_traced_rank_integer_exact():
    """The traced svd rank must use integer arithmetic: f32 floors one
    short at exact-integer boundaries (T=251000, n=m=1000: f32 250,
    reference 251)."""
    import jax
    import jax.numpy as jnp

    from mfcd_tpu.sampling.strategies import propose_svd, svd_rank

    n = m = 80
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, m)),
                    jnp.float32)
    # budget chosen so budget/min(n,m) is an exact integer
    budget = 40 * min(n, m)
    ref_rank = svd_rank(budget, n, m)
    assert budget // min(n, m) == ref_rank == 40
    # masked proposal with traced budget must keep all ref_rank components:
    # compare against the static-rank proposal on the same key.
    key = jax.random.key(1)
    c1, v1 = propose_svd(key, x, 500, num_triplets=budget)
    c2, v2 = propose_svd(key, x, 500, num_triplets=budget,
                         budget=jnp.int32(budget))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
