"""Distribution-level parity of the 6 remaining samplers vs the torch
reference (VERDICT r2 item 4).

``random`` and ``proximity`` are covered end-to-end by
``test_reference_parity.py``; here ``margin``, ``top_k``, ``svd``,
``popularity``, ``variance`` and ``cluster`` are compared directly against
the reference proposal distributions (``/root/reference/generation_data.py:
46-84, 87-99, 103-128, 131-179, 189-224, 229-247``) on the same X:

- *exact* membership/acceptance checks wherever the reference is
  deterministic given X (margin window, top-k sets, svd top-norm sets,
  cluster separation), and
- *two-sample chi-square* tests on the (u, i, j) marginals between ~1e4
  reference draws and ~1e4 of ours (both sides carry the same
  set-uniqueness thinning, so sampling without replacement biases them
  identically).

Documented bound: each chi-square must not reject at p < 1e-3 (fixed
seeds; false-alarm odds are per-histogram, not per-run).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfcd_tpu.sampling import sample_triplets

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mirror not mounted"
)

N, M = 60, 80
P_REJECT = 1e-3


@pytest.fixture(scope="module")
def ref_sampling():
    pytest.importorskip("torch")
    pytest.importorskip("scipy")
    pytest.importorskip("sklearn")
    sys.path.insert(0, REF)
    try:
        import generation_data  # noqa: F401
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)
    return generation_data


@pytest.fixture(scope="module")
def x_np():
    return np.random.default_rng(7).normal(size=(N, M)).astype(np.float32)


def _ours(x, t, strategy, key=0, **kw):
    out = sample_triplets(jax.random.key(key), jnp.asarray(x), t,
                          strategy=strategy, **kw)
    trips = np.asarray(out.triplets)[: int(out.count)]
    assert len(trips) > 0
    return trips


def _theirs(ref_sampling, fn_name, x, t, seed=0, **kw):
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)
    fn = getattr(ref_sampling, fn_name)
    trips = np.asarray(fn(torch.tensor(x), t, set(), **kw))
    assert len(trips) > 0
    return trips


def _chi2_two_sample(a_vals, b_vals, bins):
    """Two-sample chi-square p-value over a shared binning."""
    from scipy.stats import chi2_contingency

    a_hist = np.bincount(a_vals, minlength=bins)
    b_hist = np.bincount(b_vals, minlength=bins)
    keep = (a_hist + b_hist) > 0
    table = np.stack([a_hist[keep], b_hist[keep]])
    if table.shape[1] < 2:
        return 1.0
    return chi2_contingency(table).pvalue


def _assert_marginals_match(ours, theirs, n=N, m=M):
    for col, bins, name in ((0, n, "u"), (1, m, "i"), (2, m, "j")):
        p = _chi2_two_sample(ours[:, col], theirs[:, col], bins)
        print(f"    {name}-marginal chi2 p={p:.4f}")
        assert p > P_REJECT, f"{name}-marginal differs (p={p:.2e})"


# === MARGIN (generation_data.py:46-84) ===================================

def test_margin_parity(ref_sampling, x_np):
    # t sized so the margin window accepts ~40% of pairs (discriminative).
    # Pool 4 independent draws per side: a single without-replacement draw
    # can sit in a marginal's few-percent tail (and the reference's
    # ``np.random.default_rng()`` is unseeded, so its draw varies run to
    # run) — pooling keeps the two-sample chi-square calibrated.
    t = 1000
    ours = np.concatenate([_ours(x_np, t, "margin", key=k)
                           for k in range(4)])
    theirs = np.concatenate(
        [_theirs(ref_sampling, "choose_items_by_margin", x_np, t, seed=s)
         for s in range(4)])
    # Exact acceptance window: both sides must emit only pairs inside the
    # adaptive margin computed from the first min(10, n) rows.
    sample = x_np[: min(10, N)]
    margin = np.mean(np.max(sample, axis=1) - np.min(sample, axis=1))
    margin = margin * t / (N * M)
    for name, trips in (("ours", ours), ("ref", theirs)):
        diffs = np.abs(x_np[trips[:, 0], trips[:, 1]]
                       - x_np[trips[:, 0], trips[:, 2]])
        assert np.all(diffs <= margin + 1e-6), name
        assert np.all(trips[:, 1] != trips[:, 2]), name
    _assert_marginals_match(ours, theirs)


# === TOP-K (generation_data.py:189-224) ==================================

def test_top_k_parity(ref_sampling, x_np):
    # k = 8 here; population n*k*(k-1) = 3360 ordered pairs — t stays
    # below the without-replacement saturation knee.
    t = 1200
    k = min(M, max(5, int(0.1 * M)))
    top_sets = np.argsort(-x_np, axis=1)[:, :k]  # [n, k]
    ours = _ours(x_np, t, "top_k")
    theirs = _theirs(ref_sampling, "choose_items_top_k", x_np, t)
    # Exact membership: i and j must lie in user u's top-k set.
    for name, trips in (("ours", ours), ("ref", theirs)):
        in_i = (top_sets[trips[:, 0]] == trips[:, 1][:, None]).any(axis=1)
        in_j = (top_sets[trips[:, 0]] == trips[:, 2][:, None]).any(axis=1)
        assert np.all(in_i) and np.all(in_j), name
        assert np.all(trips[:, 1] != trips[:, 2]), name
    _assert_marginals_match(ours, theirs)


# === SVD projection (generation_data.py:131-179) =========================

def test_svd_parity(ref_sampling, x_np):
    # Budget-derived rank = t/(n*m)*max(n,m) = 40, within scipy svds'
    # k < min(n, m) requirement; top sets 18 users x 24 items.
    # Pool 3 draws per side: the reference svd sampler's
    # ``np.random.default_rng()`` is unseeded (generation_data.py:166),
    # so its draw varies run to run — same deflake as test_margin_parity.
    t = 2400
    ours = np.concatenate([_ours(x_np, t, "svd", key=k) for k in range(3)])
    theirs = np.concatenate(
        [_theirs(ref_sampling, "choose_items_by_svd_projection", x_np, t,
                 seed=s) for s in range(3)])
    # Exact top-set membership, computed independently with full numpy SVD.
    rank = int(t / (N * M) * max(N, M))
    u_f, s_f, vt_f = np.linalg.svd(x_np, full_matrices=False)
    u_proj = u_f[:, :rank] * s_f[:rank]
    v_proj = vt_f[:rank, :].T * s_f[:rank]
    top_users = set(np.argsort(np.linalg.norm(u_proj, axis=1))
                    [-max(1, int(0.3 * N)):].tolist())
    top_items = set(np.argsort(np.linalg.norm(v_proj, axis=1))
                    [-max(2, int(0.3 * M)):].tolist())
    for name, trips in (("ours", ours), ("ref", theirs)):
        assert set(trips[:, 0].tolist()) <= top_users, name
        assert set(trips[:, 1].tolist()) | set(trips[:, 2].tolist()) \
            <= top_items, name
    _assert_marginals_match(ours, theirs)


# === POPULARITY (generation_data.py:103-128) =============================

@pytest.mark.parametrize("method,alpha,t", [
    # zipf 1.5 concentrates ~40% of mass on item 0 at m=80: keep t below
    # the saturation knee so neither side grinds on tail duplicates.
    ("zipf", 1.5, 800),
    ("exponential", 0.1, 4000),
])
def test_popularity_parity(ref_sampling, x_np, method, alpha, t):
    ours = _ours(x_np, t, "popularity", popularity_method=method,
                 alpha=alpha)
    theirs = _theirs(ref_sampling, "choose_items_by_popularity", x_np, t,
                     method=method, alpha=alpha)
    _assert_marginals_match(ours, theirs)


# === VARIANCE (generation_data.py:87-99) =================================

def test_variance_parity(ref_sampling, x_np):
    t = 4000
    ours = _ours(x_np, t, "variance")
    theirs = _theirs(ref_sampling, "choose_items_by_variance", x_np, t)
    _assert_marginals_match(ours, theirs)


# === CLUSTER (generation_data.py:229-247) ================================

def test_cluster_parity(ref_sampling):
    """Items built in 10 well-separated clusters so KMeans (sklearn on the
    reference side, the jittable Lloyd here) recovers the same partition;
    the (u, i, j) marginals must then match and i/j must come from
    different true clusters."""
    rng = np.random.default_rng(11)
    n_clusters = 10
    sizes = np.array([4, 5, 6, 7, 8, 8, 9, 10, 11, 12])
    assert sizes.sum() == M
    centers = rng.normal(size=(n_clusters, N)) * 50.0
    cols, true_label = [], []
    for c, sz in enumerate(sizes):
        cols.append(centers[c][:, None]
                    + rng.normal(size=(N, sz)).astype(np.float64))
        true_label += [c] * sz
    x = np.concatenate(cols, axis=1).astype(np.float32)
    true_label = np.asarray(true_label)

    t = 4000
    ours = _ours(x, t, "cluster")
    theirs = _theirs(ref_sampling, "choose_items_cluster_based", x, t,
                     n_clusters=n_clusters)
    for name, trips in (("ours", ours), ("ref", theirs)):
        assert np.all(true_label[trips[:, 1]] != true_label[trips[:, 2]]), (
            f"{name}: i and j drawn from the same item cluster")
    _assert_marginals_match(ours, theirs, n=N, m=M)
