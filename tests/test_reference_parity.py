"""Statistical parity vs the actual reference implementation.

Runs the torch reference (mounted read-only at /root/reference) and this
framework on the same protocol and compares distribution-level outcomes —
the SURVEY §7 "seed-faithful within statistical tolerance" requirement.
RNG streams cannot match bitwise across frameworks; what must match is the
protocol: distributions, split fractions, K-semantics, optimizer math.

Five protocol points (VERDICT r1 item 5): base/random K=1, soft-label K=5,
a constrained strategy (proximity), K=10 hard labels, and a pair-mode
generator (structured).  Assertions are confidence-interval based: with
``reps`` independent repetitions per side, the difference of means is
compared against ``z``·SE(Welch) plus a small quantization floor.  The
achievable statistical bound this implies is documented in PARITY.md.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mirror not mounted"
)

REPS = 10
Z = 4.0          # conservative two-sample z bound (false-alarm ~6e-5)
FLOOR = 0.015    # metric quantization floor (1/num_test_points scale)


@pytest.fixture(scope="module")
def reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        import structure  # noqa: F401
    except Exception as e:  # missing optional dep in the image
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)
    return structure


def _ci_assert(ref_out, our_out, keys, reps=REPS, z=Z, floor=FLOOR):
    """Welch CI comparison of per-rep metric samples from both sides."""
    for key in keys:
        ref = np.asarray(ref_out[key], dtype=float)
        ours = np.asarray(our_out[key], dtype=float)
        se = np.sqrt(ref.var(ddof=1) / len(ref) + ours.var(ddof=1) / len(ours))
        bound = z * se + floor
        delta = abs(ref.mean() - ours.mean())
        print(f"    {key}: ref={ref.mean():.4f} ours={ours.mean():.4f} "
              f"|delta|={delta:.4f} bound={bound:.4f}")
        assert delta < bound, (
            f"{key}: reference {ref.mean():.4f} vs ours {ours.mean():.4f} "
            f"(|delta|={delta:.4f} exceeds z*SE+floor={bound:.4f})"
        )


def _both(reference, cfg, reps=REPS):
    ref_out = reference.run_experiment(device="cpu", reps=reps, **cfg)
    import mfcd_tpu

    our_out = mfcd_tpu.run_experiment(reps=reps, **cfg)
    return ref_out, our_out


def test_parity_p1_base_random(reference):
    """P1: canonical protocol — base generation, random strategy, K=1."""
    cfg = dict(n=60, m=60, d=3, p=0.5, s=5.0, lr=1e-2, weight_decay=1e-5,
               num_epochs=15, K=1)
    ref_out, our_out = _both(reference, cfg)
    _ci_assert(ref_out, our_out, [
        "gt_accuracy", "accuracy", "reconstruction_error_scaled",
        "pearson_corr", "spearman_corr", "alpha",
    ])
    # Loss curves land in the same regime (final-epoch train loss).
    ref_final = np.asarray([t[-1] for t in ref_out["train_losses"]], float)
    our_final = np.asarray([t[-1] for t in our_out["train_losses"]], float)
    _ci_assert({"final_train_loss": ref_final},
               {"final_train_loss": our_final}, ["final_train_loss"])


def test_parity_p2_soft_k5(reference):
    """P2: soft labels with K=5 redundancy."""
    cfg = dict(n=50, m=50, d=2, p=0.6, s=3.0, lr=1e-2, weight_decay=1e-5,
               num_epochs=12, K=5, soft_label=True)
    ref_out, our_out = _both(reference, cfg)
    _ci_assert(ref_out, our_out, ["gt_accuracy", "accuracy", "pearson_corr"])


def test_parity_p3_proximity_strategy(reference):
    """P3: a constrained sampler (proximity top-k/bottom-k pairs)."""
    cfg = dict(n=60, m=60, d=3, p=0.4, s=5.0, lr=1e-2, weight_decay=1e-5,
               num_epochs=12, K=1, strategy="proximity")
    ref_out, our_out = _both(reference, cfg)
    _ci_assert(ref_out, our_out, ["gt_accuracy", "accuracy", "pearson_corr"])


def test_parity_p4_hard_k10(reference):
    """P4: K=10 hard labels (each triplet contributes 10 vote rows)."""
    cfg = dict(n=50, m=50, d=2, p=0.3, s=5.0, lr=1e-2, weight_decay=1e-5,
               num_epochs=12, K=10)
    ref_out, our_out = _both(reference, cfg)
    _ci_assert(ref_out, our_out, ["gt_accuracy", "accuracy", "alpha"])


def test_parity_p5_structured_generation(reference):
    """P5: a pair-mode generator (structured U,Vᵀ latent clusters)."""
    cfg = dict(n=60, m=60, d=3, p=0.5, s=5.0, lr=1e-2, weight_decay=1e-5,
               num_epochs=12, K=1, generation="structured")
    ref_out, our_out = _both(reference, cfg)
    _ci_assert(ref_out, our_out, ["gt_accuracy", "accuracy"])


def test_parity_p6_margin_strategy(reference):
    """P6: margin sampler end-to-end (data-dependent acceptance window +
    PRP-distinct proposals; VERDICT r3 weak #3 — the protocol points
    omitted margin)."""
    cfg = dict(n=60, m=80, d=3, p=0.4, s=5.0, lr=1e-2, weight_decay=1e-5,
               num_epochs=12, K=1, strategy="margin")
    ref_out, our_out = _both(reference, cfg)
    _ci_assert(ref_out, our_out, ["gt_accuracy", "accuracy", "pearson_corr"])


def test_parity_p7_popularity_strategy(reference):
    """P7: popularity (zipf) sampler end-to-end — a non-uniform-proposal
    strategy that keeps the overdraw/dedup path."""
    cfg = dict(n=60, m=60, d=3, p=0.4, s=5.0, lr=1e-2, weight_decay=1e-5,
               num_epochs=12, K=1, strategy="popularity",
               popularity_method="zipf", alpha=1.5)
    ref_out, our_out = _both(reference, cfg)
    _ci_assert(ref_out, our_out, ["gt_accuracy", "accuracy", "pearson_corr"])


def test_parity_p8_svd_strategy(reference):
    """P8: svd sampler end-to-end (truncated-SVD importance projection;
    the last strategy family the protocol points did not cover —
    VERDICT r3 weak #3)."""
    cfg = dict(n=60, m=60, d=3, p=0.4, s=5.0, lr=1e-2, weight_decay=1e-5,
               num_epochs=12, K=1, strategy="svd")
    ref_out, our_out = _both(reference, cfg)
    _ci_assert(ref_out, our_out, ["gt_accuracy", "accuracy", "pearson_corr"])


def test_parity_p9_top_k_strategy(reference):
    """P9: top_k sampler end-to-end (popular-item prefix domain)."""
    cfg = dict(n=60, m=60, d=3, p=0.4, s=5.0, lr=1e-2, weight_decay=1e-5,
               num_epochs=12, K=1, strategy="top_k")
    ref_out, our_out = _both(reference, cfg)
    _ci_assert(ref_out, our_out, ["gt_accuracy", "accuracy", "pearson_corr"])


def test_parity_p10_variance_strategy(reference):
    """P10: variance sampler end-to-end (high-variance item proposals)."""
    cfg = dict(n=60, m=60, d=3, p=0.4, s=5.0, lr=1e-2, weight_decay=1e-5,
               num_epochs=12, K=1, strategy="variance")
    ref_out, our_out = _both(reference, cfg)
    _ci_assert(ref_out, our_out, ["gt_accuracy", "accuracy", "pearson_corr"])


def test_parity_p11_cluster_strategy(reference):
    """P11: cluster sampler end-to-end (item-cluster contrastive pairs)."""
    cfg = dict(n=60, m=60, d=3, p=0.4, s=5.0, lr=1e-2, weight_decay=1e-5,
               num_epochs=12, K=1, strategy="cluster")
    ref_out, our_out = _both(reference, cfg)
    _ci_assert(ref_out, our_out, ["gt_accuracy", "accuracy", "pearson_corr"])


def test_parity_p12_user_similarity_strategy(reference):
    """P12: user_similarity sampler end-to-end (neighbor difference-set
    mixture) — completes end-to-end coverage of all 9 strategies."""
    cfg = dict(n=60, m=60, d=3, p=0.4, s=5.0, lr=1e-2, weight_decay=1e-5,
               num_epochs=12, K=1, strategy="user_similarity")
    ref_out, our_out = _both(reference, cfg)
    _ci_assert(ref_out, our_out, ["gt_accuracy", "accuracy", "pearson_corr"])


@pytest.mark.parametrize("mode", [
    "low_rank", "svd", "correlated", "social", "temporal",
    "hierarchical", "gmm", "clustered",
])
def test_parity_generation_modes(reference, mode):
    """G-series: every remaining ground-truth generator end-to-end vs the
    reference (base and structured are P1/P5) — with P1-P12 this makes
    all runnable generation modes and all 9 strategies
    reference-validated.  ("graph" is excluded: the reference's own
    generator cannot run — see test_graph_mode_reference_is_broken.)"""
    cfg = dict(n=60, m=60, d=3, p=0.4, s=5.0, lr=1e-2, weight_decay=1e-5,
               num_epochs=12, K=1, generation=mode)
    ref_out, our_out = _both(reference, cfg)
    _ci_assert(ref_out, our_out, ["gt_accuracy", "accuracy"])


def test_graph_mode_reference_is_broken(reference):
    """The reference's generate_graph_embeddings is unrunnable at EVERY d:
    the ``noise=0.1,`` trailing comma (generation_data.py:565) makes
    ``noise`` a 1-tuple, and ``tuple * tensor`` raises TypeError at the
    noise-padding concat (:577) — SURVEY.md §2.1 quirk.  No end-to-end
    reference comparison is possible; our graphs.py implements the
    documented intent (Watts–Strogatz smoothing, noise padding, V/sqrt(d))
    with the bug fixed, and must run end-to-end."""
    import torch

    sys.path.insert(0, REF)
    try:
        import generation_data as gd
    finally:
        sys.path.remove(REF)
    for d in (1, 2, 3):
        with pytest.raises(TypeError):
            gd.generate_graph_embeddings(30, 30, d)
    import mfcd_tpu

    out = mfcd_tpu.run_experiment(
        n=60, m=60, d=3, p=0.4, s=5.0, lr=1e-2, weight_decay=1e-5,
        num_epochs=12, K=1, reps=3, generation="graph")
    gt = np.asarray(out["gt_accuracy"], float)
    assert np.all((gt > 0.5) & (gt <= 1.0)), gt


def test_triplet_budget_matches_reference_formula(reference):
    """num_triplets = int(n*m*p/2) exactly (structure.py:356)."""
    from mfcd_tpu.core.config import RunConfig

    for n, m, p in [(100, 100, 0.5), (37, 53, 0.31)]:
        assert RunConfig(n=n, m=m, p=p).num_triplets == int(n * m * p / 2)
