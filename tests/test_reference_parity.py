"""Statistical parity vs the actual reference implementation.

Runs the torch reference (mounted read-only at /root/reference) and this
framework on the same protocol and compares distribution-level outcomes —
the SURVEY §7 "seed-faithful within statistical tolerance" requirement.
RNG streams cannot match bitwise across frameworks; what must match is the
protocol: distributions, split fractions, K-semantics, optimizer math.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mirror not mounted"
)


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


CFG = dict(n=60, m=60, d=3, p=0.5, s=5.0, lr=1e-2, weight_decay=1e-5,
           num_epochs=15, K=1)


def test_matches_reference_statistics(reference):
    reps = 3
    ref_out = reference.run_experiment(device="cpu", reps=reps, **CFG)
    import mfcd_tpu

    our_out = mfcd_tpu.run_experiment(reps=reps, **CFG)

    for key, tol in [
        ("gt_accuracy", 0.06),
        ("accuracy", 0.08),
        ("reconstruction_error_scaled", 0.12),
        ("pearson_corr", 0.15),
        ("spearman_corr", 0.15),
    ]:
        ref_mean = float(np.mean(ref_out[key]))
        our_mean = float(np.mean(our_out[key]))
        assert abs(ref_mean - our_mean) < tol, (
            f"{key}: reference {ref_mean:.4f} vs ours {our_mean:.4f}"
        )

    # alpha should approximate 1/s in both (Plots.ipynb overlays 1/s).
    assert abs(np.mean(our_out["alpha"]) - np.mean(ref_out["alpha"])) < 0.1

    # Loss curves land in the same regime.
    ref_final = np.mean([t[-1] for t in ref_out["train_losses"]])
    our_final = np.mean([t[-1] for t in our_out["train_losses"]])
    assert abs(ref_final - our_final) < 0.08


def test_matches_reference_statistics_soft_k(reference):
    """Second protocol point: soft labels with K=5 redundancy."""
    reps = 3
    cfg = dict(n=50, m=50, d=2, p=0.6, s=3.0, lr=1e-2, weight_decay=1e-5,
               num_epochs=12, K=5, soft_label=True)
    ref_out = reference.run_experiment(device="cpu", reps=reps, **cfg)
    import mfcd_tpu

    our_out = mfcd_tpu.run_experiment(reps=reps, **cfg)
    for key, tol in [("gt_accuracy", 0.06), ("accuracy", 0.09),
                     ("pearson_corr", 0.2)]:
        ref_mean = float(np.mean(ref_out[key]))
        our_mean = float(np.mean(our_out[key]))
        assert abs(ref_mean - our_mean) < tol, (
            f"{key}: reference {ref_mean:.4f} vs ours {our_mean:.4f}")


def test_triplet_budget_matches_reference_formula(reference):
    """num_triplets = int(n*m*p/2) exactly (structure.py:356)."""
    from mfcd_tpu.core.config import RunConfig

    for n, m, p in [(100, 100, 0.5), (37, 53, 0.31)]:
        assert RunConfig(n=n, m=m, p=p).num_triplets == int(n * m * p / 2)
