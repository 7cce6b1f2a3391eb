"""Exact differential test of the metric block vs the torch reference.

Identical trained factors (U, V), ground-truth X, noise scale s, and test
rows through both metric stacks: the reference's ``evaluate_model`` /
``compute_reconstruction_error`` / ``compute_alpha_and_norm_ratios`` /
``compute_ground_truth_metrics`` (``structure.py:881-1127``) vs this
framework's fused on-device block (``mfcd_tpu/eval/metrics.py``).  Every
deterministically-comparable output must agree to float tolerance; the
only algorithmically different path (the randomized-subspace singular
spectrum vs two full LAPACK SVDs) gets its own looser bound.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mirror not mounted"
)

N, M, D = 45, 55, 3
TEST_ROWS = 600
S = 4.0


@pytest.fixture(scope="module")
def reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        import structure  # noqa: F401
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)
    return structure


def test_metrics_match_reference_exactly(reference):
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    import jax.numpy as jnp

    from mfcd_tpu.data.btl import LabeledSplit
    from mfcd_tpu.eval.metrics import (
        compute_alignment_metrics,
        compute_reconstruction_error,
        evaluate_split,
        ground_truth_metrics,
    )
    from mfcd_tpu.models.mf import MFParams

    rng = np.random.default_rng(11)
    # Train-ish factors: correlated with X so the metrics are non-trivial.
    X = rng.standard_normal((N, M)).astype(np.float32)
    U = (rng.standard_normal((N, D)) / np.sqrt(D)).astype(np.float32)
    V = (rng.standard_normal((M, D)) / np.sqrt(D)).astype(np.float32)
    X = (0.6 * (U @ V.T) + 0.4 * X).astype(np.float32)

    u = rng.integers(0, N, TEST_ROWS).astype(np.int32)
    i = rng.integers(0, M, TEST_ROWS).astype(np.int32)
    j = rng.integers(0, M, TEST_ROWS).astype(np.int32)
    j = np.where(j == i, (j + 1) % M, j).astype(np.int32)
    z = rng.integers(0, 2, TEST_ROWS).astype(np.float32)

    # --- reference side -------------------------------------------------
    model = reference.MatrixFactorization(N, M, D)
    with torch.no_grad():
        model.U.copy_(torch.from_numpy(U))
        model.V.copy_(torch.from_numpy(V))
    loader = DataLoader(
        TensorDataset(torch.from_numpy(u.astype(np.int64)),
                      torch.from_numpy(i.astype(np.int64)),
                      torch.from_numpy(j.astype(np.int64)),
                      torch.from_numpy(z)),
        batch_size=64, shuffle=False)
    Xt = torch.from_numpy(X)
    ref_loss, ref_acc = reference.evaluate_model(model, loader, "cpu")
    ref_rec = reference.compute_reconstruction_error(model, Xt, S)
    (ref_alpha, ref_norm_x, ref_norm_ratio, ref_rec_scaled, ref_p_mean,
     ref_p_std, ref_sp_mean, ref_sp_std, ref_svd_err, ref_slopes,
     ref_corrs, ref_spear, ref_rec_per_row, ref_alpha_rows
     ) = reference.compute_alpha_and_norm_ratios(model, Xt)
    ref_gt_loss, ref_gt_acc = reference.compute_ground_truth_metrics(
        loader, Xt, "cpu")

    # --- our side -------------------------------------------------------
    params = MFParams(U=jnp.asarray(U), V=jnp.asarray(V))
    split = LabeledSplit(
        u=jnp.asarray(u), i=jnp.asarray(i), j=jnp.asarray(j),
        z=jnp.asarray(z), valid=jnp.ones(TEST_ROWS, bool),
        count=jnp.int32(TEST_ROWS))
    x = jnp.asarray(X)
    our_loss, our_acc = evaluate_split(params, split)
    our_gt_loss, our_gt_acc = ground_truth_metrics(x, split)
    our_rec = compute_reconstruction_error(params, x, S)
    out = compute_alignment_metrics(params, x)

    def close(name, ours, ref, atol):
        ours, ref = float(ours), float(ref)
        print(f"{name}: ours={ours:.6f} ref={ref:.6f} |d|={abs(ours-ref):.2e}")
        assert abs(ours - ref) < atol, name

    close("test_loss", our_loss, ref_loss, 1e-5)
    close("accuracy", our_acc, ref_acc, 1e-6)
    close("gt_loss", our_gt_loss, ref_gt_loss, 1e-5)
    close("gt_accuracy", our_gt_acc, ref_gt_acc, 1e-6)
    close("reconstruction_errors", our_rec, ref_rec, 1e-5)
    close("alpha", out["alpha"], ref_alpha, 1e-5)
    close("norm_X", out["norm_X"], ref_norm_x, 1e-3)
    close("norm_ratio", out["norm_ratio"], ref_norm_ratio, 1e-5)
    close("rec_scaled", out["reconstruction_error_scaled"],
          ref_rec_scaled, 1e-5)
    close("pearson_corr", out["pearson_corr"], ref_p_mean, 1e-5)
    close("pearson_std", out["pearson_std"], ref_p_std, 1e-5)
    close("spearman_corr", out["spearman_corr"], ref_sp_mean, 1e-5)
    close("spearman_std", out["spearman_std"], ref_sp_std, 1e-5)
    close("rec_per_row", out["reconstruction_error_scaled_per_row"],
          ref_rec_per_row, 1e-5)
    # Randomized-subspace spectrum vs full SVD: algorithmically different,
    # must agree to the subspace-iteration tolerance.
    close("svd_error_scaled", out["svd_error_scaled"], ref_svd_err, 2e-3)

    # Per-row vectors (reference drops rows with std <= 1e-8; continuous
    # random X has none, so masks are all-true here).
    np.testing.assert_allclose(
        np.asarray(out["slopes"]), np.asarray(ref_slopes), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["pearson_corr_matrix"]), np.asarray(ref_corrs),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["spearman_corr_matrix"]), np.asarray(ref_spear),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["alpha_per_row"]), np.asarray(ref_alpha_rows),
        atol=1e-5)
    assert bool(np.all(np.asarray(out["pearson_mask"])))
