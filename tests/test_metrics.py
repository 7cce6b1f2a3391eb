"""Metric-block unit tests vs numpy/scipy oracles
(reference ``structure.py:881-1127``)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import spearmanr

from mfcd_tpu.data.btl import LabeledSplit
from mfcd_tpu.eval.metrics import (
    compute_alignment_metrics,
    compute_reconstruction_error,
    evaluate_split,
    ground_truth_metrics,
)
from mfcd_tpu.models.mf import MFParams

RNG = np.random.default_rng(3)
N, M, D = 12, 17, 3


def _params_x():
    u = RNG.normal(size=(N, D)).astype(np.float32)
    v = RNG.normal(size=(M, D)).astype(np.float32)
    x = RNG.normal(size=(N, M)).astype(np.float32)
    return MFParams(jnp.asarray(u), jnp.asarray(v)), x


def test_reconstruction_error_formula():
    params, x = _params_x()
    s = 2.5
    got = float(compute_reconstruction_error(params, jnp.asarray(x), s))
    uvt = np.asarray(params.U) @ np.asarray(params.V).T
    uvt = uvt - uvt.mean(axis=0, keepdims=True)   # column-centered
    expect = np.linalg.norm(uvt - s * x) / np.linalg.norm(s * x)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_alignment_block_vs_numpy():
    params, x = _params_x()
    out = compute_alignment_metrics(params, jnp.asarray(x))

    uvt = np.asarray(params.U) @ np.asarray(params.V).T
    uvt = uvt - uvt.mean(axis=1, keepdims=True)   # row-centered
    xc = x - x.mean(axis=1, keepdims=True)

    alpha = (uvt * xc).sum() / (np.linalg.norm(uvt) ** 2 + 1e-8)
    np.testing.assert_allclose(float(out["alpha"]), alpha, rtol=1e-4)
    np.testing.assert_allclose(
        float(out["norm_ratio"]),
        np.linalg.norm(uvt) / (np.linalg.norm(xc) + 1e-8), rtol=1e-5)
    np.testing.assert_allclose(
        float(out["reconstruction_error_scaled"]),
        np.linalg.norm(alpha * uvt - xc) / (np.linalg.norm(xc) + 1e-8),
        rtol=1e-4)

    # Row-wise Pearson vs np.corrcoef.
    pearson = np.asarray(out["pearson_corr_matrix"])
    for i in range(N):
        np.testing.assert_allclose(
            pearson[i], np.corrcoef(xc[i], uvt[i])[0, 1], rtol=1e-4
        )

    # Row-wise Spearman vs scipy (continuous data: no ties).
    spear = np.asarray(out["spearman_corr_matrix"])
    for i in range(N):
        rho, _ = spearmanr(xc[i], uvt[i])
        np.testing.assert_allclose(spear[i], rho, rtol=1e-4, atol=1e-5)

    # Slopes and per-row alphas.
    slopes = np.asarray(out["slopes"])
    alphas = np.asarray(out["alpha_per_row"])
    for i in range(N):
        np.testing.assert_allclose(
            slopes[i], np.dot(xc[i], uvt[i]) / np.dot(xc[i], xc[i]), rtol=1e-4
        )
        np.testing.assert_allclose(
            alphas[i], np.dot(xc[i], uvt[i]) / np.dot(uvt[i], uvt[i]),
            rtol=1e-4
        )

    # SVD spectrum error.
    s1 = np.linalg.svd(xc, compute_uv=False)
    s2 = np.linalg.svd(uvt, compute_uv=False)
    k = min(len(s1), len(s2))
    expect = np.linalg.norm(alpha * s2[:k] - s1[:k]) / (
        np.linalg.norm(s1[:k]) + 1e-8)
    np.testing.assert_allclose(float(out["svd_error_scaled"]), expect,
                               rtol=1e-3)

    # Per-row-rescaled reconstruction error.
    adjusted = alphas[:, None] * uvt
    expect = np.linalg.norm(adjusted - xc) / (np.linalg.norm(xc) + 1e-8)
    np.testing.assert_allclose(
        float(out["reconstruction_error_scaled_per_row"]), expect, rtol=1e-4)


def _split(u, i, j, z, count=None):
    n = len(u)
    count = n if count is None else count
    valid = np.arange(n) < count
    return LabeledSplit(
        u=jnp.asarray(u, jnp.int32), i=jnp.asarray(i, jnp.int32),
        j=jnp.asarray(j, jnp.int32), z=jnp.asarray(z, jnp.float32),
        valid=jnp.asarray(valid), count=jnp.int32(count),
    )


def test_evaluate_split_batch_of_means():
    """Loss must equal torch's mean-of-batch-means with a partial last batch."""
    params, _ = _params_x()
    n_rows = 10  # batch_size 4 -> batches of 4, 4, 2
    u = RNG.integers(0, N, n_rows)
    i = RNG.integers(0, M, n_rows)
    j = (i + 1) % M
    z = RNG.integers(0, 2, n_rows).astype(np.float32)
    loss, acc = evaluate_split(params, _split(u, i, j, z), batch_size=4)

    uvt = np.asarray(params.U) @ np.asarray(params.V).T
    logits = np.array([uvt[a, b] - uvt[a, c] for a, b, c in zip(u, i, j)])
    probs = 1 / (1 + np.exp(-logits))
    bce = -(z * np.log(probs) + (1 - z) * np.log(1 - probs))
    expect_loss = np.mean([bce[0:4].mean(), bce[4:8].mean(), bce[8:10].mean()])
    np.testing.assert_allclose(float(loss), expect_loss, rtol=1e-4)

    expect_acc = np.mean((probs > 0.5) == z)
    np.testing.assert_allclose(float(acc), expect_acc, rtol=1e-6)


def test_ground_truth_metrics_mse_and_unscaled_sigmoid():
    _, x = _params_x()
    n_rows = 8
    u = RNG.integers(0, N, n_rows)
    i = RNG.integers(0, M, n_rows)
    j = (i + 2) % M
    z = RNG.integers(0, 2, n_rows).astype(np.float32)
    loss, acc = ground_truth_metrics(jnp.asarray(x), _split(u, i, j, z),
                                     batch_size=4)
    diff = np.array([x[a, b] - x[a, c] for a, b, c in zip(u, i, j)])
    prob = 1 / (1 + np.exp(-diff))          # NO scale applied (quirk)
    mse = np.mean([((prob - z) ** 2)[:4].mean(), ((prob - z) ** 2)[4:].mean()])
    np.testing.assert_allclose(float(loss), mse, rtol=1e-5)
    np.testing.assert_allclose(float(acc), np.mean((diff > 0) == z), rtol=1e-6)


def test_masked_rows_ignored():
    params, _ = _params_x()
    u = np.array([0, 1, 2, 3])
    i = np.array([0, 1, 2, 3])
    j = np.array([1, 2, 3, 4])
    z = np.array([1.0, 0.0, 1.0, 0.0], np.float32)
    full_loss, full_acc = evaluate_split(params, _split(u, i, j, z),
                                         batch_size=2)
    # Same with 2 extra invalid rows: results must not change.
    u2 = np.concatenate([u, [0, 0]])
    i2 = np.concatenate([i, [0, 0]])
    j2 = np.concatenate([j, [1, 1]])
    z2 = np.concatenate([z, [1, 1]]).astype(np.float32)
    masked_loss, masked_acc = evaluate_split(
        params, _split(u2, i2, j2, z2, count=4), batch_size=2)
    np.testing.assert_allclose(float(full_loss), float(masked_loss), rtol=1e-6)
    np.testing.assert_allclose(float(full_acc), float(masked_acc), rtol=1e-6)


def test_counting_ranks_match_stable_argsort():
    """The sort-free ranker must equal stable-argsort ordinal ranks,
    including tie-broken-by-index semantics and padded row blocks."""
    from mfcd_tpu.eval.metrics import _ranks

    def ranks_argsort(a):
        order = jnp.argsort(a, axis=1)
        ranks = jnp.zeros_like(a)
        row_idx = jnp.arange(a.shape[0])[:, None]
        col_rank = jnp.broadcast_to(
            jnp.arange(a.shape[1], dtype=a.dtype)[None, :], a.shape)
        return ranks.at[row_idx, order].set(col_rank)

    for shape, ties in [((7, 13), False), ((33, 50), True), ((16, 16), True)]:
        a = jax.random.normal(jax.random.key(sum(shape)), shape)
        if ties:
            a = jnp.round(a * 2) / 2
        np.testing.assert_array_equal(
            np.asarray(_ranks(a)), np.asarray(ranks_argsort(a)))


def test_sampled_rows_distinct():
    """The 2 inspection rows are always distinct (reference uses a
    no-replacement choice)."""
    from mfcd_tpu.core.config import RunConfig
    from mfcd_tpu.sweep.engine import run_config

    out = run_config(RunConfig(n=20, m=24, d=2, p=0.5, num_epochs=1, reps=3))
    for rep_rows in out["sampled_X_rows"]:
        r0, r1 = np.asarray(rep_rows)
        assert not np.array_equal(r0, r1)
