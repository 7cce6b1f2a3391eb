"""Fused on-device evaluation — every metric of the reference's 22-key schema.

Capability match for ``evaluate_model`` / ``compute_reconstruction_error`` /
``compute_alpha_and_norm_ratios`` / ``compute_ground_truth_metrics``
(reference ``structure.py:881-1127``), with the reference's quirks preserved:

- ``reconstruction_errors`` **column-centers** UV^T (``structure.py:943``)
  while the scaled-alignment family **row-centers** both matrices
  (``structure.py:985-987``) — the asymmetry is intentional,
- ground-truth loss is **MSE** (not BCE) between ``sigmoid(X[u,i]-X[u,j])``
  (NO scale ``s`` applied) and labels drawn *with* scale
  (``structure.py:1108-1115``),
- ground-truth accuracy thresholds ``diff > 0`` (``structure.py:1118``),
- per-row Pearson/Spearman/slopes silently skip near-constant rows
  (std <= 1e-8, ``structure.py:1006,1027,1043``) — here masked, exported
  as ragged lists,
- test loss/accuracy are mean-of-batch-means / correct-over-total
  (``structure.py:909-921``).

Spearman rank correlation uses ordinal ranks computed sort-free (counting
comparisons on the VPU — XLA sorts cost minutes of TPU compile per shape);
for continuous X ties have measure zero, so this matches scipy's
tie-averaged ranks (the difference is documented and covered by tests).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from mfcd_tpu.data.btl import LabeledSplit
from mfcd_tpu.models.mf import MFParams, forward_logits
from mfcd_tpu.ops.linalg import top_singular_values
from mfcd_tpu.ops.losses import bce_with_logits
from mfcd_tpu.train.trainer import (
    _pad_to_batches,
    batch_losses,
    map_batch_blocks,
)

_EPS = 1e-8


def evaluate_split(
    params: MFParams, split: LabeledSplit, batch_size: int = 64
) -> Tuple[jax.Array, jax.Array]:
    """Test BCE (mean of per-batch means, via the trainer's batch_losses so
    the convention lives in one place) + accuracy at threshold 0.5
    (reference ``structure.py:881-921``).  Row gathers stream in batch
    blocks (``map_batch_blocks``) — a K-multiplied test split never
    materializes its lane-padded [rows, d] gather at once."""
    _, loss = batch_losses(params, split, batch_size)

    u, i, j, z, valid = _pad_to_batches(split, batch_size)

    def block_stats(args):
        bu, bi, bj, bz, bv = args
        logits = forward_logits(params, bu, bi, bj)
        pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        return (jnp.sum(jnp.where(bv, (pred == bz).astype(jnp.float32), 0.0),
                        axis=1),
                jnp.sum(bv, axis=1))

    correct_b, cnt_b = map_batch_blocks(
        block_stats, (u, i, j, z, valid), u.shape[0])
    correct = jnp.sum(correct_b)
    total = jnp.sum(cnt_b)
    acc = jnp.where(total > 0, correct / jnp.maximum(total, 1), 0.0)
    return loss, acc


def ground_truth_metrics(
    x: jax.Array, split: LabeledSplit, batch_size: int = 64
) -> Tuple[jax.Array, jax.Array]:
    """GT oracle on the test split: MSE of unscaled sigmoid probabilities
    (mean of batch means) + diff>0 accuracy (reference
    ``structure.py:1085-1127``)."""
    u, i, j, z, valid = _pad_to_batches(split, batch_size)
    diff = x[u, i] - x[u, j]
    prob = jax.nn.sigmoid(diff)  # NB: no scale factor — reference quirk
    sq = (prob - z) ** 2
    per_sum = jnp.sum(jnp.where(valid, sq, 0.0), axis=1)
    per_cnt = jnp.sum(valid, axis=1)
    nonempty = per_cnt > 0
    per_mean = jnp.where(nonempty, per_sum / jnp.maximum(per_cnt, 1), 0.0)
    loss = jnp.sum(per_mean) / jnp.maximum(jnp.sum(nonempty), 1)

    pred = (diff > 0).astype(jnp.float32)
    correct = jnp.sum(jnp.where(valid, (pred == z).astype(jnp.float32), 0.0))
    total = jnp.sum(valid)
    acc = jnp.where(total > 0, correct / jnp.maximum(total, 1), 0.0)
    return loss, acc


def compute_reconstruction_error(params: MFParams, x: jax.Array, s) -> jax.Array:
    """``||col_center(UV^T) - s X||_F / ||s X||_F``
    (reference ``structure.py:925-955``)."""
    uvt = params.U @ params.V.T
    uvt = uvt - jnp.mean(uvt, axis=0, keepdims=True)
    target = s * x
    return jnp.linalg.norm(uvt - target) / jnp.linalg.norm(target)


def _row_std(a: jax.Array) -> jax.Array:
    return jnp.std(a, axis=1)


def _rowwise_pearson(xc: jax.Array, uc: jax.Array) -> jax.Array:
    """Pearson per row for row-centered inputs."""
    num = jnp.sum(xc * uc, axis=1)
    den = jnp.sqrt(jnp.sum(xc**2, axis=1) * jnp.sum(uc**2, axis=1))
    return num / jnp.maximum(den, 1e-30)


# Row-block budget for the counting ranker: [block, m, m] comparison cubes
# live at a time; the block shrinks with m so the cube stays ~16M elements
# (16 x 1000 x 1000 bools = 16MB per vmapped run at the canonical size, one
# row per step at m = 10,000).
_RANK_CUBE_ELEMS = 16 * 1000 * 1000


def _ranks(a: jax.Array) -> jax.Array:
    """Ordinal ranks per row (ties broken by index), sort-free.

    rank_i = #{j : a_j < a_i} + #{j < i : a_j == a_i} — identical to the
    stable argsort-scatter construction, but built from VPU comparisons so
    no XLA sort is emitted (TPU sorts cost minutes of compile per shape;
    this was the dominant per-bucket compile cost, VERDICT r1 item 6).
    The row axis streams through ``lax.map`` in fixed blocks to bound the
    [block, m, m] comparison cube.
    """
    n_rows, m = a.shape
    col_lt = (jnp.arange(m)[None, :] < jnp.arange(m)[:, None])  # j < i

    def block_ranks(rows):                                       # [B, m]
        ai = rows[:, :, None]                                    # value at i
        aj = rows[:, None, :]                                    # value at j
        cnt = jnp.sum(
            (ai > aj) | ((ai == aj) & col_lt[None]), axis=2,
            dtype=jnp.int32,
        )
        return cnt.astype(a.dtype)

    block = min(max(1, _RANK_CUBE_ELEMS // (m * m)), n_rows)
    pad = (-n_rows) % block
    padded = jnp.pad(a, ((0, pad), (0, 0))) if pad else a
    out = jax.lax.map(block_ranks, padded.reshape(-1, block, m))
    return out.reshape(-1, m)[:n_rows]


def _masked_mean_std(vals: jax.Array, mask: jax.Array):
    cnt = jnp.sum(mask)
    mean = jnp.where(
        cnt > 0, jnp.sum(jnp.where(mask, vals, 0.0)) / jnp.maximum(cnt, 1), 0.0
    )
    var = jnp.where(
        cnt > 0,
        jnp.sum(jnp.where(mask, (vals - mean) ** 2, 0.0)) / jnp.maximum(cnt, 1),
        0.0,
    )
    return mean, jnp.sqrt(var)


def compute_alignment_metrics(
    params: MFParams, x_init: jax.Array,
    spectrum_key: jax.Array | None = None,
) -> Dict:
    """The fused 14-output alignment block
    (reference ``structure.py:958-1082``).

    ``spectrum_key`` seeds the randomized subspace probe of X's top
    singular values (deterministic given the key).
    """
    if spectrum_key is None:
        spectrum_key = jax.random.key(0)
    uvt = params.U @ params.V.T
    uvt = uvt - jnp.mean(uvt, axis=1, keepdims=True)   # row-center
    x = x_init - jnp.mean(x_init, axis=1, keepdims=True)

    dot = jnp.sum(uvt * x)
    norm_uvt = jnp.linalg.norm(uvt)
    norm_x = jnp.linalg.norm(x)
    alpha = dot / (norm_uvt**2 + _EPS)
    norm_ratio = norm_uvt / (norm_x + _EPS)
    rec_scaled = jnp.linalg.norm(alpha * uvt - x) / (norm_x + _EPS)

    std_x = _row_std(x)
    std_u = _row_std(uvt)
    corr_mask = (std_x > _EPS) & (std_u > _EPS)

    # Per-row Pearson (rows are already row-centered).
    pearson = _rowwise_pearson(x, uvt)
    pearson_mean, pearson_std = _masked_mean_std(pearson, corr_mask)

    # Per-row Spearman = Pearson on ranks.
    rx = _ranks(x)
    ru = _ranks(uvt)
    rxc = rx - jnp.mean(rx, axis=1, keepdims=True)
    ruc = ru - jnp.mean(ru, axis=1, keepdims=True)
    spearman = _rowwise_pearson(rxc, ruc)
    spearman_mean, spearman_std = _masked_mean_std(spearman, corr_mask)

    # Singular-spectrum error on the centered matrices
    # (reference ``structure.py:1012-1017``), without any full n x m SVD
    # (the reference pays two full LAPACK SVDs per repetition):
    # - the row-centered UV^T equals U (V - v_bar)^T and has rank <= d, so
    #   its spectrum S2 comes *exactly* from two thin QRs + a d x d SVD;
    # - S2 is zero past position d, so the error decomposes exactly as
    #     ||a S2 - S1||^2 = sum_{i<=d} (a s2_i - s1_i)^2
    #                       + (||X||_F^2 - sum_{i<=d} s1_i^2)
    #   and ||S1||_2 = ||X||_F — only the top-d values of S1 are needed,
    #   obtained by randomized subspace iteration (MXU matmuls).
    v_centered = params.V - jnp.mean(params.V, axis=0, keepdims=True)
    _, r_u = jnp.linalg.qr(params.U)
    _, r_v = jnp.linalg.qr(v_centered)
    s2_d = jnp.linalg.svd(r_u @ r_v.T, compute_uv=False)
    d_rank = s2_d.shape[0]
    q = min(d_rank + 10, min(x.shape))
    s1_top = top_singular_values(x, q, spectrum_key)[:d_rank]
    fro2 = jnp.sum(x * x)
    head = jnp.sum((alpha * s2_d - s1_top) ** 2)
    tail = jnp.maximum(fro2 - jnp.sum(s1_top**2), 0.0)
    svd_error = jnp.sqrt(head + tail) / (jnp.sqrt(fro2) + _EPS)

    # Per-row regression slopes <x,u>/<x,x> (reference ``:1037-1045``).
    xx = jnp.sum(x * x, axis=1)
    xu = jnp.sum(x * uvt, axis=1)
    slopes = xu / jnp.maximum(xx, 1e-30)
    slopes_mask = (xx > _EPS) & (std_u > _EPS)

    # Per-row optimal alpha_i and the per-row-rescaled error
    # (reference ``:1047-1064``): every row kept, 0.0 when degenerate.
    uu = jnp.sum(uvt * uvt, axis=1)
    alpha_per_row = jnp.where(uu > _EPS, xu / jnp.maximum(uu, 1e-30), 0.0)
    adjusted = alpha_per_row[:, None] * uvt
    rec_per_row = jnp.linalg.norm(adjusted - x) / (norm_x + _EPS)

    return {
        "alpha": alpha,
        "norm_X": norm_x,
        "norm_ratio": norm_ratio,
        "reconstruction_error_scaled": rec_scaled,
        "pearson_corr": pearson_mean,
        "pearson_std": pearson_std,
        "spearman_corr": spearman_mean,
        "spearman_std": spearman_std,
        "svd_error_scaled": svd_error,
        "slopes": slopes,
        "slopes_mask": slopes_mask,
        "pearson_corr_matrix": pearson,
        "pearson_mask": corr_mask,
        "spearman_corr_matrix": spearman,
        "spearman_mask": corr_mask,
        "reconstruction_error_scaled_per_row": rec_per_row,
        "alpha_per_row": alpha_per_row,
    }


@partial(jax.jit, static_argnames=("batch_size",))
def compute_all_metrics(
    params: MFParams,
    x: jax.Array,
    s,
    test: LabeledSplit,
    rows_key: jax.Array,
    batch_size: int = 64,
) -> Dict:
    """Everything ``run_experiment`` records per repetition
    (reference ``structure.py:375-417``) in one fused program."""
    test_loss, test_acc = evaluate_split(params, test, batch_size)
    gt_loss, gt_acc = ground_truth_metrics(x, test, batch_size)
    rec_err = compute_reconstruction_error(params, x, s)
    k_rows, k_spec = jax.random.split(rows_key)
    out = compute_alignment_metrics(params, x, spectrum_key=k_spec)

    # 2 random rows for visual inspection (reference ``structure.py:388-392``).
    # Uniform distinct pair without a permutation (sorts cost compile time).
    uvt_full = params.U @ params.V.T
    kr0, kr1 = jax.random.split(k_rows)
    r0 = jax.random.randint(kr0, (), 0, x.shape[0])
    r1 = jax.random.randint(kr1, (), 0, x.shape[0] - 1)
    r1 = r1 + (r1 >= r0).astype(r1.dtype)
    rand = jnp.stack([r0, r1])
    out.update(
        {
            "accuracy": test_acc,
            "log_likelihoods": -test_loss,
            "gt_log_likelihoods": -gt_loss,
            "gt_accuracy": gt_acc,
            "reconstruction_errors": rec_err,
            "sampled_X_rows": x[rand],
            "sampled_UVT_rows": uvt_full[rand],
        }
    )
    return out
