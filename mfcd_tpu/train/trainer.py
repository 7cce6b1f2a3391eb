"""On-device training loop — ``lax.scan`` over epochs x minibatches.

Capability match for ``train_model`` (reference ``structure.py:812-878``):
per epoch, shuffle the training rows, iterate batch-size-64 minibatches,
BCE loss, Adam step; then a no-grad validation pass; per-epoch train/val
losses are means of per-batch means.  Where torch replays a host-driven
eager loop per batch, the whole multi-epoch run here is one compiled XLA
program with on-device shuffles — no host round-trips.

Masking rules reproducing the DataLoader semantics:
- shuffles permute only the valid rows (invalid/padding rows sort last),
- each batch mean is over its valid rows,
- epoch losses average over non-empty batches, matching
  ``total_loss / len(loader)`` (reference ``structure.py:854,867``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from mfcd_tpu.data.btl import LabeledSplit
from mfcd_tpu.models.mf import MFParams, forward_logits
from mfcd_tpu.ops.losses import bce_with_logits
from mfcd_tpu.ops.optim import AdamState, adam_init, adam_update


def _pad_to_batches(split: LabeledSplit, batch_size: int):
    """Pad row arrays to a whole number of batches; returns [B, bs] fields."""
    rows = split.u.shape[0]
    num_batches = -(-rows // batch_size)
    pad = num_batches * batch_size - rows

    def pad1(a, fill=0):
        return jnp.pad(a, (0, pad), constant_values=fill)

    u = pad1(split.u).reshape(num_batches, batch_size)
    i = pad1(split.i).reshape(num_batches, batch_size)
    j = pad1(split.j).reshape(num_batches, batch_size)
    z = pad1(split.z).reshape(num_batches, batch_size)
    valid = pad1(split.valid, False).reshape(num_batches, batch_size)
    return u, i, j, z, valid


def batch_losses(params: MFParams, split: LabeledSplit, batch_size: int):
    """Per-batch masked mean BCE + the epoch average over non-empty batches."""
    u, i, j, z, valid = _pad_to_batches(split, batch_size)
    logits = forward_logits(params, u, i, j)
    losses = bce_with_logits(logits, z)
    per_batch_sum = jnp.sum(jnp.where(valid, losses, 0.0), axis=1)
    per_batch_cnt = jnp.sum(valid, axis=1)
    nonempty = per_batch_cnt > 0
    per_batch_mean = jnp.where(
        nonempty, per_batch_sum / jnp.maximum(per_batch_cnt, 1), 0.0
    )
    epoch_mean = jnp.sum(per_batch_mean) / jnp.maximum(jnp.sum(nonempty), 1)
    return per_batch_mean, epoch_mean


@partial(jax.jit, static_argnames=("batch_size", "num_epochs"))
def train_model(
    params: MFParams,
    train: LabeledSplit,
    val: LabeledSplit,
    epochs_key: jax.Array,
    lr,
    weight_decay,
    batch_size: int = 64,
    num_epochs: int = 30,
) -> Tuple[MFParams, jax.Array, jax.Array]:
    """Train and return ``(params, train_losses [E], val_losses [E])``."""
    rows = train.u.shape[0]
    num_batches = -(-rows // batch_size)
    padded = num_batches * batch_size

    tr_u = jnp.pad(train.u, (0, padded - rows))
    tr_i = jnp.pad(train.i, (0, padded - rows))
    tr_j = jnp.pad(train.j, (0, padded - rows))
    tr_z = jnp.pad(train.z, (0, padded - rows))
    tr_valid = jnp.pad(train.valid, (0, padded - rows), constant_values=False)

    def loss_fn(p, u, i, j, z, mask):
        logits = forward_logits(p, u, i, j)
        losses = bce_with_logits(logits, z)
        cnt = jnp.sum(mask)
        loss = jnp.sum(jnp.where(mask, losses, 0.0)) / jnp.maximum(cnt, 1)
        return loss, cnt

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def epoch_step(carry, epoch_idx):
        p, opt = carry
        kperm = jax.random.fold_in(epochs_key, epoch_idx)
        # Random order among valid rows; padding/invalid rows sort last.
        sort_key = jax.random.uniform(kperm, (padded,)) + jnp.where(
            tr_valid, 0.0, 2.0
        )
        perm = jnp.argsort(sort_key).reshape(num_batches, batch_size)

        def batch_step(carry, batch_idx):
            p, opt = carry
            bu = tr_u[batch_idx]
            bi = tr_i[batch_idx]
            bj = tr_j[batch_idx]
            bz = tr_z[batch_idx]
            bm = tr_valid[batch_idx]
            (loss, cnt), grads = grad_fn(p, bu, bi, bj, bz, bm)
            nonempty = cnt > 0
            # Skip the update for fully-padded batches (only occurs when a
            # constrained sampler fell short of its budget).
            p2, opt2 = adam_update(p, grads, opt, lr, weight_decay)
            p = jax.tree.map(
                lambda a, b: jnp.where(nonempty, b, a), p, p2)
            opt = jax.tree.map(
                lambda a, b: jnp.where(nonempty, b, a), opt, opt2)
            return (p, opt), (loss, nonempty)

        (p, opt), (losses, nonempty) = jax.lax.scan(
            batch_step, (p, opt), perm)
        train_loss = jnp.sum(jnp.where(nonempty, losses, 0.0)) / jnp.maximum(
            jnp.sum(nonempty), 1
        )
        _, val_loss = batch_losses(p, val, batch_size)
        return (p, opt), (train_loss, val_loss)

    opt = adam_init(params)
    (params, _), (train_losses, val_losses) = jax.lax.scan(
        epoch_step, (params, opt), jnp.arange(num_epochs)
    )
    return params, train_losses, val_losses
