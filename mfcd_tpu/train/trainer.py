"""On-device training loop — dynamic-bound epochs, sort-free shuffles.

Capability match for ``train_model`` (reference ``structure.py:812-878``):
per epoch, shuffle the training rows, iterate batch-size-64 minibatches,
BCE loss, Adam step; then a no-grad validation pass; per-epoch train/val
losses are means of per-batch means.  Where torch replays a host-driven
eager loop per batch, the whole multi-epoch run here is one compiled XLA
program — no host round-trips.

TPU-native design choices:
- the per-epoch shuffle carries the row stream across epochs and advances
  it with keyed prefix-preserving bijections (``mfcd_tpu.ops.shuffle``:
  periodic PRP reshuffle + cheap rotation/tile mixing) instead of an
  argsort — TPU sorts at 1e5 elements cost minutes of *compile* time per
  shape, and per-epoch element gathers dominate runtime,
- the batch loop is a ``fori_loop`` whose trip count is the *dynamic*
  ``ceil(valid_count / batch_size)`` — padded rows cost nothing, so arrays
  can be padded to coarse shape buckets and one executable serves a whole
  sparsity sweep,
- masking reproduces the DataLoader semantics exactly: batch means over
  valid rows, epoch losses averaged over the executed batches, Adam steps
  advance once per executed batch (matching ``len(loader)``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from mfcd_tpu.data.btl import LabeledSplit
from mfcd_tpu.models.mf import MFParams, forward_logits
from mfcd_tpu.ops.losses import bce_with_logits
from mfcd_tpu.ops.optim import adam_init, adam_update
from mfcd_tpu.ops.shuffle import (default_reshuffle_period, mix_stream,
                                  stream_tile_width)


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


# Batches per lax.map block in the streamed loss/eval passes.  A [rows, d]
# gather at tiny d is lane-padded d -> 128 by the TPU tiled layout (64x at
# d=2), so materializing a whole K-multiplied val/test split at once costs
# rows*512B per live gather — 8.75GB per K=50 run (observed compile OOM).
# Streaming 64-batch blocks bounds the live gather to ~6MB per run while
# keeping 4096 rows of parallelism per step.
_LOSS_BLOCK_BATCHES = 64


def map_batch_blocks(block_fn, arrays, num_batches: int,
                     block: int = _LOSS_BLOCK_BATCHES):
    """``lax.map`` over fixed-size blocks of the leading batch axis.

    ``arrays`` are [B, ...]; each is zero-padded to a multiple of ``block``
    and ``block_fn`` maps a tuple of [block, ...] slices to per-batch
    outputs [block, ...]; results are restitched to [B, ...].  Single-block
    inputs take the direct path (identical graph to the unstreamed code).
    """
    if num_batches <= block:
        return block_fn(arrays)
    pad = (-num_batches) % block

    def prep(a):
        if pad:
            a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        return a.reshape((-1, block) + a.shape[1:])

    outs = jax.lax.map(block_fn, tuple(prep(a) for a in arrays))
    return tuple(
        o.reshape((-1,) + o.shape[2:])[:num_batches] for o in outs
    )


def batch_losses(params: MFParams, split: LabeledSplit, batch_size: int):
    """Per-batch masked mean BCE + the epoch average over non-empty batches.

    Valid rows are compacted at the front of every split, so this equals
    the reference's sequential-loader mean-of-batch-means exactly.  The
    batch axis streams through ``map_batch_blocks`` so the row gathers
    never materialize a whole K-multiplied split at once.
    """
    u, i, j, z, valid = _pad_to_batches(split, batch_size)

    def block_stats(args):
        bu, bi, bj, bz, bv = args
        logits = forward_logits(params, bu, bi, bj)
        losses = bce_with_logits(logits, bz)
        return (jnp.sum(jnp.where(bv, losses, 0.0), axis=1),
                jnp.sum(bv, axis=1))

    per_batch_sum, per_batch_cnt = map_batch_blocks(
        block_stats, (u, i, j, z, valid), u.shape[0])
    nonempty = per_batch_cnt > 0
    per_batch_mean = jnp.where(
        nonempty, per_batch_sum / jnp.maximum(per_batch_cnt, 1), 0.0
    )
    epoch_mean = jnp.sum(per_batch_mean) / jnp.maximum(jnp.sum(nonempty), 1)
    return per_batch_mean, epoch_mean


@partial(jax.jit,
         static_argnames=("batch_size", "num_epochs", "reshuffle_period"))
def _train_model(
    params: MFParams,
    train: LabeledSplit,
    val: LabeledSplit,
    epochs_key: jax.Array,
    lr,
    weight_decay,
    batch_size: int,
    num_epochs: int,
    reshuffle_period: int,
) -> Tuple[MFParams, jax.Array, jax.Array]:
    rows = train.u.shape[0]
    k_bits = max(rows - 1, 1).bit_length()  # 2^k >= rows
    num_batches = -(-rows // batch_size)
    padded = num_batches * batch_size
    tile_w = stream_tile_width(batch_size)
    # Without a tile width the cheap mixing epochs would be rotation-only
    # (batches = contiguous windows of the previous order) — fall back to
    # a fresh PRP every epoch instead of silently degrading mix quality.
    period = reshuffle_period if tile_w is not None else 1

    count = train.count.astype(jnp.int32)
    num_exec = jnp.ceil(count.astype(jnp.float32) / batch_size).astype(
        jnp.int32)

    def loss_fn(p, u, i, j, z, mask):
        logits = forward_logits(p, u, i, j)
        losses = bce_with_logits(logits, z)
        cnt = jnp.sum(mask)
        loss = jnp.sum(jnp.where(mask, losses, 0.0)) / jnp.maximum(cnt, 1)
        return loss

    grad_fn = jax.value_and_grad(loss_fn)

    stream0 = tuple(
        jnp.pad(a, (0, padded - rows))
        for a in (train.u, train.i, train.j, train.z)
    )

    def epoch_step(carry, epoch_idx):
        p, opt, stream = carry
        kperm = jax.random.fold_in(epochs_key, epoch_idx)
        stream = mix_stream(stream, kperm, epoch_idx, count, k_bits,
                            period=period, tile_w=tile_w)
        su, si, sj, sz = (
            a.reshape(num_batches, batch_size) for a in stream)

        def batch_step(t, carry):
            p, opt, loss_sum = carry
            slots = t * batch_size + jnp.arange(batch_size)
            mask = slots < count  # valid rows occupy [0, count)
            loss, grads = grad_fn(p, su[t], si[t], sj[t], sz[t], mask)
            p, opt = adam_update(p, grads, opt, lr, weight_decay)
            return p, opt, loss_sum + loss

        p, opt, loss_sum = jax.lax.fori_loop(
            0, num_exec, batch_step, (p, opt, jnp.float32(0.0))
        )
        train_loss = loss_sum / jnp.maximum(num_exec, 1)
        _, val_loss = batch_losses(p, val, batch_size)
        return (p, opt, stream), (train_loss, val_loss)

    opt = adam_init(params)
    (params, _, _), (train_losses, val_losses) = jax.lax.scan(
        epoch_step, (params, opt, stream0), jnp.arange(num_epochs)
    )
    return params, train_losses, val_losses


def train_model(
    params: MFParams,
    train: LabeledSplit,
    val: LabeledSplit,
    epochs_key: jax.Array,
    lr,
    weight_decay,
    batch_size: int = 64,
    num_epochs: int = 30,
    reshuffle_period: int | None = None,
) -> Tuple[MFParams, jax.Array, jax.Array]:
    """Train and return ``(params, train_losses [E], val_losses [E])``.

    ``reshuffle_period`` (default ``MFCD_RESHUFFLE_PERIOD``, 4): every
    P-th epoch draws a fresh PRP shuffle of the carried row stream; the
    epochs between apply cheap prefix-preserving mixing (rotation +
    full-tile permutation) — see ``mfcd_tpu.ops.shuffle.mix_stream``.
    The env default is resolved HERE, outside the jit, so it is part of
    the compile-cache key (a mid-process env change is never masked by a
    stale cached executable); jitted callers must pass the period
    explicitly as a static argument for the same reason.
    """
    period = reshuffle_period or default_reshuffle_period()
    return _train_model(params, train, val, epochs_key, lr, weight_decay,
                        batch_size=batch_size, num_epochs=num_epochs,
                        reshuffle_period=period)


# Tests/probes clear the underlying jit cache through the public name.
train_model.clear_cache = _train_model.clear_cache
