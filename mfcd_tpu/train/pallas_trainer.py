"""Pallas-backed multi-run trainer — fused epochs, VMEM-resident state.

Drop-in alternative to :func:`mfcd_tpu.train.trainer.train_model` that
trains a whole stack of runs (configs x reps flattened to one leading axis)
with one Pallas kernel launch per epoch (see
:func:`mfcd_tpu.ops.kernels.pallas_train_epoch`).  Semantics are identical
to the jnp trainer — same keyed-bijection shuffles, same dynamic batch trip
counts, same batch means, same coupled-wd Adam — verified by equivalence
tests (interpret mode on CPU).

Epoch flow (inside one ``lax.scan`` over epochs):
  1. advance the carried (packed) row stream by one epoch's bijection
     (``mfcd_tpu.ops.shuffle.mix_stream``): a fresh PRP element gather
     every ``reshuffle_period``-th epoch, cheap prefix rotation +
     full-tile permutation in between (~8x less gather latency),
  2. one ``pallas_train_epoch`` call trains every run's epoch on-chip,
     streaming the *packed* rows into VMEM and unpacking them in-registers
     (no unpacked batch tensors ever touch HBM), executing only the
     ceil(count/bs) batches that hold valid rows,
  3. a vectorized masked validation pass records the per-epoch val loss.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

import os

from mfcd_tpu.data.btl import LabeledSplit
from mfcd_tpu.models.mf import MFParams
from mfcd_tpu.ops.kernels import EpochState, pallas_train_epoch
from mfcd_tpu.ops.shuffle import (default_reshuffle_period, mix_stream,
                                  stream_tile_width)
from mfcd_tpu.train.trainer import batch_losses


def _pack_spec(n: int, m: int, label_denom: int):
    """How to pack a (u, i, j, z) row into int32 words for the per-epoch
    permuted gather.

    TPU 1D gathers cost ~1.2 ms per 1e5-element array (measured), and the
    epoch shuffle gathers 4 row arrays 30x per run — the single largest
    non-kernel cost of a training run (54% of the train stage).  Packing
    the row into one int32 turns that into ONE gather (+ cheap VPU
    unpacking), 2.4x faster, with bit-identical semantics: the integer
    fields are exact, and the label is stored as its vote numerator k
    (z = k / label_denom reproduces the original f32 exactly).

    Returns ("full" | "uij" | "none", bits_n, bits_m, bits_z):
      full — u, i, j and the z numerator fit in 31 bits: 1 gather;
      uij  — only u, i, j fit: 2 gathers (packed ints + f32 z);
      none — shapes too large: legacy 4-gather path.
    """
    bits_n = max((n - 1).bit_length(), 1)
    bits_m = max((m - 1).bit_length(), 1)
    bits_z = max(int(label_denom).bit_length(), 1)
    if bits_n + 2 * bits_m + bits_z <= 31:
        return "full", bits_n, bits_m, bits_z
    if bits_n + 2 * bits_m <= 31:
        return "uij", bits_n, bits_m, 0
    return "none", 0, 0, 0


@partial(
    jax.jit,
    static_argnames=("batch_size", "num_epochs", "label_denom", "interpret",
                     "reshuffle_period"),
)
def _train_runs_pallas(
    params: MFParams,          # U [R, n, d], V [R, m, d]
    train: LabeledSplit,       # fields [R, N]
    val: LabeledSplit,         # fields [R, Nv]
    epochs_keys: jax.Array,    # [R] PRNG keys
    lr: jax.Array,             # [R]
    weight_decay: jax.Array,   # [R]
    batch_size: int,
    num_epochs: int,
    label_denom: int,
    interpret: bool,
    reshuffle_period: int,
) -> Tuple[MFParams, jax.Array, jax.Array]:
    r, n, d = params.U.shape
    m = params.V.shape[1]
    rows = train.u.shape[1]
    num_batches = -(-rows // batch_size)
    padded = num_batches * batch_size
    k_bits = max(rows - 1, 1).bit_length()
    tile_w = stream_tile_width(batch_size)
    # No tile width -> rotation-only cheap epochs; fall back to a fresh
    # PRP every epoch (mirrors trainer._train_model).
    period = reshuffle_period if tile_w is not None else 1

    state = EpochState(
        u_t=jnp.swapaxes(params.U, 1, 2),
        v_t=jnp.swapaxes(params.V, 1, 2),
        mu_u=jnp.zeros((r, d, n), jnp.float32),
        nu_u=jnp.zeros((r, d, n), jnp.float32),
        mu_v=jnp.zeros((r, d, m), jnp.float32),
        nu_v=jnp.zeros((r, d, m), jnp.float32),
    )

    count = train.count.astype(jnp.int32)                      # [R]
    nonempty_batches = jnp.ceil(
        count.astype(jnp.float32) / batch_size)                # [R]
    lr = lr.astype(jnp.float32)
    wd = weight_decay.astype(jnp.float32)

    pack = _pack_spec(n, m, label_denom)
    pack_mode, bits_n, bits_m, _ = pack
    rshape = (r, num_batches, batch_size)
    pad2 = lambda a: jnp.pad(a, ((0, 0), (0, padded - rows)))
    if pack_mode != "none":
        uij_packed = (
            train.u
            | (train.i << bits_n)
            | (train.j << (bits_n + bits_m))
        )
    if pack_mode == "full":
        z_num = jnp.round(train.z * float(label_denom)).astype(jnp.int32)
        stream0 = (pad2(uij_packed | (z_num << (bits_n + 2 * bits_m))),)
    elif pack_mode == "uij":
        stream0 = (pad2(uij_packed), pad2(train.z))
    else:
        stream0 = (pad2(train.u), pad2(train.i), pad2(train.j),
                   pad2(train.z))
    # The kernel unpacks rows in-registers (pack= below), so the stream
    # tuple goes to the device verbatim — no unpacked [R, B, bs] batch
    # tensors are ever materialized in HBM.
    kernel_pack = (*pack, label_denom)

    def epoch_step(carry, epoch_idx):
        state, stream = carry
        keys = jax.vmap(lambda k: jax.random.fold_in(k, epoch_idx))(
            epochs_keys)
        # epoch_idx stays unbatched through the vmap, so mix_stream's
        # reshuffle-vs-cheap-epoch branch remains a real lax.cond.
        stream = jax.vmap(
            lambda arrs, k, cnt: mix_stream(
                arrs, k, epoch_idx, cnt, k_bits,
                period=period, tile_w=tile_w)
        )(stream, keys, count)

        step0 = epoch_idx.astype(jnp.float32) * nonempty_batches
        state, train_loss = pallas_train_epoch(
            state, tuple(a.reshape(rshape) for a in stream),
            lr, wd, step0, count, pack=kernel_pack,
            interpret=interpret,
        )

        epoch_params = MFParams(
            U=jnp.swapaxes(state.u_t, 1, 2),
            V=jnp.swapaxes(state.v_t, 1, 2),
        )
        val_loss = jax.vmap(
            lambda p_u, p_v, vu, vi, vj, vz, vv: batch_losses(
                MFParams(p_u, p_v),
                LabeledSplit(vu, vi, vj, vz, vv, None),
                batch_size,
            )[1]
        )(epoch_params.U, epoch_params.V,
          val.u, val.i, val.j, val.z, val.valid)
        return (state, stream), (train_loss, val_loss)

    (state, _), (train_losses, val_losses) = jax.lax.scan(
        epoch_step, (state, stream0), jnp.arange(num_epochs)
    )
    final = MFParams(
        U=jnp.swapaxes(state.u_t, 1, 2),
        V=jnp.swapaxes(state.v_t, 1, 2),
    )
    # scan stacks [E, R]; transpose to [R, E].
    return final, train_losses.T, val_losses.T


def train_runs_pallas(
    params: MFParams,
    train: LabeledSplit,
    val: LabeledSplit,
    epochs_keys: jax.Array,
    lr: jax.Array,
    weight_decay: jax.Array,
    batch_size: int = 64,
    num_epochs: int = 30,
    label_denom: int = 1,
    interpret: bool = False,
    reshuffle_period: int | None = None,
) -> Tuple[MFParams, jax.Array, jax.Array]:
    """Train R runs; returns (params, train_losses [R,E], val_losses [R,E]).

    ``label_denom`` is the denominator of the training labels' rational
    values (K under soft labels, else 1); it enables the packed-gather
    fast path (``_pack_spec``) and must make ``z * label_denom`` integral.
    ``reshuffle_period`` follows :func:`mfcd_tpu.train.trainer.train_model`
    (env default resolved here, outside the jit, so it keys the cache).

    ``MFCD_PALLAS_INTERPRET=1`` forces interpret mode (resolved here,
    outside the jits) — it lets the full engine run the Pallas paths on
    CPU for integration tests.

    (A multi-epoch "window" kernel variant — whole reshuffle windows per
    launch with an in-kernel lane-shear and fused val pass — was built,
    CI-validated, and REMOVED in round 4 after the on-device decision run
    measured no win over this per-epoch path: 0.0785 vs 0.0777 s/run at
    the canonical bench bucket, `docs/decisions/multiepoch.json`.)
    """
    interpret = interpret or os.environ.get(
        "MFCD_PALLAS_INTERPRET", "0") != "0"
    period = reshuffle_period or default_reshuffle_period()
    return _train_runs_pallas(
        params, train, val, epochs_keys, lr, weight_decay,
        batch_size=batch_size, num_epochs=num_epochs,
        label_denom=label_denom, interpret=interpret,
        reshuffle_period=period)


train_runs_pallas.clear_cache = _train_runs_pallas.clear_cache
