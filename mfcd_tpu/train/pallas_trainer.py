"""Pallas-backed multi-run trainer — fused epochs, VMEM-resident state.

Drop-in alternative to :func:`mfcd_tpu.train.trainer.train_model` that
trains a whole stack of runs (configs x reps flattened to one leading axis)
with one Pallas kernel launch per epoch (see
:func:`mfcd_tpu.ops.kernels.pallas_train_epoch`).  Semantics are identical
to the jnp trainer — same shuffles, same batch means, same coupled-wd Adam —
verified by equivalence tests (interpret mode on CPU).

Epoch flow (inside one ``lax.scan`` over epochs):
  1. per-run shuffle of the valid training rows (invalid rows sort last),
  2. gather the permuted (u, i, j, z, mask) into [R, B, bs] batch tensors,
  3. one ``pallas_train_epoch`` call trains every run's epoch on-chip,
  4. a vectorized masked validation pass records the per-epoch val loss.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from mfcd_tpu.data.btl import LabeledSplit
from mfcd_tpu.models.mf import MFParams
from mfcd_tpu.ops.kernels import EpochState, pallas_train_epoch
from mfcd_tpu.train.trainer import batch_losses


def _prep_epoch_batches(split: LabeledSplit, key, num_batches, batch_size):
    """Shuffle one run's rows (valid first, random order) into [B, bs]."""
    rows = split.u.shape[0]
    padded = num_batches * batch_size
    pad = padded - rows
    u = jnp.pad(split.u, (0, pad))
    i = jnp.pad(split.i, (0, pad))
    j = jnp.pad(split.j, (0, pad))
    z = jnp.pad(split.z, (0, pad))
    valid = jnp.pad(split.valid, (0, pad), constant_values=False)
    sort_key = jax.random.uniform(key, (padded,)) + jnp.where(valid, 0.0, 2.0)
    perm = jnp.argsort(sort_key)
    shape = (num_batches, batch_size)
    return (
        u[perm].reshape(shape), i[perm].reshape(shape),
        j[perm].reshape(shape), z[perm].reshape(shape),
        valid[perm].astype(jnp.float32).reshape(shape),
    )


@partial(
    jax.jit,
    static_argnames=("batch_size", "num_epochs", "interpret"),
)
def train_runs_pallas(
    params: MFParams,          # U [R, n, d], V [R, m, d]
    train: LabeledSplit,       # fields [R, N]
    val: LabeledSplit,         # fields [R, Nv]
    epochs_keys: jax.Array,    # [R] PRNG keys
    lr: jax.Array,             # [R]
    weight_decay: jax.Array,   # [R]
    batch_size: int = 64,
    num_epochs: int = 30,
    interpret: bool = False,
) -> Tuple[MFParams, jax.Array, jax.Array]:
    """Train R runs; returns (params, train_losses [R,E], val_losses [R,E])."""
    r, n, d = params.U.shape
    m = params.V.shape[1]
    rows = train.u.shape[1]
    num_batches = -(-rows // batch_size)

    state = EpochState(
        u_t=jnp.swapaxes(params.U, 1, 2),
        v_t=jnp.swapaxes(params.V, 1, 2),
        mu_u=jnp.zeros((r, d, n), jnp.float32),
        nu_u=jnp.zeros((r, d, n), jnp.float32),
        mu_v=jnp.zeros((r, d, m), jnp.float32),
        nu_v=jnp.zeros((r, d, m), jnp.float32),
    )

    # Adam steps advance only on non-empty batches; valid rows are compacted
    # to the front of every shuffle, so per-epoch step count is static-shaped
    # data: ceil(valid_count / bs).
    nonempty_batches = jnp.ceil(
        train.count.astype(jnp.float32) / batch_size
    )

    lr = lr.astype(jnp.float32)
    wd = weight_decay.astype(jnp.float32)

    def epoch_step(carry, epoch_idx):
        state = carry
        keys = jax.vmap(lambda k: jax.random.fold_in(k, epoch_idx))(
            epochs_keys)
        pu, pi, pj, z, mask = jax.vmap(
            lambda tr_u, tr_i, tr_j, tr_z, tr_v, k: _prep_epoch_batches(
                LabeledSplit(tr_u, tr_i, tr_j, tr_z, tr_v, None),
                k, num_batches, batch_size,
            )
        )(train.u, train.i, train.j, train.z, train.valid, keys)

        step0 = epoch_idx.astype(jnp.float32) * nonempty_batches
        state, train_loss = pallas_train_epoch(
            state, pu, pi, pj, z, mask, lr, wd, step0,
            num_batches=num_batches, interpret=interpret,
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
        return state, (train_loss, val_loss)

    state, (train_losses, val_losses) = jax.lax.scan(
        epoch_step, state, jnp.arange(num_epochs)
    )
    final = MFParams(
        U=jnp.swapaxes(state.u_t, 1, 2),
        V=jnp.swapaxes(state.v_t, 1, 2),
    )
    # scan stacks [E, R]; transpose to [R, E].
    return final, train_losses.T, val_losses.T
