"""Pallas-backed multi-run trainer — fused epochs, VMEM-resident state.

Drop-in alternative to :func:`mfcd_tpu.train.trainer.train_model` that
trains a whole stack of runs (configs x reps flattened to one leading axis)
with one Pallas kernel launch per epoch (see
:func:`mfcd_tpu.ops.kernels.pallas_train_epoch`).  Semantics are identical
to the jnp trainer — same keyed-bijection shuffles, same dynamic batch trip
counts, same batch means, same coupled-wd Adam — verified by equivalence
tests (interpret mode on CPU).

Epoch flow (inside one ``lax.scan`` over epochs):
  1. per-run sort-free shuffle (``mfcd_tpu.ops.shuffle``) of the valid
     training rows onto sequential batch slots,
  2. gather the permuted (u, i, j, z) into [R, B, bs] batch tensors,
  3. one ``pallas_train_epoch`` call trains every run's epoch on-chip,
     executing only the ceil(count/bs) batches that hold valid rows,
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
from mfcd_tpu.ops.shuffle import epoch_permutation
from mfcd_tpu.train.trainer import batch_losses


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
    padded = num_batches * batch_size
    k_bits = max(rows - 1, 1).bit_length()

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
    slots = jnp.arange(padded, dtype=jnp.int32)

    def gather_run(tr_u, tr_i, tr_j, tr_z, cnt, kperm):
        rows_sel = epoch_permutation(kperm, slots, cnt, k_bits)
        shape = (num_batches, batch_size)
        return (
            tr_u[rows_sel].reshape(shape),
            tr_i[rows_sel].reshape(shape),
            tr_j[rows_sel].reshape(shape),
            tr_z[rows_sel].reshape(shape),
        )

    def epoch_step(carry, epoch_idx):
        state = carry
        keys = jax.vmap(lambda k: jax.random.fold_in(k, epoch_idx))(
            epochs_keys)
        pu, pi, pj, z = jax.vmap(gather_run)(
            train.u, train.i, train.j, train.z, count, keys)

        step0 = epoch_idx.astype(jnp.float32) * nonempty_batches
        state, train_loss = pallas_train_epoch(
            state, pu, pi, pj, z, lr, wd, step0, count,
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
