"""Stage-level timing of the Pallas train bucket at the bench config.

Decomposes one 30-epoch, R-run training bucket (the bench's hot stage)
into its three per-epoch components, each timed as its own jitted scan on
the real device:

  gather — per-epoch keyed-bijection shuffle + packed-int32 permuted gather
  kernel — pallas_train_epoch on fixed pregathered batches
  val    — the vmapped masked validation loss pass

Timings force a host transfer (``np.asarray``) because
``block_until_ready`` is a no-op on the axon backend.  Run standalone
(single TPU process); takes ~2-4 min including compiles.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

import mfcd_tpu  # noqa: F401  — cache init
import jax
import jax.numpy as jnp

from mfcd_tpu.data.btl import LabeledSplit
from mfcd_tpu.models.mf import MFParams
from mfcd_tpu.ops.kernels import EpochState, pallas_train_epoch
from mfcd_tpu.ops.shuffle import epoch_permutation
from mfcd_tpu.train.trainer import batch_losses
from mfcd_tpu.train.pallas_trainer import train_runs_pallas, _pack_spec


def log(*a):
    print(*a, file=sys.stderr, flush=True)


R = 8
N_USERS = M_ITEMS = 1000
D = 2
COUNT = 80_000          # bench config: p=0.2 -> 100k triplets -> 80k train
ROWS = 131_072          # pow-2 padded
VAL_COUNT = 10_000
VAL_ROWS = 16_384
BS = 64
EPOCHS = 30


def make_data(seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 12)
    U = jax.random.normal(ks[0], (R, N_USERS, D)) / np.sqrt(D)
    V = jax.random.normal(ks[1], (R, M_ITEMS, D)) / np.sqrt(D)

    def split(ka, rows, count):
        k1, k2, k3, k4 = jax.random.split(ka, 4)
        u = jax.random.randint(k1, (R, rows), 0, N_USERS, jnp.int32)
        i = jax.random.randint(k2, (R, rows), 0, M_ITEMS, jnp.int32)
        j = jax.random.randint(k3, (R, rows), 0, M_ITEMS, jnp.int32)
        z = jax.random.bernoulli(k4, 0.5, (R, rows)).astype(jnp.float32)
        valid = jnp.broadcast_to(jnp.arange(rows)[None, :] < count,
                                 (R, rows))
        u, i, j, z = (jnp.where(valid, a, 0) for a in (u, i, j, z))
        cnt = jnp.full((R,), count, jnp.int32)
        return LabeledSplit(u, i, j, z.astype(jnp.float32), valid, cnt)

    train = split(ks[2], ROWS, COUNT)
    val = split(ks[3], VAL_ROWS, VAL_COUNT)
    ekeys = jax.random.split(ks[4], R)
    lr = jnp.full((R,), 1e-3, jnp.float32)
    wd = jnp.full((R,), 5e-6, jnp.float32)
    return MFParams(U, V), train, val, ekeys, lr, wd


def force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def timeit(name, fn, *args, iters=3):
    force(fn(*args))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.time()
        force(fn(*args))
        ts.append(time.time() - t0)
    best = min(ts)
    log(f"{name:12s} {best*1000:8.1f} ms/bucket  "
        f"{best*1000/R:7.2f} ms/run  {best*1000/(R*EPOCHS):6.3f} ms/epoch-run")
    return best


@jax.jit
def full_train(params, train, val, ekeys, lr, wd):
    return train_runs_pallas(params, train, val, ekeys, lr, wd,
                             batch_size=BS, num_epochs=EPOCHS, label_denom=1)


@jax.jit
def gather_only(train, ekeys):
    rows = train.u.shape[1]
    k_bits = max(rows - 1, 1).bit_length()
    slots = jnp.arange(rows, dtype=jnp.int32)
    count = train.count.astype(jnp.int32)
    _, bits_n, bits_m, bits_z = _pack_spec(N_USERS, M_ITEMS, 1)
    packed = (train.u | (train.i << bits_n)
              | (train.j << (bits_n + bits_m))
              | (jnp.round(train.z).astype(jnp.int32)
                 << (bits_n + 2 * bits_m)))

    def gather_run(tr_packed, cnt, kperm):
        rows_sel = epoch_permutation(kperm, slots, cnt, k_bits)
        y = tr_packed[rows_sel].reshape(rows // BS, BS)
        u = y & ((1 << bits_n) - 1)
        i = (y >> bits_n) & ((1 << bits_m) - 1)
        j = (y >> (bits_n + bits_m)) & ((1 << bits_m) - 1)
        k = (y >> (bits_n + 2 * bits_m)) & 1
        return u, i, j, k.astype(jnp.float32)

    def step(acc, e):
        keys = jax.vmap(lambda k: jax.random.fold_in(k, e))(ekeys)
        u, i, j, z = jax.vmap(gather_run)(packed, count, keys)
        return acc + jnp.float32(u[0, 0, 0]) + z[0, 0, 0], None

    acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(EPOCHS))
    return acc


@jax.jit
def kernel_only(params, train, lr, wd):
    """The fused-epoch kernel alone, in the same packed-stream mode the
    production trainer uses at this shape (one int32 word per row,
    unpacked in-registers inside the kernel)."""
    count = train.count.astype(jnp.int32)
    state = EpochState(
        u_t=jnp.swapaxes(params.U, 1, 2),
        v_t=jnp.swapaxes(params.V, 1, 2),
        mu_u=jnp.zeros((R, D, N_USERS)), nu_u=jnp.zeros((R, D, N_USERS)),
        mu_v=jnp.zeros((R, D, M_ITEMS)), nu_v=jnp.zeros((R, D, M_ITEMS)),
    )
    shape = (R, ROWS // BS, BS)
    mode, bits_n, bits_m, bits_z = _pack_spec(N_USERS, M_ITEMS, 1)
    packed = (train.u | (train.i << bits_n)
              | (train.j << (bits_n + bits_m))
              | (jnp.round(train.z).astype(jnp.int32)
                 << (bits_n + 2 * bits_m))).reshape(shape)
    pack = (mode, bits_n, bits_m, bits_z, 1)
    nonempty = jnp.ceil(count.astype(jnp.float32) / BS)

    def step(carry, e):
        st = carry
        st, loss = pallas_train_epoch(
            st, (packed,), lr, wd, e.astype(jnp.float32) * nonempty,
            count, pack=pack)
        return st, loss

    st, losses = jax.lax.scan(step, state, jnp.arange(EPOCHS))
    return losses


@jax.jit
def val_only(params, val):
    def step(acc, e):
        vl = jax.vmap(
            lambda p_u, p_v, vu, vi, vj, vz, vv: batch_losses(
                MFParams(p_u, p_v),
                LabeledSplit(vu, vi, vj, vz, vv, None), BS)[1]
        )(params.U, params.V, val.u, val.i, val.j, val.z, val.valid)
        return acc + vl[0], None

    acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(EPOCHS))
    return acc


def main():
    log(f"device: {jax.devices()[0]}")
    data = make_data()
    params, train, val, ekeys, lr, wd = data
    t_full = timeit("full", full_train, *data)
    t_gather = timeit("gather", gather_only, train, ekeys)
    t_kernel = timeit("kernel", kernel_only, params, train, lr, wd)
    t_val = timeit("val", val_only, params, val)
    resid = t_full - t_gather - t_kernel - t_val
    log(f"{'residual':12s} {resid*1000:8.1f} ms/bucket  "
        f"{resid*1000/R:7.2f} ms/run")


if __name__ == "__main__":
    main()
