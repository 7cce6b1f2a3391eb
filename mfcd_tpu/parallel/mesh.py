"""Device-mesh parallelism for sweeps and training steps.

The reference has **no distributed execution** — a single device string and a
sequential python loop over the hyperparameter grid (reference
``structure.py:95,160-171,208-221``).  The TPU-native replacements
(SURVEY §2.9):

- **grid axis (experiment DP)** — the dominant parallelism: independent
  (config, rep) runs sharded across chips; zero cross-chip traffic.
- **data axis (batch DP)** — the triplet minibatch of one run sharded across
  chips; gradients averaged with ``lax.pmean`` over ICI.
- **tp axis (tensor parallelism)** — the embedding *feature* dimension d of
  U and V sharded across chips; the forward dot contributes partial sums
  combined with one ``lax.psum`` per step.  Row gathers stay chip-local.
- PP / EP / SP have no counterpart in a two-embedding-table model and are
  documented out of scope (SURVEY §2.9, §5.7).

Everything is expressed with ``shard_map`` over a named mesh so XLA emits
the collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mfcd_tpu.models.mf import MFParams
from mfcd_tpu.ops.losses import bce_with_logits
from mfcd_tpu.ops.optim import AdamState, adam_update


def factor_mesh(n_devices: int) -> Tuple[int, int, int]:
    """Factor a device count into (grid, data, tp) axis sizes.

    Greedy: give factors of 2 to grid first (the embarrassingly parallel
    axis), then data, then tp.  Non-power-of-two remainders go to grid.
    """
    g, dp, tp = 1, 1, 1
    rem = n_devices
    for target in ("grid", "data", "tp"):
        if rem % 2 == 0 and rem > 1:
            if target == "grid":
                g *= 2
            elif target == "data":
                dp *= 2
            else:
                tp *= 2
            rem //= 2
    g *= rem
    return g, dp, tp


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(
            f"Need {n_devices} devices, have {len(devices)}; on a single-chip "
            "host pass CPU devices (XLA_FLAGS="
            "--xla_force_host_platform_device_count=N)."
        )
    g, dp, tp = factor_mesh(n_devices)
    import numpy as np

    dev_array = np.asarray(devices[:n_devices]).reshape(g, dp, tp)
    return Mesh(dev_array, ("grid", "data", "tp"))


def _local_forward_logits(params: MFParams, u, i, j):
    """Feature-sharded forward: partial dot over the local d-shard, combined
    with one psum over the 'tp' axis."""
    eu = params.U[u]
    ev = params.V[i] - params.V[j]
    partial_logits = jnp.sum(eu * ev, axis=-1)
    return jax.lax.psum(partial_logits, "tp")


def _shard_train_step(params, opt, u, i, j, z, mask, lr, wd):
    """Per-shard body of the fully sharded train step.

    Shapes inside: params U [G_loc, n, d_loc]; batch arrays [G_loc, B_loc].
    vmap over the local slice of the grid axis; DP-average grads over
    'data'; TP partial sums handled inside the forward.
    """

    def per_config(p, o, bu, bi, bj, bz, bm, blr, bwd):
        def loss_fn(p):
            logits = _local_forward_logits(p, bu, bi, bj)
            losses = bce_with_logits(logits, bz)
            # Global masked mean across the 'data' axis.
            local_sum = jnp.sum(jnp.where(bm, losses, 0.0))
            local_cnt = jnp.sum(bm)
            total_sum = jax.lax.psum(local_sum, "data")
            total_cnt = jax.lax.psum(local_cnt, "data")
            return total_sum / jnp.maximum(total_cnt, 1)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        # loss_fn's mean already divides by the psum'd global count, so each
        # shard's local gradient is the true gradient restricted to its own
        # rows — summing (psum) the shards reassembles the full gradient.
        grads = jax.tree.map(lambda g: jax.lax.psum(g, "data"), grads)
        p2, o2 = adam_update(p, grads, o, blr, bwd)
        return p2, o2, loss

    return jax.vmap(per_config)(params, opt, u, i, j, z, mask, lr, wd)


def make_sharded_train_step(mesh: Mesh):
    """A jitted training step sharded over (grid, data, tp).

    Inputs (global shapes):
      params:  MFParams with U [G, n, d], V [G, m, d]   (grid, -, tp)
      opt:     AdamState matching params
      batch:   u,i,j,z,mask each [G, B]                  (grid, data)
      lr, wd:  [G]                                       (grid,)
    Returns new params, opt, and per-config loss [G].
    """
    param_spec = MFParams(U=P("grid", None, "tp"), V=P("grid", None, "tp"))
    opt_spec = AdamState(mu=param_spec, nu=param_spec, step=P("grid"))
    batch_spec = P("grid", "data")

    step = shard_map(
        _shard_train_step,
        mesh=mesh,
        in_specs=(
            param_spec, opt_spec,
            batch_spec, batch_spec, batch_spec, batch_spec, batch_spec,
            P("grid"), P("grid"),
        ),
        out_specs=(param_spec, opt_spec, P("grid")),
        check_vma=False,
    )
    return jax.jit(step)


def replicate_opt_state_for_grid(params: MFParams) -> AdamState:
    """Fresh Adam state for grid-batched params (leading G axis)."""
    zeros = jax.tree.map(jnp.zeros_like, params)
    g = params.U.shape[0]
    return AdamState(
        mu=zeros,
        nu=jax.tree.map(jnp.zeros_like, params),
        step=jnp.zeros((g,), jnp.int32),
    )
