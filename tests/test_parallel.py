"""Mesh-parallel tests on the 8-virtual-device CPU mesh (SURVEY §2.9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfcd_tpu.models.mf import MFParams
from mfcd_tpu.parallel.mesh import (
    factor_mesh,
    make_mesh,
    make_sharded_train_step,
    replicate_opt_state_for_grid,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_factor_mesh():
    assert factor_mesh(8) == (2, 2, 2)
    assert factor_mesh(4) == (2, 2, 1)
    assert factor_mesh(2) == (2, 1, 1)
    assert factor_mesh(1) == (1, 1, 1)
    assert factor_mesh(6) == (6, 1, 1)  # odd remainder goes to grid


def _toy_batch(g, n, m, d, batch):
    kp, kb = jax.random.split(jax.random.key(0))
    ku, kv = jax.random.split(kp)
    params = MFParams(
        U=jax.random.normal(ku, (g, n, d), jnp.float32),
        V=jax.random.normal(kv, (g, m, d), jnp.float32),
    )
    k1, k2, k3, k4 = jax.random.split(kb, 4)
    u = jax.random.randint(k1, (g, batch), 0, n)
    i = jax.random.randint(k2, (g, batch), 0, m)
    j = jax.random.randint(k3, (g, batch), 0, m)
    j = jnp.where(j == i, (j + 1) % m, j)
    z = jax.random.bernoulli(k4, 0.5, (g, batch)).astype(jnp.float32)
    mask = jnp.ones((g, batch), bool)
    return params, u, i, j, z, mask


def test_sharded_train_step_matches_single_device():
    """The (grid, data, tp)-sharded step must equal a plain computation."""
    mesh = make_mesh(8)
    g, dp, tp = factor_mesh(8)
    n, m, d, batch = 16, 24, 2 * tp, 8 * dp
    params, u, i, j, z, mask = _toy_batch(g, n, m, d, batch)
    opt = replicate_opt_state_for_grid(params)
    lr = jnp.full((g,), 1e-2, jnp.float32)
    wd = jnp.full((g,), 1e-4, jnp.float32)

    step = make_sharded_train_step(mesh)
    new_params, new_opt, loss = step(params, opt, u, i, j, z, mask, lr, wd)

    # Single-device oracle: same math without any sharding.
    from mfcd_tpu.models.mf import forward_logits
    from mfcd_tpu.ops.losses import bce_with_logits
    from mfcd_tpu.ops.optim import adam_init, adam_update

    for cfg in range(g):
        p0 = MFParams(params.U[cfg], params.V[cfg])

        def loss_fn(p):
            logits = forward_logits(p, u[cfg], i[cfg], j[cfg])
            return jnp.mean(bce_with_logits(logits, z[cfg]))

        ref_loss, grads = jax.value_and_grad(loss_fn)(p0)
        p1, _ = adam_update(p0, grads, adam_init(p0), lr[cfg], wd[cfg])
        np.testing.assert_allclose(float(loss[cfg]), float(ref_loss),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new_params.U[cfg]),
                                   np.asarray(p1.U), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_params.V[cfg]),
                                   np.asarray(p1.V), rtol=1e-4, atol=1e-6)


def test_sweep_bucket_sharded_matches_unsharded():
    from mfcd_tpu.core.config import RunConfig
    from mfcd_tpu.sweep.batched import make_sweep_mesh, run_bucket

    cfg = RunConfig(n=16, m=18, d=2, p=0.4, num_epochs=1, reps=1,
                    batch_size=16)
    rows = [{"s": 1.0 + 0.5 * k, "lr": 1e-3, "weight_decay": 1e-5}
            for k in range(8)]
    plain = run_bucket(cfg, rows, list(range(8)))
    sharded = run_bucket(cfg, rows, list(range(8)),
                         mesh=make_sweep_mesh(8))
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(a["accuracy"], b["accuracy"], atol=1e-5)
        np.testing.assert_allclose(
            a["reconstruction_errors"], b["reconstruction_errors"],
            rtol=1e-4)


def test_shard_param_sets_strided():
    from mfcd_tpu.parallel.multihost import shard_param_sets

    grid = [{"i": i} for i in range(10)]
    shards = [shard_param_sets(grid, pid, 3) for pid in range(3)]
    assert sorted(x["i"] for s in shards for x in s) == list(range(10))
    assert [x["i"] for x in shards[0]] == [0, 3, 6, 9]
