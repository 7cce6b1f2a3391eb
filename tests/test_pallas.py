"""Pallas fused-epoch kernel vs the jnp trainer (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mfcd_tpu.data.btl import LabeledSplit
from mfcd_tpu.models.mf import MFParams, forward_logits, init_params
from mfcd_tpu.ops.kernels import onehot_forward_logits
from mfcd_tpu.train.trainer import train_model
from mfcd_tpu.train.pallas_trainer import train_runs_pallas

N, M, D = 20, 25, 3
ROWS, VROWS, BS, EPOCHS = 100, 40, 32, 2


def _split(key, x, n_rows, count=None):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = jax.random.randint(k1, (n_rows,), 0, N).astype(jnp.int32)
    i = jax.random.randint(k2, (n_rows,), 0, M).astype(jnp.int32)
    j = jax.random.randint(k3, (n_rows,), 0, M).astype(jnp.int32)
    j = jnp.where(j == i, (j + 1) % M, j)
    z = jax.random.bernoulli(
        k4, jax.nn.sigmoid(x[u, i] - x[u, j])
    ).astype(jnp.float32)
    count = n_rows if count is None else count
    return LabeledSplit(u, i, j, z, jnp.arange(n_rows) < count,
                        jnp.int32(count))


def test_onehot_forward_matches_gather():
    key = jax.random.key(0)
    params = init_params(key, N, M, D)
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    u = jax.random.randint(k1, (50,), 0, N)
    i = jax.random.randint(k2, (50,), 0, M)
    j = jax.random.randint(k3, (50,), 0, M)
    a = forward_logits(params, u, i, j)
    b = onehot_forward_logits(params, u, i, j)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def _run_both(counts, lrs):
    """Train R runs with the jnp path and the pallas path; return both."""
    r = len(counts)
    kx = jax.random.key(2)
    x = jax.random.normal(kx, (N, M))
    params, trains, vals, ekeys = [], [], [], []
    for ri in range(r):
        kk = jax.random.fold_in(jax.random.key(3), ri)
        k1, k2, k3, k4 = jax.random.split(kk, 4)
        params.append(init_params(k1, N, M, D))
        trains.append(_split(k2, x, ROWS, counts[ri]))
        vals.append(_split(k3, x, VROWS))
        ekeys.append(k4)

    ref = [
        train_model(params[ri], trains[ri], vals[ri], ekeys[ri],
                    lrs[ri], 1e-3, batch_size=BS, num_epochs=EPOCHS)
        for ri in range(r)
    ]

    stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
    got = train_runs_pallas(
        stack(params), stack(trains), stack(vals), jnp.stack(ekeys),
        jnp.asarray(lrs, jnp.float32),
        jnp.full((r,), 1e-3, jnp.float32),
        batch_size=BS, num_epochs=EPOCHS, interpret=True,
    )
    return ref, got


def test_pallas_epoch_matches_jnp_trainer():
    ref, got = _run_both(counts=[ROWS, ROWS], lrs=[1e-2, 3e-2])
    got_params, got_tl, got_vl = got
    for ri, (ref_params, ref_tl, ref_vl) in enumerate(ref):
        np.testing.assert_allclose(
            np.asarray(got_tl[ri]), np.asarray(ref_tl), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got_vl[ri]), np.asarray(ref_vl), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got_params.U[ri]), np.asarray(ref_params.U),
            rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(got_params.V[ri]), np.asarray(ref_params.V),
            rtol=2e-3, atol=1e-4)


def test_pallas_epoch_matches_with_shortfall_masking():
    """A run whose sampler fell short (masked tail) must still match."""
    ref, got = _run_both(counts=[70, ROWS], lrs=[1e-2, 1e-2])
    got_params, got_tl, got_vl = got
    for ri, (ref_params, ref_tl, ref_vl) in enumerate(ref):
        np.testing.assert_allclose(
            np.asarray(got_tl[ri]), np.asarray(ref_tl), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got_params.U[ri]), np.asarray(ref_params.U),
            rtol=2e-3, atol=1e-4)
