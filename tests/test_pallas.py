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


def test_pack_spec_modes():
    from mfcd_tpu.train.pallas_trainer import _pack_spec

    # n=m=1000, hard labels: 10+20+1 = 31 bits -> one-gather fast path.
    assert _pack_spec(1000, 1000, 1)[0] == "full"
    # soft K=10: 10+20+4 = 34 bits -> packed (u,i,j) + separate z.
    assert _pack_spec(1000, 1000, 10)[0] == "uij"
    # huge shapes: no packing.
    assert _pack_spec(100_000, 100_000, 1)[0] == "none"
    # bit widths cover the value ranges (full mode at a small shape)
    mode, bn, bm, bz = _pack_spec(100, 100, 50)
    assert mode == "full"
    assert (1 << bn) > 99 and (1 << bm) > 99 and (1 << bz) > 50


def test_pallas_kernel_uij_and_none_modes_match(monkeypatch):
    """The kernel's in-register unpack has three static branches (full /
    uij / none); the small test shapes always pick "full", so force the
    other two and assert they match the jnp trainer too."""
    from mfcd_tpu.train import pallas_trainer as PT

    real = PT._pack_spec(N, M, 1)
    for forced in ("uij", "none"):
        spec = (("uij", real[1], real[2], 0) if forced == "uij"
                else ("none", 0, 0, 0))
        monkeypatch.setattr(PT, "_pack_spec", lambda *a, _s=spec: _s)
        PT.train_runs_pallas.clear_cache()  # same shapes as other tests
        ref, got = _run_both(counts=[70, ROWS], lrs=[1e-2, 3e-2])
        got_params, got_tl, _ = got
        for ri, (ref_params, ref_tl, _) in enumerate(ref):
            np.testing.assert_allclose(
                np.asarray(got_tl[ri]), np.asarray(ref_tl),
                rtol=2e-4, atol=1e-5, err_msg=forced)
            np.testing.assert_allclose(
                np.asarray(got_params.U[ri]), np.asarray(ref_params.U),
                rtol=2e-3, atol=1e-4, err_msg=forced)
    PT.train_runs_pallas.clear_cache()


def test_pallas_matches_jnp_soft_labels_packed():
    """Soft labels (z = k/K) through the packed-gather path must match the
    jnp trainer bit-for-bit in the unpacked values (label_denom carries
    the rational denominator)."""
    K = 4
    kx = jax.random.key(5)
    x = jax.random.normal(kx, (N, M))
    kk = jax.random.key(6)
    k1, k2, k3, k4, k5 = jax.random.split(kk, 5)
    params = init_params(k1, N, M, D)
    u = jax.random.randint(k2, (ROWS,), 0, N).astype(jnp.int32)
    i = jax.random.randint(k3, (ROWS,), 0, M).astype(jnp.int32)
    j = jax.random.randint(k4, (ROWS,), 0, M).astype(jnp.int32)
    j = jnp.where(j == i, (j + 1) % M, j)
    votes = jax.random.bernoulli(
        k5, jax.nn.sigmoid(x[u, i] - x[u, j])[:, None], (ROWS, K))
    z = jnp.mean(votes.astype(jnp.float32), axis=1)  # k/K rationals
    train = LabeledSplit(u, i, j, z, jnp.ones(ROWS, bool), jnp.int32(ROWS))
    val = _split(jax.random.key(7), x, VROWS)
    ekey = jax.random.key(8)

    ref = train_model(params, train, val, ekey, 1e-2, 1e-3,
                      batch_size=BS, num_epochs=EPOCHS)
    stack1 = lambda t: jax.tree.map(lambda a: a[None], t)
    got = train_runs_pallas(
        stack1(params), stack1(train), stack1(val), ekey[None],
        jnp.asarray([1e-2], jnp.float32), jnp.asarray([1e-3], jnp.float32),
        batch_size=BS, num_epochs=EPOCHS, label_denom=K, interpret=True,
    )
    got_params, got_tl, got_vl = got
    np.testing.assert_allclose(
        np.asarray(got_tl[0]), np.asarray(ref[1]), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_params.U[0]), np.asarray(ref[0].U),
        rtol=2e-3, atol=1e-4)
